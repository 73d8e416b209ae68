"""All-pairs weighted-cosine similarity join (SURVEY §2.12).

The weighted sibling of the exact set-similarity join
(``setsim.setsim_join``, unweighted Jaccard): every pair of documents
whose COSINE similarity over tf-idf-style term weights reaches a
threshold. Jaccard treats "the" and a rare entity name identically;
the weighted join is what near-dup mining, template clustering and
boilerplate family detection actually want — rare shared terms count,
ubiquitous ones barely do. Plan follows Bayardo/Ma/Srikant's All-Pairs
prefix filter (WWW'07, public literature), Spark-first:

1. WEIGHTS, exact by construction: term frequency tf and document
   frequency df from two hash aggregates; the unnormalized weight is
   the integer u = (tf * 1e6) div df (rational inverse-df — no log,
   so no transcendental enters the cross-engine contract), and the
   L2-normalized weight is w = floor(u * 1e6 / sqrt(norm2) + 0.5)
   where norm2 = sum u^2 accumulates in DECIMAL(38,0) (long overflows
   on long documents). sqrt is IEEE-correctly-rounded on both engines
   and both cast the SAME exact integer to double, so w is
   bit-identical everywhere. Normalized vectors have norm ~1e6, so
   every pair dot stays ~1e12 < 2^53 — the cosine division is then
   the house ``cosine_micros``.
2. PREFIX FILTER: terms globally ordered by (corpus max weight DESC,
   term) — the Bayardo order, heaviest-bounding terms first so
   suffixes bound tightly; per document, a term is PREFIX iff the
   suffix strictly after it still bounds >= t, where the suffix bound
   is sum over suffix terms of w_t * maxw_t (the probe-side upper
   bound on what the suffix alone can contribute, in 1e12 units).
   The guarantee is one-sided and needs no pair symmetry: if
   cos(a, b) >= t and NO term of a matched b's prefix, every shared
   term lies in b's suffix, so cos <= bound(suffix(b)) < t —
   contradiction. Candidates are therefore FULL(a) equi-joined to
   PREFIX(b) on term, unordered-deduped.
3. VERIFY, candidate-bound: per-doc sorted (term, weight) arrays
   broadcast-joined onto the pair list; the dot is one codegen
   aggregate over the smaller array probing the other's map — exact
   longs, no Python, cost O(|doc|) per candidate (the setsim array-
   verify shape).

Scale: two narrow aggregates + one window per document (a document's
terms fit one task by definition) + an equi-join whose probe side is
only the prefix postings — the same candidate-bound behavior the
setsim family probes at 10x/30x. A hot ubiquitous term lands at the
FRONT of the global order, where documents' prefixes rarely reach
(high maxw terms are cheap to exclude: their own w * maxw mass is
spent early), so the prefix postings of stopword-like terms stay
small — the weighted analogue of setsim's rarest-first order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakeflow.caching import CacheScope, active_scope, maybe_persist
from lakeflow.operators.similarity import cosine_micros
from lakeflow.operators.text import tokens


def weighted_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    cache: CacheScope | None = None,
) -> DataFrame:
    """(id, term, df, w, n2): L2-normalized inverse-df term weights in
    micro units, each term's document frequency (the prefix filter's
    rarest-first order key), and each document's exact quantized norm2
    for the cosine denominator."""
    tf = (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("__df"))
    u = tf.join(dfreq, "term").select(
        F.col(id_col),
        "term",
        F.col("__df").alias("df"),
        F.expr("(__tf * 1000000) div __df").alias("__u"),
    )
    # norm2 in DECIMAL(38,0): u <= 1e6 * tf, so u^2 sums overflow LONG
    # on long documents; the decimal -> double cast before sqrt is
    # round-nearest from the same exact integer on both engines
    norm2 = u.groupBy(id_col).agg(
        F.sum(F.expr("CAST(__u * __u AS DECIMAL(38,0))")).alias("__n2u")
    )
    w = (
        u.join(norm2, id_col)
        .select(
            F.col(id_col),
            "term",
            "df",
            F.floor(
                F.col("__u").cast("double")
                * F.lit(1_000_000.0)
                / F.sqrt(F.col("__n2u").cast("double"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("w"),
        )
        .filter(F.col("w") > 0)
    )
    # the exact norm of the QUANTIZED vector (what cosine actually
    # divides by): ~1e12, fits LONG comfortably
    n2 = w.groupBy(id_col).agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    out = w.join(n2, id_col)
    # three consumers downstream (full relation, prefix window, verify
    # arrays) — persist, but ONLY under an explicit or ambient scope: a
    # bare library call must not leak a session-lifetime persist it can
    # never release (the bm25_search rule); recompute is the correct
    # default there.
    if cache is not None or active_scope() is not None:
        out = maybe_persist(out, cache)
    return out


def _prefix_terms(
    w: DataFrame, id_col: str, threshold_micros: int
) -> DataFrame:
    """The indexed subset: per document, the RAREST-FIRST head terms
    (global order: corpus document frequency ASC, term — the setsim
    order) whose inclusive-from-here suffix can still reach the
    threshold under BOTH upper bounds:

    - norm bound (order-free, exact): the suffix's own contribution
      to any cosine is at most ||suffix|| / ||doc||, so a row is
      prunable once suf_norm2 * 1e12 < t^2 * n2 (integer
      cross-multiply in DECIMAL — both sides pass 2^63);
    - max-weight bound (Bayardo): dot over suffix terms is at most
      sum w_t * maxw_t, so prunable once that mass < (t - slack) *
      1e6 * 1e6 (16-micro slack absorbs the quantized-norm !=
      exactly-1e6 wobble; false negatives stay impossible, verified
      by the ground-truth oracle and the randomized property test).

    Rarest-first is what makes the candidate join survive a
    template-heavy corpus: prefix postings are RARE terms (tiny full
    postings on the other side), while ubiquitous stopword-like terms
    fall to the suffix and are never indexed — the max-weight-DESC
    order indexed 71% of all term occurrences on the sf0.1 corpus
    (319M raw candidates, every pair a candidate); this order indexes
    the rare head only. A document's terms fit one task by
    definition, so per-doc windows are the right tool."""
    maxw = w.groupBy("term").agg(F.max("w").alias("__maxw"))
    wm = w.join(maxw, "term")
    win = Window.partitionBy(id_col).orderBy(
        F.asc("df"), F.asc("term")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy(id_col)
    wmw = F.col("w") * F.col("__maxw")
    ww = F.col("w") * F.col("w")
    # inclusive-from-here suffix aggregates: total - running + current.
    # (The strictly-after form would let the first excluded row itself
    # carry >= t mass and break the one-sided guarantee.)
    suf_mw = F.sum(wmw).over(tot) - F.sum(wmw).over(win) + wmw
    suf_n2 = F.sum(ww).over(tot) - F.sum(ww).over(win) + ww
    t_slack = max(int(threshold_micros) - 16, 0)
    t12 = F.lit(t_slack) * F.lit(1_000_000).cast("long")
    dec = "decimal(38,0)"
    scored = wm.select(
        F.col(id_col),
        "term",
        "w",
        "df",
        "n2",
        ww.alias("__w2"),
        suf_mw.alias("__sufmw"),
        suf_n2.alias("__sufn2"),
    )
    cond_mw = F.col("__sufmw") >= t12
    cond_norm = (
        F.col("__sufn2").cast(dec) * F.lit(10**12).cast(dec)
        >= F.lit(t_slack * t_slack).cast(dec) * F.col("n2").cast(dec)
    )
    # tail_norm = safe over-approximation (floor(sqrt)+1, micros) of
    # the norm of the doc's ENTIRE non-prefix tail — a per-doc
    # constant, < threshold by the very prefix cut (the norm-bound
    # condition fails at the first excluded row). This is the
    # accumulation filter's "what can everything beyond my prefix
    # still contribute": any shared term past the last shared prefix
    # term lives in this tail (prefixes are contiguous heads).
    filtered = scored.filter(cond_mw & cond_norm)
    doc_w = Window.partitionBy(id_col)
    tail_n2 = F.max(F.col("n2")).over(doc_w) - F.sum(F.col("__w2")).over(doc_w)
    tail_norm = (F.floor(F.sqrt(tail_n2.cast("double"))) + 1).cast("long")
    return filtered.select(
        F.col(id_col), "term", "w", tail_norm.alias("tail_norm")
    )


def _suffix_norms(w: DataFrame, id_col: str) -> DataFrame:
    """Per (doc, term): the term's weight plus a safe
    over-approximation (floor(sqrt)+1, micros) of the norm of the
    doc's rarest-first suffix strictly AFTER the term — the FULL-side
    half of the pair accumulation filter."""
    win = Window.partitionBy(id_col).orderBy(
        F.asc("df"), F.asc("term")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy(id_col)
    ww = F.col("w") * F.col("w")
    suf_after = F.sum(ww).over(tot) - F.sum(ww).over(win)
    scored = w.select(
        F.col(id_col), "term", "w", "df", suf_after.alias("__sufa")
    )
    ns_after = (F.floor(F.sqrt(F.col("__sufa").cast("double"))) + 1).cast("long")
    return scored.select(id_col, "term", "w", "df", ns_after.alias("ns_after"))


def apss_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_micros: int = 600_000,
    cache: CacheScope | None = None,
) -> DataFrame:
    """Exact self all-pairs cosine join: every unordered pair with
    cosine(tf-idf weights) >= threshold, as (``{id}_a``, ``{id}_b``,
    cos_micros). Exact recall: the prefix filter loses no qualifying
    pair (one-sided suffix-bound guarantee, see module doc).

    EXACT-DUPLICATE COLLAPSE first: documents with identical weight
    vectors (same text after tokenization — web corpora are full of
    them, and every pair of copies is a guaranteed output pair) are
    grouped by an md5 vector fingerprint (the ``exact_dedup``
    identity), the pairwise machinery runs on one REPRESENTATIVE per
    group, and pairs expand back through group membership afterwards:
    within-group pairs are cos = 1e6 by identity (bit-exact — the
    verify formula on equal vectors is exactly 1.0), cross-group
    pairs inherit their representatives' cosine (equal vectors, equal
    dot). Without this, k copies of a template multiply every hot
    prefix posting by k and the candidate join by k^2 — the measured
    wedge on the 10x replicated probe corpus; with it, duplicate mass
    costs ONE membership expansion at output time. This mirrors the
    production funnel order (exact dedup BEFORE near-dup) while
    keeping the operator's contract self-contained."""
    w_all = weighted_terms(df, id_col, text_col, cache)

    # vector fingerprint: md5 of the sorted (term, w) entries — the
    # exact_dedup identity, computed without leaving codegen
    fp = w_all.groupBy(id_col).agg(
        F.md5(
            F.to_json(F.array_sort(F.collect_list(F.struct("term", "w"))))
        ).alias("__fp")
    )
    groups = fp.select(F.col(id_col), "__fp")
    reps = groups.groupBy("__fp").agg(F.min(id_col).alias("__rep"))
    members = groups.join(reps, "__fp").select(
        "__fp", F.col(id_col), F.col("__rep")
    )
    if cache is not None or active_scope() is not None:
        members = maybe_persist(members, cache)

    # the pairwise machinery sees one row set per DISTINCT vector
    w = w_all.join(
        members.filter(F.col(id_col) == F.col("__rep")).select(id_col),
        id_col,
        "left_semi",
    )
    rel = _suffix_norms(w, id_col).select(
        F.col(id_col).alias("__ida"),
        "term",
        F.col("w").alias("__wa"),
        F.col("ns_after").alias("__naa"),
    )
    pre = _prefix_terms(w, id_col, threshold_micros).select(
        F.col(id_col).alias("__idb"),
        "term",
        F.col("w").alias("__wb"),
        F.col("tail_norm").alias("__tnb"),
    )

    # candidates: FULL(a) x PREFIX(b) on term, ONE orientation only —
    # the one-sided guarantee (every qualifying pair shares a term in
    # prefix(b) for EITHER choice of b) lets a < b alone cover all
    # unordered pairs, halving the raw join output. The dedup shuffle
    # is an ACCUMULATION, not a distinct (the setsim positional-filter
    # lesson, in weighted form): per pair,
    #   acc    = the EXACT partial dot over every shared prefix(b)
    #            term (all generated rows — prefixes are contiguous
    #            heads, so the generated rows are exactly the shared
    #            terms up to b's prefix end), and
    #   rest   = MIN over shared rows of ns_after(a) * tail_norm(b):
    #            every shared term beyond the LAST shared prefix term
    #            t_last sits both after t_last in a's rarest-first
    #            order AND inside b's non-prefix tail (a contiguous-
    #            head prefix admits no shared prefix term past
    #            t_last), so Cauchy-Schwarz on those two sets bounds
    #            everything acc missed. ns_after decreases
    #            monotonically along the shared global order, so
    #            MIN(ns_after) IS the value at t_last — a plain long
    #            MIN instead of a max_by over (df, term) structs,
    #            which kept string order keys alive through the
    #            shuffle and cost more than it saved.
    # acc + rest < (t - slack)*1e6 kills the pair before any verify.
    # 64 micros of slack absorb every quantization wobble (+1
    # over-approximated tail norms, quantized doc norms 1e6 +- 2, the
    # verify round-half-up) — false negatives stay impossible,
    # backstopped by the ground-truth oracle and the randomized
    # losslessness property test.
    kill = F.lit(max(int(threshold_micros) - 64, 0)) * F.lit(1_000_000).cast(
        "long"
    )
    cand = (
        rel.join(pre, "term")
        .filter(F.col("__ida") < F.col("__idb"))
        .select(
            "__ida",
            "__idb",
            (F.col("__wa") * F.col("__wb")).alias("__prod"),
            F.col("__naa"),
            F.col("__tnb"),
        )
        .groupBy("__ida", "__idb")
        .agg(
            (
                F.sum("__prod") + F.min("__naa") * F.max("__tnb")
            ).alias("__ub")
        )
        .filter(F.col("__ub") >= kill)
        .select(F.col("__ida").alias("__pa"), F.col("__idb").alias("__pb"))
    )

    # verify on per-doc sorted (term, w) arrays: one row per doc, the
    # dot is a codegen aggregate probing the other side's map
    arrs = (
        w.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("term", "w")))
            ).alias("__m"),
            F.first("n2").alias("__n2"),
        )
    )
    if cache is not None or active_scope() is not None:
        arrs = maybe_persist(arrs, cache)  # scope-gated, two consumers
    a = arrs.select(
        F.col(id_col).alias("__pa"),
        F.col("__m").alias("__ma"),
        F.col("__n2").alias("__n2a"),
    )
    b = arrs.select(
        F.col(id_col).alias("__pb"),
        F.col("__m").alias("__mb"),
        F.col("__n2").alias("__n2b"),
    )
    dot = F.aggregate(
        F.map_entries("__ma"),
        F.lit(0).cast("long"),
        lambda acc, e: acc
        + e["value"]
        * F.coalesce(F.element_at("__mb", e["key"]), F.lit(0).cast("long")),
    )
    scored = (
        cand.join(a, "__pa")
        .join(b, "__pb")
        .select(
            "__pa",
            "__pb",
            cosine_micros(dot, F.col("__n2a"), F.col("__n2b")).alias("cos_micros"),
        )
    )
    rep_pairs = scored.filter(
        F.col("cos_micros") >= F.lit(int(threshold_micros))
    )

    # expand representative pairs back through group membership.
    # Cross-group: every member of A x every member of B inherits the
    # representatives' cosine (equal vectors -> equal dot, exactly).
    ma = members.select(F.col("__rep").alias("__pa"), F.col(id_col).alias("__ea"))
    mb = members.select(F.col("__rep").alias("__pb"), F.col(id_col).alias("__eb"))
    cross = (
        rep_pairs.join(ma, "__pa")
        .join(mb, "__pb")
        .select(
            F.least("__ea", "__eb").alias(f"{id_col}_a"),
            F.greatest("__ea", "__eb").alias(f"{id_col}_b"),
            "cos_micros",
        )
    )
    out = cross
    if threshold_micros <= 1_000_000:
        # within-group: identical vectors, cos exactly 1e6 (the verify
        # formula on equal vectors is floor(1.0 * 1e6 + 0.5)); these
        # pairs are guaranteed output, generated without touching the
        # candidate machinery. Output-bound by construction (they ARE
        # the answer's duplicate mass).
        m1 = members.select("__fp", F.col(id_col).alias("__ea"))
        m2 = members.select("__fp", F.col(id_col).alias("__eb"))
        within = (
            m1.join(m2, "__fp")
            .filter(F.col("__ea") < F.col("__eb"))
            .select(
                F.col("__ea").alias(f"{id_col}_a"),
                F.col("__eb").alias(f"{id_col}_b"),
                F.lit(1_000_000).cast("long").alias("cos_micros"),
            )
        )
        out = cross.unionByName(within)
    return out

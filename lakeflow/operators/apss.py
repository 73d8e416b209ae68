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
    """(id, term, w, n2): L2-normalized inverse-df term weights in
    micro units, plus each document's exact pre-normalization norm2
    (DECIMAL(38,0)) for the verify step's cosine denominator."""
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
    """The indexed subset: per document (Bayardo order: corpus max
    weight DESC, term), the head terms whose strict suffix still
    bounds >= threshold. bound(suffix) = sum w_t * maxw_t over the
    suffix, in 1e12 units (w and maxw are both micros)."""
    maxw = w.groupBy("term").agg(F.max("w").alias("__maxw"))
    wm = w.join(maxw, "term")
    # suffix bound strictly after the current row: running sum from the
    # END of the doc's term order = total - inclusive running sum. A
    # document's terms fit one task (docs are bounded), so a per-doc
    # window is the right tool — corpus-wide orders are where the
    # bucketed prefix sum takes over.
    win = Window.partitionBy(id_col).orderBy(
        F.desc("__maxw"), F.asc("term")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy(id_col)
    bound_after = F.sum(F.col("w") * F.col("__maxw")).over(tot) - F.sum(
        F.col("w") * F.col("__maxw")
    ).over(win)
    t12 = F.lit(int(threshold_micros)) * F.lit(1_000_000).cast("long")
    # a row is PREFIX iff the mass from it to the end (inclusive) still
    # reaches t: suffix = the maximal tail with total mass < t12. The
    # strictly-after form would let the first excluded row itself carry
    # >= t mass and break the guarantee.
    return wm.withColumn(
        "__ba", bound_after + F.col("w") * F.col("__maxw")
    ).filter(F.col("__ba") >= t12).select(id_col, "term")


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
    pair (one-sided suffix-bound guarantee, see module doc)."""
    w = weighted_terms(df, id_col, text_col, cache)
    rel = w.select(F.col(id_col).alias("__ida"), "term", F.col("w").alias("__wa"))
    pre = _prefix_terms(
        w.select(id_col, "term", "w"), id_col, threshold_micros
    ).select(F.col(id_col).alias("__idb"), "term")

    # candidates: FULL(a) x PREFIX(b) on term, unordered-deduped; the
    # one-sided guarantee covers both orientations because every
    # unordered pair is generated in both role assignments
    cand = (
        rel.join(pre, "term")
        .filter(F.col("__ida") != F.col("__idb"))
        .select(
            F.least("__ida", "__idb").alias("__pa"),
            F.greatest("__ida", "__idb").alias("__pb"),
        )
        .distinct()
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
    return scored.filter(
        F.col("cos_micros") >= F.lit(int(threshold_micros))
    ).select(
        F.col("__pa").alias(f"{id_col}_a"),
        F.col("__pb").alias(f"{id_col}_b"),
        "cos_micros",
    )

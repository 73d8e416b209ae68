"""Inverted index over a document corpus: posting lists as a relation,
conjunctive keyword search as semi-join algebra.

Corpus curation constantly needs "every document mentioning X (and Y)"
— to slice eval sets, hunt contamination, audit PII findings, build
domain subcorpora. Grepping 100 TB per question is a full scan each
time; an inverted index pays one tokenize+shuffle ONCE and answers
every subsequent query by touching only the queried terms' postings.

Spark-first layout:

- The index IS a DataFrame ``(token, doc_id, tf)`` — build it with
  explode + hash aggregate, persist it partitioned/bucketed BY TOKEN
  (``sinks.tables.save_bucketed_table``) so a term lookup is a
  partition-pruned scan and term-term intersections co-locate without
  a shuffle.
- A conjunctive query filters the index to its terms (predicate pushed
  to the parquet scan), then one hash aggregate keeps doc_ids whose
  distinct-term count equals the term count — intersection without
  self-joins, cost ∝ the queried postings, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenize (lowercase, whitespace split) and emit one posting row
    per (token, doc) with its term frequency. One explode + one hash
    aggregate; map-side combine collapses repeated tokens before the
    shuffle."""
    tok = F.explode(
        F.split(F.lower(F.col(text_col)), r"\s+")
    ).alias("token")
    return (
        docs.select(F.col(id_col).alias("doc_id"), tok)
        .where(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def keyword_search_all(index: DataFrame, terms: list[str]) -> DataFrame:
    """Doc ids containing ALL ``terms`` (conjunctive / AND query).

    The term filter is an IN-list the parquet scan can push down; the
    intersection is one aggregate over the surviving postings —
    ``count(distinct token) == len(terms)`` — so cost is the size of
    the queried posting lists. Returns (doc_id, total_tf) where
    total_tf sums the matched terms' frequencies (a simple relevance
    proxy)."""
    # dedupe after lowercasing: count_distinct(token) compares against
    # the UNIQUE term count, so caller duplicates (or case variants of
    # one token) must collapse or the AND query is silently empty
    terms = sorted({t.lower() for t in terms})
    hits = index.where(F.col("token").isin(terms))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct(F.col("token")).alias("__nt"),
            F.sum("tf").alias("total_tf"),
        )
        .where(F.col("__nt") == len(terms))
        .select("doc_id", "total_tf")
    )


#: cross-row products ride decimal(38,0) (Spark) / HUGEINT (DuckDB) —
#: the same exact-integer idiom as operators/trend.py
_DEC = "decimal(38,0)"


def bm25_search(index: DataFrame, terms: list[str], k: int = 10) -> DataFrame:
    """BM25 ranked retrieval over the posting relation, in EXACT
    integer arithmetic so a distributed run and a single-node oracle
    agree bit-for-bit:

    - ``idf`` is quantized to WHOLE BITS, the same device as
      ``corpus.surprisal_profile``: the Robertson/Sparck-Jones+1 ratio
      ``(N - df + 0.5)/(df + 0.5) + 1 = (2N + 2)/(2df + 1)`` is an
      integer division and ``bit_length`` of it is floor(log2)+1 —
      no floating log anywhere, monotone in the true idf, which is all
      a ranking consumes.
    - ``k1 = 6/5`` and ``b = 3/4`` are FIXED rationals, so the tf
      normalization ``tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
      (avgdl = sum_dl/N) clears to the integer ratio
      ``22*tf*sum_dl / (10*tf*sum_dl + 3*sum_dl + 9*dl*N)``.
      Numerator and denominator are exact decimal(38,0) products; the
      single final division runs in doubles (identical IEEE rounding
      of the same exact integers on both engines — the trend-operator
      precedent) and floors to micros.
    - The per-document score is then a SUM of integer micros —
      order-free, safe under any partitioning.

    100 TB shape: doc lengths and corpus totals are one hash aggregate
    each (the 1-row totals broadcast); the term filter is a pushed-down
    IN-list over the (ideally token-bucketed) index, so cost is the
    queried posting lists; the final top-k is a TakeOrdered, never a
    global sort. Returns (doc_id, score_micros, n_terms), ties broken
    by doc_id."""
    from lakeflow.caching import active_scope, maybe_persist

    terms = sorted({t.lower() for t in terms})
    # three consumers (doc lengths -> corpus totals, the term filter,
    # the per-doc join): without a persist an in-query-derived index
    # re-tokenizes the corpus for each — at 100 TB the index is a
    # persisted token-bucketed table and this is a no-op-cheap cache of
    # that scan. ONLY rides an ambient CacheScope (bench/tests wrap
    # each query in one): a bare library call must not leak a
    # session-lifetime persist it can never release (r6 advice) — the
    # recompute is the correct default there.
    if active_scope() is not None:
        index = maybe_persist(index, None)
    dl = index.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # the doc-length relation has TWO consumers here (the corpus-stats
    # aggregate and the per-doc score join) and a THIRD in
    # rm3_expansion's corpus count (Spark's CacheManager substitutes
    # any identical-plan subtree, so persisting it here serves rm3's
    # n_docs aggregate too — the r12 form of VERDICT r11 task #4's
    # "make the BM25-round reuse real"). Ambient-scope-only, the same
    # leak rule as the index persist above.
    if active_scope() is not None:
        dl = maybe_persist(dl, None)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    hits = index.where(F.col("token").isin(terms))
    # postings are unique per (token, doc): count(*) IS the doc freq
    dfr = hits.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    sc = (
        hits.join(F.broadcast(dfr), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf_bits = F.length(
        F.conv(F.expr("(2 * n_docs + 2) div (2 * df + 1)").cast("string"), 10, 2)
    ).cast("long")
    num = (
        idf_bits.cast(_DEC)
        * F.lit(22_000_000).cast(_DEC)
        * F.col("tf").cast(_DEC)
        * F.col("sum_dl").cast(_DEC)
    )
    den = (
        F.lit(10).cast(_DEC) * F.col("tf").cast(_DEC) * F.col("sum_dl").cast(_DEC)
        + F.lit(3).cast(_DEC) * F.col("sum_dl").cast(_DEC)
        + F.lit(9).cast(_DEC) * F.col("dl").cast(_DEC) * F.col("n_docs").cast(_DEC)
    )
    per_term = sc.select(
        "doc_id",
        F.floor(num.cast("double") / den.cast("double")).cast("long").alias("__s"),
    )
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.sum("__s").alias("score_micros"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy(F.desc("score_micros"), F.asc("doc_id"))
        .limit(k)
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rnk",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher) of two ranked
    retrieval lists — the standard hybrid-search combiner for a
    keyword (BM25) list and a vector (ANN) list:

        score(d) = sum over lists of 1 / (c + rank_d(list))

    PURE integer arithmetic: each side contributes
    ``1_000_000 div (c + rank)`` micros (floor division, identical on
    any engine), a missing side contributes 0, and the fused score is
    an integer sum — no floats anywhere, so distributed and
    single-node runs agree bit-for-bit. Ranks are consumed, not
    recomputed: both inputs are ALREADY-BOUNDED top-k relations
    (<= list-k rows each), so the full outer join and the final
    TakeOrdered are constant-size regardless of corpus scale. Returns
    (id, rank_a, rank_b, rrf_micros) ordered by fused score desc, id
    asc, limited to ``k``."""
    ra = a.select(F.col(id_col), F.col(rank_col).cast("long").alias("rank_a"))
    rb = b.select(F.col(id_col), F.col(rank_col).cast("long").alias("rank_b"))
    fused = (
        ra.join(rb, id_col, "full_outer")
        .withColumn(
            "rrf_micros",
            (
                F.coalesce(F.expr(f"1000000 div ({c} + rank_a)"), F.lit(0))
                + F.coalesce(F.expr(f"1000000 div ({c} + rank_b)"), F.lit(0))
            ).cast("long"),
        )
        .select(id_col, "rank_a", "rank_b", "rrf_micros")
    )
    return fused.orderBy(F.desc("rrf_micros"), F.asc(id_col)).limit(k)


def rm3_expansion(
    index: DataFrame,
    terms: list[str],
    k_docs: int = 10,
    k_terms: int = 15,
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (the RM3 relevance-
    model arrangement, Lavrenko & Croft SIGIR'01 as folded into every
    production keyword stack): run the original query, treat its BM25
    top-``k_docs`` as the feedback set, and rank the feedback docs'
    terms by an exact-integer relevance weight

        weight(t) = idf_bits(t) * sum over feedback docs of tf(t, d)

    with ``idf_bits`` the same whole-bit idf quantization as
    :func:`bm25_search` (``bit_length((2N+2) div (2df+1))`` — no
    floating log, monotone in true idf), the original query terms
    excluded, ties broken token-asc. The returned
    (token, df, fb_tf, weight) top-``k_terms`` relation is what a
    caller unions with the original terms for the expanded retrieval
    round.

    100 TB shape: the feedback set is a ``k_docs``-row TakeOrdered
    relation BROADCAST into the posting join, so the per-query cost
    beyond the BM25 round itself is the feedback docs' postings (a
    pruned scan when the index is doc-bucketed) plus one df lookup
    semi-joined to the feedback vocabulary — never a corpus-wide
    expansion. All weights are exact integers, so the expansion set is
    bit-reproducible on any engine."""
    from lakeflow.caching import active_scope, maybe_persist

    terms = sorted({t.lower() for t in terms})
    # four consumers of the index (the BM25 round's three + the
    # feedback-posting join): same ambient-scope-only persist rule as
    # bm25_search
    if active_scope() is not None:
        index = maybe_persist(index, None)
    fb = bm25_search(index, terms, k_docs).select("doc_id")
    fbp = index.join(F.broadcast(fb), "doc_id")
    fb_tokens = fbp.select("token").distinct()
    dfr = (
        index.join(fb_tokens, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    # shaped EXACTLY like bm25_search's doc-length aggregate: under a
    # cache scope bm25_search PERSISTS that relation (r12 — VERDICT r11
    # task #4), and Spark's CacheManager substitutes any subtree whose
    # canonical plan matches, so this inner aggregate reads the cached
    # doc lengths (InMemoryRelation in the plan) instead of paying a
    # third full-index pass
    n_docs = (
        index.groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    idf_bits = F.length(
        F.conv(F.expr("(2 * n_docs + 2) div (2 * df + 1)").cast("string"), 10, 2)
    ).cast("long")
    return (
        fbp.groupBy("token")
        .agg(F.sum("tf").cast("long").alias("fb_tf"))
        .join(dfr, "token")
        .crossJoin(F.broadcast(n_docs))
        .where(~F.col("token").isin(terms))
        .select(
            "token",
            "df",
            "fb_tf",
            (idf_bits * F.col("fb_tf")).cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("token"))
        .limit(k_terms)
    )


def keyword_search_any(
    index: DataFrame, terms: list[str], min_terms: int = 1
) -> DataFrame:
    """Disjunctive variant: docs matching at least ``min_terms`` of
    ``terms``, with the matched-term count for ranking. Same
    pushed-filter + single-aggregate shape."""
    terms = sorted({t.lower() for t in terms})
    hits = index.where(F.col("token").isin(terms))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct(F.col("token")).alias("n_terms"),
            F.sum("tf").alias("total_tf"),
        )
        .where(F.col("n_terms") >= min_terms)
    )


def build_positional_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional posting lists: one row per (token, doc) carrying the
    term frequency AND the sorted 0-based token positions — the index
    shape phrase/proximity queries need (:func:`phrase_search`). Same
    build cost class as :func:`build_inverted_index` (one posexplode +
    one hash aggregate; positions bounded by document length); persist
    bucketed by token like the plain index."""
    tok = F.posexplode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("pos", "token")
    return (
        docs.select(F.col(id_col).alias("doc_id"), tok)
        .where(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.sort_array(F.collect_list(F.col("pos").cast("long"))).alias(
                "positions"
            ),
        )
    )


def phrase_search(index: DataFrame, phrase: list[str]) -> DataFrame:
    """Exact phrase occurrences over a positional index: docs where the
    tokens of ``phrase`` appear CONSECUTIVELY, with the occurrence
    count (overlapping starts counted — each valid start position is
    one occurrence). Returns (doc_id, n_occurrences).

    Shape: each phrase token filters the index to ITS posting rows
    (pushed-down scan on a persisted token-bucketed index), the k
    postings equi-join on doc_id (only docs containing every token
    survive — the same intersection keyword AND pays), and adjacency
    is ONE codegen higher-order expression: start positions of the
    first token filtered by `exists(positions_i, q == p + i)` for every
    later token. Cost is the queried posting lists, never the corpus;
    no per-row Python, no re-tokenization."""
    terms = [t.lower() for t in phrase]
    if not terms:
        raise ValueError("phrase_search requires at least one token")
    # repeated tokens join the same posting relation twice — allowed,
    # each occurrence gets its own __p{i} alias below
    joined = None
    for i, t in enumerate(terms):
        side = index.filter(F.col("token") == t).select(
            "doc_id", F.col("positions").alias(f"__p{i}")
        )
        joined = side if joined is None else joined.join(side, "doc_id")
    # factory, not loop-var defaults: pyspark infers lambda ARITY from
    # the signature, so `lambda p, i=i:` would become the 2-arg
    # (element, index) form and shadow i with the index Column
    def _adjacent(arr, pos_col: str, offset: int):
        return F.filter(
            arr,
            lambda p: F.exists(F.col(pos_col), lambda q: q == p + offset),
        )

    starts = F.col("__p0")
    for i in range(1, len(terms)):
        starts = _adjacent(starts, f"__p{i}", i)
    out = joined.select(
        "doc_id", F.size(starts).cast("long").alias("n_occurrences")
    )
    return out.filter(F.col("n_occurrences") > 0)


def slop_search(index: DataFrame, terms: list[str], slop: int) -> DataFrame:
    """Proximity search over a positional index (the windowed sibling
    of :func:`phrase_search`): docs where ALL ``terms`` occur within a
    window of ``slop`` tokens, in ANY order — i.e. there exist
    positions p_1..p_k (one per term) with max(p) - min(p) <= slop.
    Returns (doc_id, min_span) where ``min_span`` is the doc's tightest
    such window (0 = impossible for distinct terms, 1 = adjacent).

    Shape: identical to phrase_search — each term filters the index to
    ITS posting rows, the k postings equi-join on doc_id, and the
    window test is ONE codegen higher-order expression: the classic
    minimum-window sweep as an ``aggregate`` fold over the doc's
    merged position events, sorted ascending. At each event (pos of
    term t) the fold updates term t's last-seen position; once every
    term has been seen, [min(last-seen), pos] is a valid window and
    its span is a candidate minimum — every minimal window is captured
    at its right-endpoint event, so the fold's running min IS the
    exact min span. Per-doc cost O(sum of the queried terms' tfs × k)
    — linear in the posting volume even for stop-word terms, where a
    one-position-per-term cross-product would materialize the PRODUCT
    of the tfs (three tf-1000 terms: 10^9 tuples in one row). A RANGE
    predicate on positions instead of phrase_search's exact offsets;
    posting-list cost only, never the corpus.

    ``terms`` must be distinct: with a repeated term one occurrence
    would satisfy both slots (span 0), which is never the intended
    proximity question."""
    terms = [t.lower() for t in terms]
    if not terms:
        raise ValueError("slop_search requires at least one token")
    if len(set(terms)) != len(terms):
        raise ValueError(
            "slop_search terms must be distinct; a repeated term is "
            "satisfied by one occurrence (span 0) — use phrase_search "
            "for exact-offset patterns with repeats"
        )
    if slop < 0:
        raise ValueError("slop must be >= 0")
    k = len(terms)
    joined = None
    for i, t in enumerate(terms):
        side = index.filter(F.col("token") == t).select(
            "doc_id", F.col("positions").alias(f"__p{i}")
        )
        joined = side if joined is None else joined.join(side, "doc_id")

    # factory, not loop-var defaults: pyspark infers lambda ARITY from
    # the signature (see phrase_search's note), so the term id must be
    # closed over via a factory, never a `lambda p, i=i` default
    def _tagged(pos_col: str, tid: int):
        return F.transform(
            F.col(pos_col),
            lambda p: F.struct(
                p.cast("long").alias("pos"), F.lit(tid).alias("t")
            ),
        )

    # struct sort orders by the first field: ascending position events
    events = F.array_sort(
        F.concat(*[_tagged(f"__p{i}", i) for i in range(k)])
    )
    big = 1 << 62  # sentinel: larger than any real span
    init = F.struct(
        F.array_repeat(F.lit(-1).cast("long"), k).alias("last"),
        F.lit(big).cast("long").alias("best"),
    )

    def _step(acc, e):
        newlast = F.transform(
            acc["last"],
            lambda v, idx: F.when(idx == e["t"], e["pos"]).otherwise(v),
        )
        ready = ~F.exists(newlast, lambda v: v < 0)
        cand = e["pos"] - F.array_min(newlast)
        best = F.when(
            ready & (cand < acc["best"]), cand
        ).otherwise(acc["best"])
        return F.struct(newlast.alias("last"), best.alias("best"))

    folded = F.aggregate(events, init, _step)
    min_span = F.when(
        folded["best"] < F.lit(big), folded["best"]
    ).cast("long")
    out = joined.select("doc_id", min_span.alias("min_span"))
    return out.filter(F.col("min_span") <= F.lit(slop))

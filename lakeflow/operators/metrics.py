"""Retrieval-quality evaluation metrics (SURVEY §2.12).

The retrieval stack (brute / LSH / IVF / PQ / int8 serving, BM25,
hybrid fusion) needs a measuring stick: when quantization or an index
rebuild changes rankings, "recall@k" (``quant.int8_topk_recall``)
says how many items moved but not whether the RANKING quality moved.
This module scores a retrieval run against graded relevance with the
standard ranked-retrieval metrics — per query, all in exact integer
micros so a SQL oracle replays them bit-for-bit:

- ``n_relevant_topk`` — hits among the top k;
- ``mrr_micros`` — reciprocal rank of the first hit (1e6 div rank; 0
  when none), as a MAX over per-rank reciprocals (rank 1 dominates);
- ``dcg_micros`` / ``ndcg_micros`` — discounted cumulative gain with
  the 1/log2(rank+1) discount QUANTIZED TO LITERAL MICROS per rank
  (``gain_micros``): the one transcendental in nDCG becomes a k-entry
  constant table shared by the Spark plan and the SQL oracle, so no
  float ever crosses an aggregation. The ideal DCG is the literal
  prefix sum at min(corpus relevant, k).

Relevance here is label equality on the embeddings table (the classic
same-class protocol for eval without human qrels); any boolean
relevance column works the same. Shape at 100 TB: the ranking comes
from ``brute_force_topk`` (corpus scan x broadcast(queries)) or any
ANN shortlist with the same (q_id, id, rnk) surface; the scoring
itself joins the |Q| * k ranking rows (broadcast) against the corpus
label projection once, then aggregates per query — evaluation cost is
ranking cost, scoring is free. Zero-hit queries keep their row: every
query has exactly k ranking rows, so no join can drop it (the
hit-flag lesson from ``int8_topk_recall``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gain_micros(k: int) -> list[int]:
    """The rank-discount table: floor(1e6 / log2(rank + 1)) for rank
    1..k — Python-computed literals, the single source both the Spark
    plan and the SQL oracle fold in."""
    return [int(1e6 / math.log2(r + 1)) for r in range(1, k + 1)]


def prefix_gain_micros(k: int) -> list[int]:
    """Ideal-DCG lookup: entry j (0-based) = sum of the first j gains,
    so element [min(n_relevant, k)] is the best achievable DCG."""
    g = gain_micros(k)
    out = [0]
    for x in g:
        out.append(out[-1] + x)
    return out


def retrieval_quality(
    emb: DataFrame,
    query_pred: Column,
    k: int = 10,
    id_col: str = "vec_id",
    rel_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score exact cosine top-k retrieval against same-label relevance:
    one row per query — (q_id, k_requested, n_rel_corpus,
    n_relevant_topk, mrr_micros, dcg_micros, ndcg_micros)."""
    from lakeflow.operators.similarity import brute_force_topk

    top = brute_force_topk(emb, query_pred, k=k, id_col=id_col, vec_col=vec_col)

    # labels of the retrieved ids: corpus projection joined against the
    # BROADCAST |Q|*k ranking — one corpus pass, no shuffle of it
    labels = emb.select(F.col(id_col), F.col(rel_col).alias("__lbl"))
    hits = labels.join(F.broadcast(top), id_col)

    qlab = emb.filter(query_pred).select(
        F.col(id_col).alias("q_id"), F.col(rel_col).alias("__qlbl")
    )
    hits = hits.join(F.broadcast(qlab), "q_id")

    gains = F.array(*[F.lit(g).cast("long") for g in gain_micros(k)])
    rel = (F.col("__lbl") == F.col("__qlbl")).cast("long")
    per_q = (
        hits.select(
            "q_id",
            rel.alias("__rel"),
            F.col("rnk"),
            F.element_at(gains, F.col("rnk").cast("int")).alias("__gain"),
        )
        .groupBy("q_id")
        .agg(
            F.sum("__rel").cast("long").alias("n_relevant_topk"),
            F.max(
                F.when(F.col("__rel") == 1, F.expr("1000000 div rnk")).otherwise(0)
            )
            .cast("long")
            .alias("mrr_micros"),
            F.sum(F.col("__rel") * F.col("__gain")).cast("long").alias("dcg_micros"),
        )
    )

    # ideal DCG: the literal prefix-sum table indexed at
    # min(per-label corpus count - 1, k); label counts are a bounded
    # aggregate (|labels| rows), broadcast back onto the queries
    lc = emb.groupBy(F.col(rel_col).alias("__qlbl")).agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("n_rel_corpus")
    )
    prefix = F.array(*[F.lit(g).cast("long") for g in prefix_gain_micros(k)])
    q_side = qlab.join(F.broadcast(lc), "__qlbl").select(
        "q_id",
        "n_rel_corpus",
        F.element_at(
            prefix, (F.least(F.col("n_rel_corpus"), F.lit(k)) + 1).cast("int")
        ).alias("__idcg"),
    )

    return q_side.join(per_q, "q_id").select(
        "q_id",
        F.lit(k).cast("long").alias("k_requested"),
        "n_rel_corpus",
        "n_relevant_topk",
        "mrr_micros",
        "dcg_micros",
        F.when(
            F.col("__idcg") > 0,
            F.expr("(dcg_micros * 1000000) div __idcg"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ndcg_micros"),
    )


def sql_retrieval_quality(
    k: int = 10,
    query_filter: str = "vec_id < 8",
    table: str = "embeddings",
    vec_sql: str | None = None,
) -> str:
    """DuckDB oracle mirror of :func:`retrieval_quality`: the exact
    cosine top-k replay (micro-int vectors, same (cos DESC, id)
    tie-break) scored with the SAME literal gain tables."""
    if vec_sql is None:
        vec_sql = (
            "[CAST(FLOOR(x * 1000000e0 + 0.5e0) AS BIGINT) "
            "for x in embedding::DOUBLE[]]"
        )
    gains = ", ".join(str(g) for g in gain_micros(k))
    prefix = ", ".join(str(g) for g in prefix_gain_micros(k))
    return f"""
    WITH e AS (SELECT vec_id, label, {vec_sql} AS v FROM {table}),
    en AS (SELECT vec_id, label, v, list_dot_product(v, v) AS n2 FROM e),
    eq AS (SELECT vec_id AS q_id, label AS qlbl, v AS qv, n2 AS qn2
           FROM en WHERE {query_filter}),
    es AS (
      SELECT q.q_id, q.qlbl, n.vec_id, n.label,
             CAST(FLOOR(list_dot_product(n.v, q.qv)
                        / (sqrt(n.n2) * sqrt(q.qn2))
                        * 1000000e0 + 0.5e0) AS BIGINT) AS cm
      FROM en n JOIN eq q ON n.vec_id <> q.q_id),
    etop AS (SELECT q_id, qlbl, vec_id, label, rnk FROM (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY cm DESC, vec_id) AS rnk FROM es)
      WHERE rnk <= {k}),
    scored AS (
      SELECT q_id,
             CAST(SUM(CASE WHEN label = qlbl THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_relevant_topk,
             CAST(MAX(CASE WHEN label = qlbl THEN 1000000 // rnk
                           ELSE 0 END) AS BIGINT) AS mrr_micros,
             CAST(SUM(CASE WHEN label = qlbl
                           THEN list_extract([{gains}], rnk)
                           ELSE 0 END) AS BIGINT) AS dcg_micros
      FROM etop GROUP BY q_id),
    lc AS (SELECT label, COUNT(*) - 1 AS n_rel_corpus
           FROM e GROUP BY label),
    qs AS (
      SELECT q.q_id, CAST(lc.n_rel_corpus AS BIGINT) AS n_rel_corpus,
             list_extract([{prefix}],
                          least(lc.n_rel_corpus, {k}) + 1) AS idcg
      FROM eq q JOIN lc ON lc.label = q.qlbl)
    SELECT qs.q_id, CAST({k} AS BIGINT) AS k_requested,
           qs.n_rel_corpus, s.n_relevant_topk, s.mrr_micros,
           s.dcg_micros,
           CAST(CASE WHEN qs.idcg > 0
                     THEN (s.dcg_micros * 1000000) // qs.idcg
                     ELSE 0 END AS BIGINT) AS ndcg_micros
    FROM qs JOIN scored s ON s.q_id = qs.q_id
    """


def matryoshka_recall(
    emb: DataFrame,
    query_pred: Column,
    dims: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Truncation-recall curve for prefix-sliced embeddings: per query
    and kept-dimension count d, the overlap between exact cosine
    top-k on the FULL vectors and top-k on the first d dimensions —
    (q_id, dims_kept, k_requested, n_overlap, recall_micros).

    This is the serving question matryoshka-style embeddings answer
    ("how many dims can the ANN scan drop before ranking quality
    moves"), measured the same way as the int8 recall contract: both
    sides are corpus-scan x broadcast(queries) through the bounded
    two-phase top-k with the (cos DESC, id) tie-break, overlap via a
    hit-flag left join so zero-overlap queries keep their rows. One
    extra corpus scan per probed dimension — |dims| is a handful, and
    at 100 TB each truncated scan reads d/64ths of the vector bytes
    (the point of the exercise)."""
    from lakeflow.operators.similarity import brute_force_topk

    full = brute_force_topk(
        emb, query_pred, k=k, id_col=id_col, vec_col=vec_col
    ).select(F.col("q_id"), F.col(id_col))

    out = None
    for d in dims:
        sliced = emb.select(
            F.col(id_col),
            F.slice(F.col(vec_col), 1, d).alias("__sv"),
        )
        top_d = brute_force_topk(
            sliced, query_pred, k=k, id_col=id_col, vec_col="__sv"
        ).select("q_id", F.col(id_col), F.lit(1).alias("__hit"))
        scored = (
            full.join(top_d, ["q_id", id_col], "left")
            .groupBy("q_id")
            .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_overlap"))
            .select(
                "q_id",
                F.lit(d).cast("long").alias("dims_kept"),
                F.lit(k).cast("long").alias("k_requested"),
                F.col("n_overlap").cast("long"),
                F.expr(f"(n_overlap * 1000000) div {k}").alias("recall_micros"),
            )
        )
        out = scored if out is None else out.unionByName(scored)
    return out


def sql_matryoshka_recall(
    dims: list[int],
    k: int = 10,
    query_filter: str = "vec_id < 8",
    table: str = "embeddings",
) -> str:
    """DuckDB oracle mirror of :func:`matryoshka_recall` — the full
    top-k CTE once, then per probed dimension a sliced-vector top-k
    and a hit-flag overlap, UNION ALL over dims."""
    vec_sql = (
        "[CAST(FLOOR(x * 1000000e0 + 0.5e0) AS BIGINT) "
        "for x in embedding::DOUBLE[]]"
    )
    per_d = []
    for d in dims:
        per_d.append(f"""
    SELECT e.q_id, CAST({d} AS BIGINT) AS dims_kept,
           CAST({k} AS BIGINT) AS k_requested,
           CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_overlap,
           CAST((SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1000000) // {k} AS BIGINT) AS recall_micros
    FROM etop e LEFT JOIN (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, n.vec_id,
               CAST(FLOOR(list_dot_product(n.dv, q.dv)
                          / (sqrt(list_dot_product(n.dv, n.dv))
                             * sqrt(list_dot_product(q.dv, q.dv)))
                          * 1000000e0 + 0.5e0) AS BIGINT) AS cm,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY CAST(FLOOR(list_dot_product(n.dv, q.dv)
                          / (sqrt(list_dot_product(n.dv, n.dv))
                             * sqrt(list_dot_product(q.dv, q.dv)))
                          * 1000000e0 + 0.5e0) AS BIGINT) DESC,
                          n.vec_id) AS rnk
        FROM (SELECT vec_id, v[1:{d}] AS dv FROM e) n
        JOIN (SELECT vec_id AS q_id, v[1:{d}] AS dv FROM e
              WHERE {query_filter}) q
          ON n.vec_id <> q.q_id)
      WHERE rnk <= {k}) t
      ON t.q_id = e.q_id AND t.vec_id = e.vec_id
    GROUP BY e.q_id""")
    union = "\n    UNION ALL\n".join(per_d)
    return f"""
    WITH e AS (SELECT vec_id, {vec_sql} AS v FROM {table}),
    en AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e),
    eq AS (SELECT vec_id AS q_id, v AS qv, n2 AS qn2 FROM en
           WHERE {query_filter}),
    es AS (
      SELECT q.q_id, n.vec_id,
             CAST(FLOOR(list_dot_product(n.v, q.qv)
                        / (sqrt(n.n2) * sqrt(q.qn2))
                        * 1000000e0 + 0.5e0) AS BIGINT) AS cm
      FROM en n JOIN eq q ON n.vec_id <> q.q_id),
    etop AS (SELECT q_id, vec_id FROM (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY cm DESC, vec_id) AS rnk FROM es)
      WHERE rnk <= {k})
    {union}
    """

"""Maintenance loops for the FROZEN index structures the streaming
maintainers depend on (r11 — VERDICT r10 task #3, closing the
monitor → rebuild → monitor-clears cycle that previously fired into
documentation):

every incremental tier in this engine scores batches against a frozen
structure — the APSS df snapshot (``apss.apss_index_fit``), the IVF
centroid list (``similarity.ivf_centroids`` + the persisted
assignment relation), the semantic-dedup centroids
(``kmeans.semantic_index_fit``), the LSH banding — and each maintainer
appends per-batch drift rows (``{...}/staleness``) with an
``auto_optimize``-style ``rebuild`` flag. The helpers here are the
CALLER side of that contract: read the NEWEST monitor row, and when
it fires, run exactly the rebuild the monitor's docstring prescribes.
They are deliberately batch jobs, not stream mutations — a frozen
structure is rebuilt between stream runs (the availableNow /
restart-per-wave arrangement every maintainer is tested under), never
mutated mid-stream, so replays stay deterministic.

The loop contract each helper satisfies (and the round-trip tests in
``tests/test_streaming.py`` exercise end-to-end): stream a drifting
corpus until the monitor fires → call the helper (rebuild happens) →
stream the next batch → the monitor row CLEARS, because the rebuilt
structure now reflects the corpus the batches are drawn from.

Reference parity note: the reference engine has no streaming surface
at all (single-threaded pandas ETLs); this module is part of the
§2.12 LLM-pipeline surface built beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def read_latest_staleness(spark: SparkSession, staleness_path: str) -> Row | None:
    """The NEWEST monitor row (max ``batch_id``) from a maintainer's
    staleness relation, or None when the relation does not exist yet
    or is empty (a fresh index that has not seen its second batch).
    Replay-duplicated rows for one batch_id are identical
    (deterministic statistics), so max-batch_id-then-limit-1 is
    well-defined."""
    from lakeflow.sinks.merge import read_target_if_exists

    st = read_target_if_exists(spark, staleness_path)
    if st is None:
        return None
    rows = st.orderBy(F.col("batch_id").desc()).limit(1).collect()
    return rows[0] if rows else None


def maintain_apss_index(
    spark: SparkSession,
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_micros: int = 600_000,
) -> bool:
    """One turn of the APSS-index maintenance loop: read the newest
    ``{index_path}/staleness`` row appended by ``stream_apss_index``;
    when its ``rebuild`` flag fires, re-run ``apss.apss_index_fit``
    over ``docs`` — the CURRENT corpus relation (the caller owns it;
    the index stores weights, not raw text) — rebuilding the df
    snapshot and the norm-only prefix index in place. Returns True
    iff a rebuild ran.

    Why this clears the monitor: the next batch is weighted against a
    snapshot built from the corpus the batches have been drawn from,
    so its unseen-term rate collapses and its df-bucket occupancy
    matches the snapshot's. Rebuild-between-runs is safe because
    ``stream_apss_index`` re-reads the weights/prefix relations at
    every batch; the monitor history is retained (append-only) — the
    clear shows up as the NEXT row, not as erased history."""
    row = read_latest_staleness(spark, f"{index_path}/staleness")
    if row is None or row["rebuild"] != 1:
        return False
    from lakeflow.operators.apss import apss_index_fit

    apss_index_fit(docs, index_path, id_col, text_col, threshold_micros)
    return True


def maintain_ivf_index(
    spark: SparkSession,
    vectors: DataFrame,
    assignments_path: str,
    staleness_path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]] | None:
    """One turn of the IVF maintenance loop: read the newest monitor
    row appended by ``stream_ivf_assign``; when it fires, re-pick
    centroids over ``vectors`` (the CURRENT corpus relation) and
    REWRITE the assignment relation against them. Returns the new
    centroid list when a rebuild ran (the caller restarts the stream
    with it — centroids are a frozen argument), else None.

    The overwrite is the one rebuild the monitor's docstring
    prescribes: assignment is a pure function of (vector, centroids),
    so the rewritten relation is deterministic and the restarted
    stream's appends against the new centroids stay replay-safe."""
    row = read_latest_staleness(spark, staleness_path)
    if row is None or row["rebuild"] != 1:
        return None
    from lakeflow.operators.similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(vectors, n_cells, id_col, vec_col)
    ivf_assign(vectors, cents, id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(assignments_path)
    return cents


def maintain_semantic_index(
    spark: SparkSession,
    emb: DataFrame,
    index_path: str,
    staleness_path: str,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[int]] | None:
    """One turn of the semantic-index maintenance loop: read the
    newest monitor row appended by ``stream_semantic_index``; when it
    fires, refit the semantic-dedup index over ``emb`` (the CURRENT
    corpus relation) via ``kmeans.semantic_index_fit`` — centroids
    AND the assignment relation rebuild together. Returns the new
    centroid list when a rebuild ran (the caller restarts the stream;
    it loads centroids from the rebuilt index at start), else None."""
    row = read_latest_staleness(spark, staleness_path)
    if row is None or row["rebuild"] != 1:
        return None
    from lakeflow.operators.kmeans import semantic_index_fit

    return semantic_index_fit(
        spark, emb, index_path, k, n_iter, id_col, vec_col
    )

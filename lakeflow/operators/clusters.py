"""Connected components over candidate-pair graphs.

Near-dup dedup produces PAIRS; keep-one-per-cluster dedup needs the
transitive closure of those pairs (A~B, B~C ⇒ {A,B,C} is one cluster
with one representative). This is min-label propagation expressed as
iterated DataFrame joins: each round every node adopts the smallest
label among itself and its neighbors, converging in O(graph diameter)
rounds. Near-dup graphs are short chains and cliques (template
clusters), so the diameter is small — for adversarial long-path graphs
swap in the large-star/small-star algorithm (Kiveris et al., SoCC'14),
which converges in O(log n) rounds with the same join-only shape.

Scale shape per round: one shuffle join on node id + one hash-agg —
the edge list never materializes on the driver; ``localCheckpoint``
truncates lineage so round N's plan does not replay rounds 1..N-1.
The per-round convergence probe is a count() — one scalar to the
driver, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def min_label_components(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iter: int = 25,
    out_id: str = "member_id",
    out_label: str = "cluster_id",
) -> DataFrame:
    """Assign each node appearing in ``pairs`` the MINIMUM id reachable
    from it (the canonical cluster representative). Returns one row per
    distinct node: (out_id, out_label). Raises if ``max_iter`` rounds
    do not converge (diameter larger than expected — see module note).
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nbl"))
        )
        proposed = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                "id",
                "lbl",
                F.least(F.col("lbl"), F.coalesce("nbl", "lbl")).alias("new_lbl"),
            )
        ).localCheckpoint(eager=True)
        changed = proposed.filter(F.col("new_lbl") != F.col("lbl")).count()
        labels = proposed.select("id", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            return labels.select(
                F.col("id").alias(out_id), F.col("lbl").alias(out_label)
            )
    raise RuntimeError(
        f"min_label_components did not converge in {max_iter} rounds "
        "(unexpectedly large component diameter; use large-star/small-star)"
    )

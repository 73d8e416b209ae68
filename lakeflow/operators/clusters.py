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
The per-round convergence probe is a 1-row aggregate over the fresh
checkpoint (labels are monotone non-increasing, so their sum is a
fixpoint detector) — one scalar to the driver, not data.
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
    Budget note: convergence is detected by two equal consecutive
    label-sum probes, so ``max_iter`` must cover the flood rounds
    (graph diameter) PLUS one observation round — a diameter-d graph
    needs ``max_iter >= d + 1``.
    """
    # symmetrize (+ SELF-EDGES) via ONE explode, not
    # union(edges, reversed(edges)): the union form evaluates the
    # upstream pair pipeline TWICE in the eager checkpoint job below
    # (no subtree reuse across union branches), and for linkage/
    # near-dup callers that upstream is the expensive blocked-scoring
    # join — r10 profile: ~2.8 s of the q_entity_resolution row was
    # the duplicate scoring pass. The self-edges make each node its
    # own neighbor, so the per-round update collapses to ONE join+agg
    # (min over self ∪ neighbors == least(own, neighbor-min)) instead
    # of a propagation join FOLLOWED by a least() left-join — the r10
    # decomposition measured the two-join round at ~0.85 s of fixed
    # per-round stage overhead vs ~0.5 s for this form. (A pointer-
    # jumping variant was measured and rejected: rounds only fell
    # 10 -> 7 on the sf0.1 linkage graph while each round gained a
    # checkpoint + two joins — see SCALING.md "entity-resolution
    # round decomposition".)
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
                    ),
                    F.struct(
                        F.col(id_a).alias("src"), F.col(id_a).alias("dst")
                    ),
                    F.struct(
                        F.col(id_b).alias("src"), F.col(id_b).alias("dst")
                    ),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    # convergence probe: labels are per-node NON-INCREASING (the self-
    # edge keeps min() bounded by the node's own current label), so the
    # label SUM strictly decreases every round until the fixpoint — one
    # 1-row aggregate over the fresh checkpoint replaces the old
    # changed-count filter-join. Probed once per CHECKPOINT (every
    # second round under fusion below — the cadence r10 measured best:
    # every-round probing 4.6-6.4 s vs every-other-round 3.8-4.8 s on
    # the sf0.1 linkage graph; a probe costs a driver round-trip like
    # the propagation itself, and the worst case of probing late is
    # ONE wasted idempotent round). DECIMAL(38,0): the sum is bounded
    # by n * max_id, which overflows BIGINT on trillion-row graphs.
    #
    # ROUND FUSION (r11 — VERDICT r10 task #6): outside the tail, TWO
    # propagation join+agg rounds share ONE eager checkpoint and ONE
    # probe — the per-round fixed cost the r10 decomposition measured
    # (~0.35-0.45 s/round locally) is mostly checkpoint + probe
    # round-trips, and `sym` is reused as-is so fusion adds no join
    # (unlike pointer jumping, measured & rejected in r10). Interleaved
    # A/B on the sf0.1 linkage match graph (scripts/er_fusion_probe.py,
    # outputs asserted identical): min 9.34 s -> 6.02 s, 0.645x.
    # Convergence stays sound: the label sum is non-increasing per
    # round, so equal sums two rounds apart still certify a fixpoint.
    #
    # Tail: detection needs TWO equal consecutive probes, so the final
    # FOUR rounds run single-round with a probe each (ADVICE r10) — a
    # fixpoint reached anywhere inside the budget is always observed
    # twice before the loop ends, and a fused cycle never starts
    # inside the tail (checked before each cycle), so the documented
    # max_iter >= d + 1 budget is sufficient in every parity case.
    prev_sum = None
    i = 0
    while i < max_iter:
        steps = 1 if i >= max_iter - 4 else 2
        cur = labels
        for _ in range(steps):
            cur = (
                sym.join(cur, sym["dst"] == cur["id"])
                .groupBy("src")
                .agg(F.min("lbl").alias("lbl"))
                .withColumnRenamed("src", "id")
            )
        labels = cur.localCheckpoint(eager=True)
        i += steps
        cur_sum = labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:
            return labels.select(
                F.col("id").alias(out_id), F.col("lbl").alias(out_label)
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"min_label_components did not converge in {max_iter} rounds "
        "(unexpectedly large component diameter; use star_contraction_components)"
    )


def star_contraction_components(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iter: int = 20,
    out_id: str = "member_id",
    out_label: str = "cluster_id",
) -> DataFrame:
    """Connected components in O(log n) ROUNDS via alternating
    large-star / small-star contractions (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14) — the scale path for
    high-diameter graphs, where :func:`min_label_components`'s
    O(diameter) rounds would be prohibitive (a 1M-node path converges
    here in ~20 rounds instead of 1M).

    Each round is two join+agg passes over the edge set; the edge set
    only shrinks toward the star form (every node attached directly to
    its component's min id). Same output contract as
    min_label_components; raises if ``max_iter`` rounds do not reach a
    fixpoint."""
    # canonical undirected edge set (a < b), no self loops
    edges = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = (
        edges.select(F.col("a").alias("id"))
        .union(edges.select(F.col("b").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(e: DataFrame) -> DataFrame:
        return e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )

    def _canon(e: DataFrame) -> DataFrame:
        return (
            e.select(
                F.least(F.col("u2"), F.col("v2")).alias("a"),
                F.greatest(F.col("u2"), F.col("v2")).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    for _ in range(max_iter):
        sym = _sym(edges)
        # LARGE-STAR: every neighbor v > u attaches to min(Γ(u) ∪ {u})
        lmin = sym.groupBy("u").agg(F.min("v").alias("nm"))
        large = _canon(
            sym.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u2"),
                F.least(F.col("nm"), F.col("u")).alias("v2"),
            )
        )
        # SMALL-STAR: every neighbor v < u (and u itself) attaches to
        # the min of u's smaller neighborhood
        sm = _sym(large).filter(F.col("v") < F.col("u"))
        smin = sm.groupBy("u").agg(F.min("v").alias("nm"))
        small = _canon(
            sm.join(smin, "u")
            .select(F.col("v").alias("u2"), F.col("nm").alias("v2"))
            .union(
                smin.select(F.col("u").alias("u2"), F.col("nm").alias("v2"))
            )
        ).localCheckpoint(eager=True)
        changed = (
            small.exceptAll(edges).count() + edges.exceptAll(small).count()
        )
        edges = small
        if changed == 0:
            labels = edges.groupBy(F.col("b").alias("id")).agg(
                F.min("a").alias("lbl")
            )
            return (
                all_nodes.join(labels, "id", "left")
                .select(
                    F.col("id").alias(out_id),
                    F.coalesce("lbl", F.col("id")).alias(out_label),
                )
            )
    raise RuntimeError(
        f"star_contraction_components did not converge in {max_iter} rounds"
    )


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    order_col,
    id_a: str | None = None,
    id_b: str | None = None,
) -> DataFrame:
    """Materialize the DEDUPLICATED corpus: cluster the candidate pairs
    (connected components), keep exactly one row per cluster — the one
    with the highest ``order_col`` (quality score, recency), ties to
    the smallest id — and pass every unpaired row through untouched.
    Returns df's columns plus ``n_merged`` (cluster size; 1 for
    singletons). This is the final step of the near-dup funnel:
    detect (LSH) -> verify (Jaccard) -> cluster (components) ->
    SELECT SURVIVORS.

    100 TB shape: singleton rows — the overwhelming majority of a real
    corpus — take a broadcast-able left join against the (small) label
    relation and NEVER enter a window; only rows in some candidate
    pair (bounded by the pair population, not the corpus) are
    window-ranked per cluster. The pair relation should come from the
    capped LSH path so one degenerate template cluster cannot pull the
    whole corpus into the ranked branch."""
    from pyspark.sql import Window

    id_a = id_a or f"{id_col}_a"
    id_b = id_b or f"{id_col}_b"
    order_c = F.col(order_col) if isinstance(order_col, str) else order_col
    lbl = min_label_components(
        pairs, id_a, id_b, out_id=id_col, out_label="__cluster"
    )
    with_lbl = df.join(lbl, id_col, "left")
    singles = with_lbl.filter(F.col("__cluster").isNull()).select(
        *df.columns, F.lit(1).cast("long").alias("n_merged")
    )
    w = Window.partitionBy("__cluster").orderBy(
        order_c.desc(), F.col(id_col).asc()
    )
    best = (
        with_lbl.filter(F.col("__cluster").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_merged",
            F.count(F.lit(1)).over(Window.partitionBy("__cluster")).cast("long"),
        )
        .filter(F.col("__rn") == 1)
        .select(*df.columns, "n_merged")
    )
    return singles.unionByName(best)

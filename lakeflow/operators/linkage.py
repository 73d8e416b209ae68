"""Record linkage / entity resolution: blocking, field-similarity
scoring, weighted match classification (SURVEY §2.12 extension — the
fuzzy complement to content dedup: the same real-world entity arriving
from two sources with TYPOS, not byte-identical payloads).

The reference has no linkage; its upserts assume clean natural keys.
Real multi-source lakes (the reference's mailgun + iterable + mongo
fan-in is exactly that shape) need probabilistic matching before a
merge key exists at all. Design follows the classical Fellegi-Sunter
decomposition, Spark-first:

- **Blocking** (candidate generation): NEVER all-pairs. Records are
  compared only within equi-join buckets on cheap deterministic keys
  (phone prefix, normalized-name prefix, geo cell ...). This is the
  same shuffle shape as every other candidate stage in this repo (LSH
  bands, setsim prefixes): an equi-join on a low-fanout key, so
  candidate cost is sum(block^2), not corpus^2 — and multiple blocking
  passes union'd (phone-block OR name-block) recover pairs a single
  noisy key would miss, at the cost of a distinct.
- **Field similarity**: per compared field, an EXACT integer
  edit-similarity in micro-units:
  ``sim = floor((maxlen - levenshtein) * 1e6 / maxlen)`` (1e6 when
  both sides are empty). Levenshtein is a JVM built-in (codegen), and
  the integer arithmetic reproduces bit-for-bit in any engine — the
  whole scorer is SQL-mirrorable, so linkage output is
  oracle-checkable like every other operator here.
- **Match score**: agreement weights per field (the caller-supplied,
  domain-tuned stand-in for fitted Fellegi-Sunter log m/u weights —
  fitting them via EM is a bounded-iteration aggregate loop that
  slots in later without changing this plan shape):
  ``score = floor(sum(w_i * sim_i) / sum(w_i))`` — a weighted mean in
  micro-units, again exact.
- **Classification**: ``score >= threshold_micros`` → candidate match
  pair (id_a, id_b, score). Downstream, pairs feed the SAME
  connected-components + survivor machinery as content dedup
  (``operators/clusters.py``): linkage pairs -> entity clusters ->
  one canonical record per entity.

Scale: blocking keys are chosen so blocks stay O(1)-ish; the scorer
runs only on candidates; levenshtein cost is O(len_a * len_b) per
candidate on short identity fields (names, addresses — tens of chars),
far cheaper than the document-scale edit distances the near-dup
pipeline guards with md5 short-circuits. Skewed blocks (a default
phone prefix, an empty name) are the blocking-key analogue of LSH hot
buckets — ``max_block_size`` drops them the same way (a block that
degenerate carries no discriminating signal anyway).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def edit_similarity_micros(a: Column, b: Column) -> Column:
    """Exact integer edit similarity in [0, 1e6]:
    ``floor((maxlen - lev) * 1e6 / maxlen)``, 1e6 if both empty,
    0 if exactly one is empty/null. All-integer (the division is exact
    in double far below 2^53), so any SQL engine mirrors it."""
    a = F.coalesce(a, F.lit(""))
    b = F.coalesce(b, F.lit(""))
    ml = F.greatest(F.length(a), F.length(b))
    sim = F.floor(
        (ml - F.levenshtein(a, b)).cast("double") * F.lit(MICRO) / ml.cast("double")
    ).cast("long")
    return F.when(ml == 0, F.lit(MICRO).cast("long")).otherwise(sim)


def sql_edit_similarity(a: str, b: str) -> str:
    """DuckDB mirror of :func:`edit_similarity_micros` for oracles."""
    a = f"COALESCE({a}, '')"
    b = f"COALESCE({b}, '')"
    ml = f"GREATEST(LENGTH({a}), LENGTH({b}))"
    return (
        f"CASE WHEN {ml} = 0 THEN 1000000 ELSE "
        f"CAST(FLOOR(CAST(({ml} - levenshtein({a}, {b})) AS DOUBLE) "
        f"* 1000000e0 / CAST({ml} AS DOUBLE)) AS BIGINT) END"
    )


def record_linkage(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    fields: Sequence[tuple[str, str, int]],
    block_keys: Sequence[tuple[Column, Column]],
    threshold_micros: int = 800_000,
    max_block_size: int | None = None,
) -> DataFrame:
    """Probabilistic linkage between two record sets.

    ``fields``: (left_col, right_col, weight) triples — each compared
    by exact integer edit similarity, combined as the weight-averaged
    score. ``block_keys``: (left_expr, right_expr) blocking passes;
    candidates are the UNION of the per-pass equi-joins (distinct on
    the id pair), so one noisy key doesn't lose the pair. Returns
    (left_id, right_id, score_micros, match) for every candidate, with
    ``match`` = score >= threshold — keeping near-miss candidates
    visible is what lets a clerical-review band be carved out later
    (the Fellegi-Sunter three-way decision). Self-linkage callers
    (left is right) should pre-filter ``left_id < right_id`` downstream
    or pass distinct frames.

    ``max_block_size`` drops degenerate blocks (both sides) before the
    join, exactly like the LSH hot-bucket cap: a blocking key shared by
    thousands of records carries no signal and would quadratically
    dominate the candidate count."""
    # compared fields get positional internal names: the two sides
    # routinely share column names (both have "name"), which would make
    # the scoring joins ambiguous
    l_base = left.select(
        F.col(left_id),
        *[F.col(lf).alias(f"__lf{i}") for i, (lf, _rf, _w) in enumerate(fields)],
    )
    r_base = right.select(
        F.col(right_id),
        *[F.col(rf).alias(f"__rf{i}") for i, (_lf, rf, _w) in enumerate(fields)],
    )

    cands = None
    for lk, rk in block_keys:
        # blocking keys may use columns outside `fields` (phone, geo
        # cell ...) — derive them from the full input frames
        a = left.select(F.col(left_id), lk.alias("__bk"))
        b = right.select(F.col(right_id), rk.alias("__bk"))
        if max_block_size is not None:
            cap = max_block_size
            asz = a.groupBy("__bk").agg(F.count(F.lit(1)).alias("__n"))
            bsz = b.groupBy("__bk").agg(F.count(F.lit(1)).alias("__n"))
            a = a.join(asz.filter(F.col("__n") <= cap).select("__bk"), "__bk")
            b = b.join(bsz.filter(F.col("__n") <= cap).select("__bk"), "__bk")
        pairs = a.join(b, "__bk").select(left_id, right_id)
        cands = pairs if cands is None else cands.unionByName(pairs)
    cand = cands.distinct()

    scored = cand.join(l_base, left_id).join(r_base, right_id)
    total_w = sum(w for _l, _r, w in fields)
    acc = None
    for i, (_lf, _rf, w) in enumerate(fields):
        term = edit_similarity_micros(
            F.col(f"__lf{i}"), F.col(f"__rf{i}")
        ) * F.lit(w)
        acc = term if acc is None else acc + term
    score = F.floor(acc.cast("double") / F.lit(total_w)).cast("long")
    return scored.select(
        F.col(left_id),
        F.col(right_id),
        score.alias("score_micros"),
        (score >= F.lit(threshold_micros)).alias("match"),
    )


def resolve_entities(
    pairs: DataFrame,
    records: DataFrame,
    id_col: str,
    left_id: str = "id_a",
    right_id: str = "id_b",
) -> DataFrame:
    """Linkage pairs -> entity ids: connected components over the match
    graph (reusing the dedup cluster machinery — min-label propagation,
    join-only rounds), then one row per record tagged ``entity_id``.
    Records matched to nothing keep their own id as the entity id.
    Survivorship (one canonical row per entity) is then the same
    latest-wins/cluster-rank pattern as dedup survivors."""
    from lakeflow.operators.clusters import min_label_components

    clustered = min_label_components(
        pairs, left_id, right_id, out_id=id_col, out_label="__entity"
    )
    return (
        records.join(clustered, id_col, "left")
        .withColumn("entity_id", F.coalesce(F.col("__entity"), F.col(id_col)))
        .drop("__entity")
    )

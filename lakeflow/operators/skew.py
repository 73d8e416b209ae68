"""Skew mitigation (SURVEY §4; BASELINE north star: "skewed keys hurt").

AQE's skew-join splitting (on in session.py) handles sort-merge join
skew at runtime. These helpers cover the cases AQE does not:

- ``salted_aggregate``: a groupBy where one key holds a large fraction
  of all rows (the classic null-key / hot-tenant problem). Salting
  splits each hot key across ``n_salts`` reducers (partial aggregate),
  then a cheap second aggregate over n_salts rows per key merges. Works
  for any decomposable aggregate (sum/count/min/max).
- ``salted_broadcast_left``: a broadcast join where the STREAM side is
  skewed is already fine (no shuffle); this handles the shuffle-join
  case by replicating the small side n_salts times so the big side's
  salted keys still match. Use only when the small side is too big to
  broadcast but small enough to replicate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column -> (input column expr, fn) with fn in
    {sum, count, min, max}. Phase 1 groups on (keys + salt) — hot keys
    spread over ``n_salts`` reducers; phase 2 merges (sum/sum, count->
    sum, min/min, max/max) on the true keys over a tiny frame.
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[
            phase1_fn[fn](F.expr(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    return p1.groupBy(*keys).agg(
        *[merge_fn[fn](F.col(out)).alias(out) for out, (col, fn) in aggs.items()]
    )


def salted_shuffle_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof shuffle equi-join: the big side gets a random salt,
    the small side is replicated once per salt value, and the join key
    becomes (key, salt) — a hot key's rows spread over ``n_salts``
    tasks instead of one straggler."""
    b = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")

"""Mergeable cardinality sketches: portable HyperLogLog (SURVEY §2.12).

Spark's built-in ``approx_count_distinct`` (HLL++, used by
``q_approx_distinct`` / the profiling ops) answers one-shot questions,
but its sketch state is opaque: it cannot be persisted as a table,
MAX-merged incrementally from a stream, or replayed by another engine.
This module is the OPEN form — registers are plain (group, bucket,
rho) rows, so:

- the register table is a first-class maintained aggregate: a
  streaming MAX-fold (``corpus_intake.stream_hll`` via
  ``sinks/merge.merge_max``) keeps it current per batch, and replay
  safety is ALGEBRAIC (max(a, a) == a) — exactly-once for free, the
  same contract as the minhash-signature and int8-scale maintainers;
- estimates derive at READ time from the maintained rows and equal the
  batch sketch over everything ever streamed, at any instant;
- every step is cross-engine deterministic: the hash is the repo's
  seeded md5 (``functions/hashing.seeded_hash``), rho comes from the
  minimal binary-string length (identical ``bin()`` semantics on
  Spark and DuckDB), and the estimate is one integer division of a
  literal numerator — a DuckDB oracle replays the whole sketch
  bit-for-bit (``q_hll_distinct``).

Shape at 100 TB: ONE hash aggregate over (group, bucket) — at p=8
that is 256 rows per group, map-side combined before a tiny shuffle —
then a <=|groups|-key aggregate for the estimate. No distinct is ever
materialized; the register table is |groups| * 256 rows regardless of
corpus size.

Estimator notes (Flajolet et al. 2007): the raw HLL estimate is
accurate (~1.04/sqrt(m) ~ 6.5% at p=8) once n >> m; below ~2.5m the
standard correction is linear counting over the zero-register count.
The distributed surface emits the raw estimate plus the zero count
(both exact integers); :func:`corrected_estimate` applies the
linear-counting switch driver-side, where the one logarithm is
harmless (monitor reads are row-bounded; the transcendental never
enters a cross-engine comparison). Estimates overflow their BIGINT
micro representation only past ~9e12 distinct values — beyond the
60-bit hash's own collision regime — documented, not guarded.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeflow.functions.exact import trunc_div
from lakeflow.functions.hashing import SQL_SEEDED_HASH, seeded_hash

#: register-count exponent: m = 2^P registers per group
P = 8
M = 1 << P
#: floor(1e6 * 0.7213 / (1 + 1.079/m)) for m = 256
ALPHA_MICRO = 718272
#: the 60-bit md5-slice hash leaves 60 - P = 52 bits above the bucket;
#: an all-zero remainder scores rho = 52 + 1
RHO_MAX = 60 - P + 1
#: estimate numerator: ALPHA_MICRO * m^2 * 2^(RHO_MAX)
A_NUM = ALPHA_MICRO * M * M * (1 << RHO_MAX)


def hll_registers(
    df: DataFrame,
    value_col: Column | str,
    group_cols: Sequence[str] = (),
    seed: str = "hll",
) -> DataFrame:
    """The sketch: per group, up to m = 256 rows (group..., bucket,
    rho) with rho the max leading-zero rank seen in that bucket.
    One map-side-combined hash aggregate; absent buckets mean rho = 0
    (they carry no row — the estimator accounts for them)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    h = seeded_hash(v.cast("string"), seed)
    bucket = (h % F.lit(M)).alias("bucket")
    # bit shift, NOT h / M: the hash is 60-bit and a double division
    # loses exactness past 2^53
    r = F.shiftright(h, P)
    rho = (
        F.when(r == 0, F.lit(RHO_MAX))
        .otherwise(F.lit(RHO_MAX) - F.length(F.bin(r)))
        .alias("__rho")
    )
    return (
        df.select(*group_cols, bucket, rho)
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").cast("long").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Registers -> per-group raw estimate: (group..., n_zero,
    sum_pow, est_micros) where sum_pow = sum over all m registers of
    2^(RHO_MAX - rho) (absent/zero registers contribute 2^RHO_MAX —
    exact, <= m * 2^53 < 2^63) and est_micros = A_NUM div sum_pow —
    the harmonic-mean estimate as ONE integer division of a literal
    DECIMAL numerator, bit-identical on any engine."""
    per_group = registers.groupBy(*group_cols).agg(
        (F.lit(M) - F.count(F.lit(1))).cast("long").alias("n_zero"),
        # python-side F.shiftleft wants a literal bit count; the SQL
        # form takes the per-row expression. coalesce: an EMPTY global
        # sketch (no registers at all) must yield the deterministic
        # all-zero-registers estimate (raw ~ alpha*m; corrected_estimate
        # linear-counts it to 0), not a NULL row
        F.coalesce(
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST({RHO_MAX} - rho AS INT))"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("__present"),
    )
    sum_pow = (
        F.col("__present")
        + F.col("n_zero") * F.lit(1 << RHO_MAX).cast("long")
    ).alias("sum_pow")
    out = per_group.select(*group_cols, "n_zero", sum_pow)
    return out.select(
        *group_cols,
        "n_zero",
        "sum_pow",
        trunc_div(
            F.expr(f"CAST('{A_NUM}' AS DECIMAL(38,0))"), F.col("sum_pow")
        ).alias("est_micros"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: Column | str,
    group_cols: Sequence[str] = (),
    seed: str = "hll",
) -> DataFrame:
    """One-stop batch form: sketch then estimate."""
    return hll_estimate(hll_registers(df, value_col, group_cols, seed), group_cols)


def corrected_estimate(est_micros: int, n_zero: int) -> float:
    """Driver-side small-range correction (the read path for monitors):
    linear counting m*ln(m/V) when the raw estimate sits in its biased
    regime (est <= 2.5m) and zero registers remain; the raw estimate
    otherwise. Float on purpose — this is a human-facing monitor
    number, never part of a cross-engine comparison."""
    est = est_micros / 1e6
    if est <= 2.5 * M and n_zero > 0:
        return M * math.log(M / n_zero)
    return est


def sql_hll_distinct(
    value_expr: str, table: str, group_cols: Sequence[str] = (), seed: str = "hll"
) -> str:
    """DuckDB oracle mirror of :func:`hll_distinct` — the same seeded
    md5-slice hash, bucket split, bin()-length rho, register max and
    literal-numerator division, as one SQL string."""
    h = SQL_SEEDED_HASH.format(seed=seed, x=f"CAST({value_expr} AS VARCHAR)")
    g = ", ".join(group_cols)
    g_pre = f"{g}, " if g else ""
    g_by = f"GROUP BY {g}" if g else ""
    return f"""
    WITH h AS (SELECT {g_pre}{h} AS hv FROM {table}),
    r AS (SELECT {g_pre}hv % {M} AS bucket,
                 CASE WHEN hv // {M} = 0 THEN {RHO_MAX}
                      ELSE {RHO_MAX} - length(bin(hv // {M})) END AS rho
          FROM h),
    regs AS (SELECT {g_pre}bucket, MAX(rho) AS rho
             FROM r GROUP BY {g_pre}bucket),
    agg AS (SELECT {g_pre}CAST({M} - COUNT(*) AS BIGINT) AS n_zero,
                   CAST(SUM(1::BIGINT << ({RHO_MAX} - rho))
                        + ({M} - COUNT(*)) * (1::BIGINT << {RHO_MAX})
                        AS BIGINT) AS sum_pow
            FROM regs {g_by})
    SELECT {g_pre}n_zero, sum_pow,
           CAST(CAST('{A_NUM}' AS HUGEINT) // sum_pow AS BIGINT)
             AS est_micros
    FROM agg
    """


# ----------------------------------------------------- count-min sketch

#: count-min geometry: D independent hash rows, W = 2^WP buckets each
CMS_D = 4
CMS_WP = 10
CMS_W = 1 << CMS_WP


def cms_sketch(
    df: DataFrame,
    value_col: Column | str,
    group_cols: Sequence[str] = (),
    seed: str = "cms",
) -> DataFrame:
    """The frequency twin of :func:`hll_registers`: a count-min sketch
    as OPEN rows (group..., seed_row, bucket, n) — D*W bounded rows
    per group regardless of corpus size, from ONE map-side-combined
    hash aggregate over the (seed_row, bucket) explosion (D rows per
    input value). Counts are ADDITIVE, so the sketch of a union is
    the element-wise sum: ``merge_additive`` (under a commit token —
    sums are not idempotent) maintains it from a stream exactly as
    the vocab counters, and any engine replays every cell.

    Point lookups (:func:`cms_lookup`) return min over rows of the
    probed cells — an overestimate by at most the standard eps*N with
    probability 1-delta (eps = e/W ~ 0.0027, delta = e^-D ~ 0.018):
    the "how often did THIS value occur" answer over an unbounded
    stream in D*W integers, where exact per-value counts would need
    unbounded state."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    s = v.cast("string")
    rows = []
    for d in range(CMS_D):
        h = seeded_hash(s, f"{seed}{d}")
        rows.append(
            F.struct(
                F.lit(d).cast("long").alias("seed_row"),
                (h % F.lit(CMS_W)).cast("long").alias("bucket"),
            )
        )
    return (
        df.select(*group_cols, F.explode(F.array(*rows)).alias("__c"))
        .select(*group_cols, "__c.seed_row", "__c.bucket")
        .groupBy(*group_cols, "seed_row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cms_lookup(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str,
    group_cols: Sequence[str] = (),
    seed: str = "cms",
) -> DataFrame:
    """Estimate each probe value's occurrence count from the sketch:
    (group..., probe, est_n). The probe relation is expected small
    (candidate heavy hitters, a watchlist): it explodes to D rows per
    probe, equi-joins the sketch on (seed_row, bucket) — broadcast,
    the sketch is D*W rows per group — and MINs per probe. Probes
    whose cells were never touched estimate 0 via the left join."""
    p = F.col(probe_col) if isinstance(probe_col, str) else probe_col
    rows = []
    for d in range(CMS_D):
        h = seeded_hash(p.cast("string"), f"{seed}{d}")
        rows.append(
            F.struct(
                F.lit(d).cast("long").alias("seed_row"),
                (h % F.lit(CMS_W)).cast("long").alias("bucket"),
            )
        )
    cells = probes.select(
        *group_cols, p.alias("probe"), F.explode(F.array(*rows)).alias("__c")
    ).select(*group_cols, "probe", "__c.seed_row", "__c.bucket")
    joined = cells.join(
        sketch, [*group_cols, "seed_row", "bucket"], "left"
    ).select(
        *group_cols, "probe", F.coalesce(F.col("n"), F.lit(0)).alias("__n")
    )
    return joined.groupBy(*group_cols, "probe").agg(
        F.min("__n").cast("long").alias("est_n")
    )


def sql_cms_estimate(
    value_expr: str,
    table: str,
    probe_filter: str,
    seed: str = "cms",
) -> str:
    """DuckDB oracle mirror of sketch-then-lookup for an ungrouped
    sketch whose probes are ``SELECT DISTINCT <value_expr> FROM
    <table> WHERE <probe_filter>`` — same seeded hashes, same cells,
    same MIN."""
    x = f"CAST({value_expr} AS VARCHAR)"
    cell_rows = " UNION ALL ".join(
        f"SELECT {d} AS seed_row, "
        + SQL_SEEDED_HASH.format(seed=f"{seed}{d}", x="v")
        + f" % {CMS_W} AS bucket, v FROM vals"
        for d in range(CMS_D)
    )
    # probes keep the NATIVE type (the Spark side's probe column does);
    # only the hash input is stringified
    return f"""
    WITH vals AS (SELECT {x} AS v FROM {table}),
    cells AS ({cell_rows}),
    sk AS (SELECT seed_row, bucket, CAST(COUNT(*) AS BIGINT) AS n
           FROM cells GROUP BY 1, 2),
    probes AS (SELECT DISTINCT {value_expr} AS probe FROM {table}
               WHERE {probe_filter}),
    pc AS ({" UNION ALL ".join(
        f"SELECT probe, {d} AS seed_row, "
        + SQL_SEEDED_HASH.format(seed=f"{seed}{d}", x="CAST(probe AS VARCHAR)")
        + f" % {CMS_W} AS bucket FROM probes"
        for d in range(CMS_D)
    )})
    SELECT pc.probe, CAST(MIN(COALESCE(sk.n, 0)) AS BIGINT) AS est_n
    FROM pc LEFT JOIN sk USING (seed_row, bucket)
    GROUP BY pc.probe
    """

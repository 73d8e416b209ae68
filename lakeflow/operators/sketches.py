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


# ----------------------------------------------------- quantile sketch

#: default sub-bins per power-of-two bucket: relative error <= 1/S
LOGHIST_SUB_BINS = 4096


def loghist_key(v: Column, sub_bins: int = LOGHIST_SUB_BINS) -> Column:
    """Deterministic log-histogram bin key for a LONG value — the
    quantile-sketch sibling of the HLL/CMS family, for value domains
    too large to count exactly (``q_exact_quantiles``'s counts table
    is value-domain-bounded; a 100 TB corpus of high-resolution
    micros is not). Each power-of-two magnitude bucket splits into
    ``sub_bins`` linear sub-bins, so the key space is
    O(64 * sub_bins) regardless of the data and the representative
    value of a bin is within RELATIVE error 1/sub_bins of every value
    it absorbs — the KLL/t-digest use case WITHOUT their
    order/randomness nondeterminism (both engines replay the binning
    bit-for-bit; the sketch is a plain additive counts table, so
    merge = SUM and streaming maintenance is the CMS SUM-fold).

    key = sign(v) * (bit_length(|v|) * sub_bins + sub) with
    sub = ((|v| - 2^(b-1)) * sub_bins) div 2^(b-1); key(0) = 0.
    MONOTONE in v (larger value -> larger key), so percentile_disc
    selection over keys lands in the bin containing the true
    quantile. bit_length via length(bin(x)) — identical on Spark and
    DuckDB (the HLL rho precedent); 2^(b-1) via pow(2, b-1), exact in
    a double for every BIGINT magnitude; the sub-bin division runs in
    DECIMAL(38,0) (``trunc_div``) because (|v| - lo) * sub_bins can
    pass 2^63."""
    m = F.abs(v)
    bucket = F.length(F.bin(m)).cast("long")  # floor(log2 m) + 1, m > 0
    lo = F.pow(F.lit(2.0), (bucket - 1).cast("double")).cast("long")
    sub = trunc_div(
        (m - lo).cast("decimal(38,0)") * F.lit(int(sub_bins)), lo
    )
    sgn = F.when(v < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    return F.when(v == F.lit(0), F.lit(0).cast("long")).otherwise(
        sgn * (bucket * F.lit(int(sub_bins)) + sub)
    )


def loghist_decode(key: Column, sub_bins: int = LOGHIST_SUB_BINS) -> Column:
    """Representative value (the bin's signed LOWER magnitude edge) of
    a :func:`loghist_key`: |decoded| <= |v| < |decoded| + 2^(b-1)/S
    for every v the bin absorbed — relative error <= 1/sub_bins."""
    a = F.abs(key)
    bucket = trunc_div(a, F.lit(int(sub_bins)).cast("long"))
    sub = a % F.lit(int(sub_bins))
    lo = F.pow(F.lit(2.0), (bucket - 1).cast("double")).cast("long")
    off = trunc_div(sub.cast("decimal(38,0)") * lo, F.lit(int(sub_bins)))
    sgn = F.when(key < 0, F.lit(-1)).otherwise(F.lit(1)).cast("long")
    return F.when(key == F.lit(0), F.lit(0).cast("long")).otherwise(
        sgn * (lo + off)
    )


def loghist_counts(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    sub_bins: int = LOGHIST_SUB_BINS,
) -> DataFrame:
    """The maintained sketch relation: (group..., key, n) — ONE hash
    aggregate over the scan, map-side combined to the key-space bound
    (<= 64 * sub_bins rows per group) before a tiny shuffle. Additive
    and mergeable: counts from any corpus split SUM to the whole
    (``sinks/merge.merge_additive`` / ``stream_loghist`` maintain it
    from a stream with the CMS commit-token contract)."""
    key = loghist_key(F.col(value_col), sub_bins).alias("key")
    return df.groupBy(*group_cols, key).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def loghist_quantiles(
    counts: DataFrame,
    probs: Sequence[float],
    group_col: str | Sequence[str] | None = None,
    sub_bins: int = LOGHIST_SUB_BINS,
) -> DataFrame:
    """Approximate quantiles from the maintained counts: exact
    percentile_disc selection over the MONOTONE keys (the certified
    ``profile.quantiles_from_value_counts`` machinery), then decode —
    so ``approx_micros`` is within relative error 1/sub_bins of the
    exact percentile_disc answer, at any corpus size, from a
    key-space-bounded read. ``group_col`` follows the fleet-monitor
    contract of the KS/chi²/exact-quantile family: a name, a SEQUENCE
    of names (per-(source, lang) in one pass), or None. Output
    (group..., p_micros, approx_micros, n_total)."""
    from lakeflow.operators.profile import quantiles_from_value_counts

    q = quantiles_from_value_counts(counts, "key", "n", probs, group_col)
    gcols = (
        [group_col]
        if isinstance(group_col, str)
        else list(group_col)
        if group_col is not None
        else []
    )
    cols = gcols + ["p_micros"]
    return q.select(
        *cols,
        loghist_decode(F.col("value"), sub_bins).alias("approx_micros"),
        "n_total",
    )

"""Deterministic sampling for training-data pipelines.

``df.sample()`` draws from a per-partition RNG: results change with
partitioning, task retries, and engine — unusable when a 100 TB corpus
must be sampled REPRODUCIBLY (same doc always in or out, across reruns
and across engines checking each other). Content-hash sampling fixes
that: keep a row iff ``seeded_hash(key) % 1e6 < rate_ppm``. The
predicate is a narrow, codegen'd filter evaluated at the scan — no
shuffle, no state, trivially parallel — and the kept set is a stable
function of the data itself.

Rates are parts-per-million integers (the exact-arithmetic policy:
no float thresholds that could round differently across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeflow.functions.hashing import SQL_SEEDED_HASH, seeded_hash

PPM = 1_000_000


def hash_sample(
    df: DataFrame, key_col: str, rate_ppm: int, seed: str = "smp"
) -> DataFrame:
    """Keep rows whose seeded key hash lands under ``rate_ppm``.
    Expected fraction = rate_ppm/1e6; membership is deterministic per
    (seed, key) — disjoint seeds give independent samples, and a
    smaller rate's sample is a SUBSET of a larger rate's (nested
    samples for scaling-law runs)."""
    h = seeded_hash(F.col(key_col).cast("string"), seed)
    return df.filter(h % PPM < F.lit(rate_ppm))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates_ppm: dict[str, int],
    default_ppm: int = 0,
    seed: str = "smp",
) -> DataFrame:
    """Per-stratum deterministic sampling — the domain-mixing primitive
    (e.g. keep 100% of books, 5% of crawl). Strata not listed fall back
    to ``default_ppm`` (0 = drop). Same nested-sample property per
    stratum as :func:`hash_sample`."""
    rate = F.lit(default_ppm)
    for value, ppm in rates_ppm.items():
        rate = F.when(F.col(stratum_col) == value, F.lit(ppm)).otherwise(rate)
    h = seeded_hash(F.col(key_col).cast("string"), seed)
    return df.filter(h % PPM < rate)


def sql_hash_sample_pred(key_expr: str, rate_sql: str, seed: str = "smp") -> str:
    """DuckDB mirror of the sampling predicate, for oracles."""
    h = SQL_SEEDED_HASH.format(seed=seed, x=key_expr)
    return f"({h} % {PPM}) < ({rate_sql})"


def token_budget_sample(
    df: DataFrame,
    group_col: str,
    weight_col,
    budget: int,
    key_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Per-group budget capping — the corpus-MIXING primitive: from
    each group (source/domain/language), keep rows in a deterministic
    seeded-hash order until the group's cumulative ``weight_col``
    (token count, bytes) exceeds ``budget``. Unlike rate-based
    sampling, this bounds each group's absolute contribution — "at
    most B tokens per domain" — which is how mixture weights are
    enforced when domain sizes are wildly skewed.

    Plan shape at 100 TB: the running sum is the distributed prefix sum
    of ``operators/prefix.py`` (per-group quantile buckets over the
    hash order, per-bucket totals, bucket offsets, within-bucket
    windows) — a plain per-group window would put each DOMAIN through
    one task's sorter, and domains are exactly the keys whose biggest
    member grows with the corpus. The hash order is computed at the
    scan, no global sort. A row is kept iff its running total
    (inclusive) stays within budget, so the kept set is a stable
    function of the data — reruns, retries and other engines agree
    bit-for-bit.
    """
    from lakeflow.operators.prefix import bucketed_running_sum

    w_col = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = seeded_hash(F.col(key_col).cast("string"), seed)
    run = bucketed_running_sum(
        df.withColumn("__w", w_col.cast("long")).withColumn("__h", h),
        group_col,
        "__h",
        (key_col,),
        "__w",
        out_col="__run",
    )
    return (
        run.filter(F.col("__run") <= F.lit(budget))
        .drop("__w", "__run", "__h")
    )


def exact_k_sample(
    df: DataFrame, key_col: str, k: int, seed: str = "smp"
) -> DataFrame:
    """Exactly-k deterministic uniform sample: the k rows whose seeded
    key hash is smallest (key as tie-break). Rate-based hash_sample
    gives a BINOMIAL count around the target; eval-set construction and
    fixed-size probes need exactly k.

    Plan shape at 100 TB: ``orderBy(hash, key).limit(k)`` — Spark plans
    TakeOrderedAndProject, a size-k heap per partition merged at the
    driver, so the corpus is scanned once and never globally sorted or
    shuffled. Like every sampler here the kept set is a function of the
    DATA (seed + key), not the partitioning: reruns, retries, different
    cluster widths, and other engines agree bit-for-bit. Smaller k is a
    prefix of larger k (nested samples)."""
    h = seeded_hash(F.col(key_col).cast("string"), seed)
    return (
        df.withColumn("__h", h)
        .orderBy(F.col("__h").asc(), F.col(key_col).asc())
        .limit(k)
        .drop("__h")
    )


def leakage_safe_split(
    df: DataFrame,
    fingerprint_col,
    boundaries_ppm: dict[str, tuple[int, int]] | None = None,
    seed: str = "split",
) -> DataFrame:
    """Train/val/test assignment keyed on a CONTENT fingerprint, not
    the row id: documents with identical (normalized) content hash to
    the same bucket, so exact duplicates can never straddle the
    train/eval boundary — the leakage mode a row-random split invites.
    (For NEAR-dup safety, pass the dup-CLUSTER id from
    ``operators.clusters`` as the fingerprint.)

    ``boundaries_ppm`` maps split name -> [lo, hi) in hash
    parts-per-million; defaults to 90/5/5. Adds a ``split`` column;
    the predicate is a narrow codegen'd map at the scan — no shuffle,
    no state, reproducible across engines and reruns."""
    if boundaries_ppm is None:
        boundaries_ppm = {
            "train": (0, 900_000),
            "val": (900_000, 950_000),
            "test": (950_000, PPM),
        }
    fp = (
        F.col(fingerprint_col)
        if isinstance(fingerprint_col, str)
        else fingerprint_col
    )
    bucket = seeded_hash(fp, seed) % PPM
    expr = F.lit(None).cast("string")
    for name, (lo, hi) in reversed(list(boundaries_ppm.items())):
        expr = F.when((bucket >= lo) & (bucket < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_exact_k(
    df: DataFrame, group_col: str, key_col: str, k: int, seed: str = "smp"
) -> DataFrame:
    """Exactly-k-per-group deterministic sample: within each group, the
    k rows with the smallest seeded key hash (key as tie-break) — the
    fixed-size-per-stratum variant of :func:`exact_k_sample` (rate-based
    :func:`stratified_hash_sample` gives binomial counts; balanced eval
    sets and per-source probes need exact counts).

    Plan shape at 100 TB: NOT a per-group window over the corpus — the
    winners come from ``operators.topk.topk_per_key`` (per-partition
    size-k heaps grouped on (group, partition), then a bounded rank over
    ≤ partitions x k rows per group), and the full rows come back via a
    semi join on the winner set (≤ groups x k rows, broadcast-able).
    Deterministic in the data, nested across k, partitioning-invariant.
    """
    from lakeflow.operators.topk import topk_per_key

    h = seeded_hash(F.col(key_col).cast("string"), seed)
    winners = topk_per_key(
        df.withColumn("__h", h), group_col, "__h", key_col, k
    ).select(group_col, key_col)
    return df.join(F.broadcast(winners), [group_col, key_col], "left_semi")


def pps_systematic_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "pps",
    n_buckets: int | None = None,
) -> DataFrame:
    """Weighted (probability-proportional-to-size) sample of ~``k`` rows
    via systematic sampling: lay every row's weight along a line in a
    seeded pseudo-random order, then keep the row containing each of the
    ``k`` evenly-spaced multiples of total_weight/k — the classic
    survey-sampling PPS scheme, here in EXACT integer arithmetic. This
    is the selection half of importance resampling: feed it DSIR weights
    (``corpus.importance_profile``), token counts (token-proportional
    corpus thinning), or any positive integer weight.

    A row is kept iff its cumulative-weight interval (cum-w, cum]
    contains a multiple of W/k, tested as
    ``(cum*k) div W > ((cum-w)*k) div W`` — floor division on
    non-negative decimals, no floats anywhere, so any engine reproduces
    the exact sample. Rows heavier than W/k are kept once (never
    duplicated), so the sample size is <= k, == k when no row exceeds
    the stride. Like every sampler here the kept set is a function of
    (seed, key, weights) only — partitioning, retries, and other
    engines agree bit-for-bit; zero-or-negative-weight rows are never
    selected.

    100 TB shape: the cumulative weight rides the distributed prefix
    sum (``prefix.bucketed_running_sum`` — per-task input is
    ~1/n_buckets of the corpus, never the whole relation through one
    sorter), the total broadcasts as one row, and selection is a
    narrow codegen filter."""
    from lakeflow.operators.prefix import bucketed_running_sum

    h = seeded_hash(F.col(key_col).cast("string"), seed)
    # non-positive weights can never be selected AND would corrupt the
    # cumulative intervals of later rows — drop them before the prefix sum
    keyed = (
        df.withColumn("__w", F.col(weight_col).cast("long"))
        .filter(F.col("__w") > 0)
        .withColumn("__h", h)
        .withColumn("__g", F.lit(0))
    )
    run = bucketed_running_sum(
        keyed,
        "__g",
        "__h",
        [key_col],
        "__w",
        out_col="__cum",
        n_buckets=n_buckets,
    )
    tot = keyed.agg(F.sum("__w").alias("__W"))
    # integral `div` (IntegralDivide) keeps the boundary test exact on
    # decimal(38) products — floor(decimal/decimal) would round through
    # a scale-6 decimal division first and can misplace a boundary once
    # cum*k outgrows its precision. The dataset aliases break the
    # shared-lineage self-join ambiguity (tot aggregates the same plan
    # run is built from, so an unqualified __W resolves twice).
    keep = F.expr(
        f"(CAST(__r.__cum AS DECIMAL(38,0)) * {int(k)}) div __t.__W >"
        f" (CAST(__r.__cum - __r.__w AS DECIMAL(38,0)) * {int(k)}) div __t.__W"
    )
    return (
        run.alias("__r")
        .crossJoin(F.broadcast(tot.alias("__t")))
        .filter(keep)
        .drop("__h", "__w", "__g", "__cum", "__W")
    )


#: cross-row products ride decimal(38,0) (Spark) / HUGEINT (DuckDB) —
#: the exact-integer idiom shared with operators/index.py and trend.py
_DEC = "decimal(38,0)"


def temperature_mix_rates(
    df: DataFrame,
    stratum_col: str,
    target_rows: int,
    n_sqrt: int = 1,
) -> DataFrame:
    """Temperature-weighted domain mixing rates (the XLM-R / mT5
    up/down-sampling rule): sample domain ``d`` with probability
    p_d ∝ n_d^alpha, alpha = (1/2)^n_sqrt — alpha < 1 flattens the
    domain distribution so head domains are down-weighted and tail
    domains (low-resource languages, rare sources) are up-weighted
    relative to their natural frequency. Returns one row per stratum:
    (stratum, n_rows, rate_ppm), where rate_ppm is the per-row keep
    rate that makes the EXPECTED kept total ``target_rows`` with the
    tempered mix: rate_d = target * n_d^(alpha-1) / sum_e n_e^alpha
    (capped at 1e6 ppm — a domain smaller than its tempered share is
    kept whole).

    Exactness: alpha is restricted to 2^-n_sqrt so the weight is
    computed by repeated IEEE-correctly-rounded sqrt (deterministic on
    every engine), quantized to integer micros per domain; the
    normalizer is then an ORDER-FREE integer sum, and the final ratio
    is one double division of exact decimal(38) products (the BM25 /
    trend idiom) — so the rates, and therefore the sampled set, are
    bit-reproducible across engines and partitionings.

    100 TB shape: one count aggregate over the corpus, a 1-row
    normalizer, and a broadcast of #domains rows — the sampling filter
    itself (see :func:`temperature_mix_sample`) is a narrow codegen'd
    predicate at the scan, exactly :func:`stratified_hash_sample` with
    computed rates."""
    if n_sqrt < 1:
        raise ValueError("n_sqrt must be >= 1 (alpha=1 is plain hash_sample)")
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_rows"))
    w = F.col("n_rows").cast("double")
    for _ in range(n_sqrt):
        w = F.sqrt(w)
    sized = counts.withColumn(
        "__s", F.floor(w * F.lit(PPM) + F.lit(0.5)).cast("long")
    )
    z = sized.agg(F.sum("__s").alias("__z"))
    num = (
        F.lit(int(target_rows)).cast(_DEC)
        * F.col("__s").cast(_DEC)
        * F.lit(PPM).cast(_DEC)
    )
    den = F.col("n_rows").cast(_DEC) * F.col("__z").cast(_DEC)
    rate = F.least(
        F.lit(PPM).cast("long"),
        F.floor(num.cast("double") / den.cast("double")).cast("long"),
    )
    return (
        sized.crossJoin(F.broadcast(z))
        .select(stratum_col, "n_rows", rate.alias("rate_ppm"))
    )


def temperature_mix_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    target_rows: int,
    n_sqrt: int = 1,
    seed: str = "tmix",
    rates: DataFrame | None = None,
) -> DataFrame:
    """Keep a temperature-mixed sample: per-stratum rates from
    :func:`temperature_mix_rates` (or supplied precomputed), applied
    as the deterministic content-hash predicate — same nested-sample
    and partitioning-invariance properties as :func:`hash_sample`."""
    if rates is None:
        rates = temperature_mix_rates(df, stratum_col, target_rows, n_sqrt)
    h = seeded_hash(F.col(key_col).cast("string"), seed)
    return (
        df.join(F.broadcast(rates.select(stratum_col, "rate_ppm")), stratum_col)
        .filter(h % PPM < F.col("rate_ppm"))
        .drop("rate_ppm")
    )

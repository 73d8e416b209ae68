"""Gap detection (timeseries.detect_gaps) and grouped OLS
(trend.grouped_ols) value checks on hand-computable data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lakeflow.operators.timeseries import detect_gaps
from lakeflow.operators.trend import grouped_ols


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_detect_gaps_finds_only_qualifying_gaps(spark):
    rows = [
        # user 1: 09:00, 09:10, 12:10 -> one 3h gap at threshold 2h
        (1, 1, _ts(9, 0)),
        (1, 2, _ts(9, 10)),
        (1, 3, _ts(12, 10)),
        # user 2: evenly 30 min apart -> no gaps
        (2, 4, _ts(8, 0)),
        (2, 5, _ts(8, 30)),
        (2, 6, _ts(9, 0)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    got = detect_gaps(df, "user_id", "ts", "event_id", 2 * 3600 * 1_000_000)
    out = got.collect()
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 1
    assert r.gap_start == _ts(9, 10) and r.gap_end == _ts(12, 10)
    assert r.gap_micros == 3 * 3600 * 1_000_000


def test_detect_gaps_ties_are_deterministic(spark):
    # two events at the SAME ts: tie_col orders them; zero-length "gap"
    # between them never qualifies
    rows = [(1, 1, _ts(9)), (1, 2, _ts(9)), (1, 3, _ts(13))]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts"])
    got = detect_gaps(df, "user_id", "ts", "event_id", 3600 * 1_000_000).collect()
    assert len(got) == 1 and got[0].gap_micros == 4 * 3600 * 1_000_000


def test_grouped_ols_exact_line(spark):
    # y = 3x + 7 exactly, in micro units: slope 3_000_000? No — y is
    # ALREADY micros here: y_micros = 3*x + 7 gives slope 3, intercept 7
    rows = [("a", x, 3 * x + 7) for x in range(10)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = grouped_ols(df, ["g"], F.col("x"), F.col("y")).collect()[0]
    assert out.n == 10
    assert out.slope_micros_per_x == 3
    assert out.intercept_micros == 7


def test_grouped_ols_degenerate_groups_null(spark):
    rows = [("one", 5, 9), ("flat", 2, 1), ("flat", 2, 5)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r.g: r for r in grouped_ols(df, ["g"], F.col("x"), F.col("y")).collect()}
    assert out["one"].slope_micros_per_x is None  # n < 2
    assert out["flat"].slope_micros_per_x is None  # zero x-variance
    assert out["flat"].n == 2


def test_grouped_ols_noisy_rounding(spark):
    # points (0,0), (1,1), (2,1): slope = 1/2, intercept = 1/6
    # floor(0.5+0.5)=1, floor(0.1666+0.5)=0
    rows = [("g", 0, 0), ("g", 1, 1), ("g", 2, 1)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = grouped_ols(df, ["g"], F.col("x"), F.col("y")).collect()[0]
    assert out.slope_micros_per_x == 1
    assert out.intercept_micros == 0


def _pps_reference(rows, k, seed="pps"):
    """Driver-side mirror of the PPS boundary math."""
    import hashlib

    def h(key):
        return int(hashlib.md5(f"{seed}|{key}".encode()).hexdigest()[:15], 16)

    ordered = sorted(((h(i), i, w) for i, w in rows if w > 0))
    total = sum(w for _, _, w in ordered)
    out, cum = [], 0
    for _, i, w in ordered:
        prev = cum
        cum += w
        if (cum * k) // total > (prev * k) // total:
            out.append(i)
    return set(out)


def test_pps_sample_matches_reference_and_is_partition_invariant(spark):
    from lakeflow.operators.sampling import pps_systematic_sample

    rows = [(i, (i * 7) % 23 + 1) for i in range(200)]
    want = _pps_reference(rows, 20)
    df = spark.createDataFrame(rows, ["id", "w"])
    got = {r.id for r in pps_systematic_sample(df, "id", "w", 20).collect()}
    assert got == want
    got13 = {
        r.id
        for r in pps_systematic_sample(df.repartition(13), "id", "w", 20).collect()
    }
    assert got13 == want


def test_pps_sample_size_and_weight_bias(spark):
    from lakeflow.operators.sampling import pps_systematic_sample

    # one heavy row (weight 1000) among 100 light rows (weight 1):
    # the heavy row must always be sampled, sample size <= k
    rows = [(i, 1) for i in range(100)] + [(999, 1000)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = {r.id for r in pps_systematic_sample(df, "id", "w", 10).collect()}
    assert 999 in got
    assert len(got) <= 10


def test_pps_sample_drops_nonpositive_weights(spark):
    from lakeflow.operators.sampling import pps_systematic_sample

    rows = [(1, 5), (2, 0), (3, -4), (4, 5)]
    df = spark.createDataFrame(rows, ["id", "w"])
    got = {r.id for r in pps_systematic_sample(df, "id", "w", 2).collect()}
    assert got <= {1, 4} and got


def test_mad_outlier_profile_hand_computed(spark):
    from pyspark.sql import functions as F

    from lakeflow.operators.profile import mad_outlier_profile

    # group "a": values 1..9 plus a wild 1000 -> median 5 (of 1..9,1000
    # interpolated: values sorted 1..9,1000, n=10, median = (5+6)/2 = 5.5
    # -> floor(+0.5) = 6); deviations |v-6|: 5,4,3,2,1,0,1,2,3,994
    # sorted: 0,1,1,2,2,3,3,4,5,994 -> MAD = (2+3)/2=2.5 -> 3
    # outliers: |v-6|*1000 > 3500*3=10500 -> only 994 -> 1
    rows = [("a", v) for v in range(1, 10)] + [("a", 1000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = mad_outlier_profile(
        df, ["g"], F.col("v"), k_milli=3500, approx=False
    ).collect()[0]
    assert out.n == 10
    assert out.median_micros == 6
    assert out.mad_micros == 3
    assert out.n_outliers == 1


def test_mad_outlier_profile_approx_close_to_exact(spark):
    from pyspark.sql import functions as F

    from lakeflow.operators.profile import mad_outlier_profile

    rows = [("g", (i * 37) % 1000) for i in range(2000)] + [("g", 10_000_000)]
    df = spark.createDataFrame(rows, ["g", "v"])
    exact = mad_outlier_profile(df, ["g"], F.col("v"), approx=False).collect()[0]
    approx = mad_outlier_profile(df, ["g"], F.col("v"), approx=True).collect()[0]
    # the sketch's rank error moves the median < 2% of the value range
    assert abs(approx.median_micros - exact.median_micros) <= 20
    assert approx.n_outliers >= 1  # the wild point is flagged either way


def test_ks_statistic_hand_computed(spark):
    # two tiny samples with a known exact KS: a = {1,2,3,4}, b = {3,4,5,6}
    # F_a steps 0.25 at each; sup|F_a-F_b| = |F_a(2)-F_b(2)| = 0.5
    from lakeflow.operators.profile import ks_statistic
    from pyspark.sql import functions as F

    rows = [(v, "a") for v in (1, 2, 3, 4)] + [(v, "b") for v in (3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "v long, side string")
    out = ks_statistic(df, "v", F.col("side") == "a").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["ks_micros"] == 500_000
    # identical distributions -> D = 0
    same = spark.createDataFrame(
        [(v, s) for v in (1, 2, 3) for s in ("a", "b")], "v long, side string"
    )
    assert ks_statistic(same, "v", F.col("side") == "a").collect()[0][
        "ks_micros"
    ] == 0
    # disjoint supports -> D = 1
    disj = spark.createDataFrame(
        [(1, "a"), (2, "a"), (10, "b"), (11, "b")], "v long, side string"
    )
    assert ks_statistic(disj, "v", F.col("side") == "a").collect()[0][
        "ks_micros"
    ] == 1_000_000


def test_ks_statistic_partitioning_invariant(spark):
    from lakeflow.operators.profile import ks_statistic
    from pyspark.sql import functions as F

    rows = [(i * 37 % 101, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "v long, side string")
    base = ks_statistic(df, "v", F.col("side") == "a").collect()
    re13 = ks_statistic(
        df.repartition(13, "side"), "v", F.col("side") == "a"
    ).collect()
    assert base == re13


def test_ks_statistic_empty_side_raises(spark):
    # ADVICE r7: KS is undefined when one sample is empty; the plan
    # must fail loudly (assert_true), never emit a silent NULL row
    from py4j.protocol import Py4JJavaError

    from lakeflow.operators.profile import ks_statistic

    only_a = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a")], "v long, side string"
    )
    try:
        ks_statistic(only_a, "v", F.col("side") == "a").collect()
        raise AssertionError("expected the empty-b-side KS job to fail")
    except Exception as e:  # Spark wraps assert_true in a job failure
        assert "ks_statistic" in str(e) or isinstance(e, Py4JJavaError)
    # a fully empty input stays an EMPTY result (no row to assert on):
    # there is no distribution pair to test, and no NULL leaks out
    empty = spark.createDataFrame([], "v long, side string")
    assert ks_statistic(empty, "v", F.col("side") == "a").collect() == []


def test_chi2_distance_hand_computed(spark):
    # a = {0:2, 1:2}, b = {0:1, 1:3}: p = (.5,.5), q = (.25,.75)
    # term0 = 250000^2 // 750000 = 83333; term1 = 250000^2 // 1250000
    # = 50000 -> chi2_micros = 133333
    from lakeflow.operators.profile import chi2_distance

    rows = [(0, "a"), (0, "a"), (1, "a"), (1, "a")] + [
        (0, "b"),
        (1, "b"),
        (1, "b"),
        (1, "b"),
    ]
    df = spark.createDataFrame(rows, "bin long, side string")
    out = chi2_distance(df, "bin", F.col("side") == "a").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["chi2_micros"] == 133_333
    # identical distributions -> 0
    same = spark.createDataFrame(
        [(v, s) for v in (1, 2, 3) for s in ("a", "b")], "bin long, side string"
    )
    assert chi2_distance(same, "bin", F.col("side") == "a").collect()[0][
        "chi2_micros"
    ] == 0
    # disjoint bins -> the distance's maximum, 2.0
    disj = spark.createDataFrame(
        [(1, "a"), (1, "a"), (9, "b"), (9, "b")], "bin long, side string"
    )
    assert chi2_distance(disj, "bin", F.col("side") == "a").collect()[0][
        "chi2_micros"
    ] == 2_000_000


def test_chi2_distance_partitioning_invariant(spark):
    from lakeflow.operators.profile import chi2_distance

    rows = [(i * 37 % 11, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "bin long, side string")
    base = chi2_distance(df, "bin", F.col("side") == "a").collect()
    re13 = chi2_distance(
        df.repartition(13, "side"), "bin", F.col("side") == "a"
    ).collect()
    assert base == re13


def test_chi2_distance_empty_side_raises(spark):
    # same contract as KS: undefined on an empty side -> loud failure,
    # never a silent NULL in a drift dashboard
    from py4j.protocol import Py4JJavaError

    from lakeflow.operators.profile import chi2_distance

    only_a = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a")], "bin long, side string"
    )
    try:
        chi2_distance(only_a, "bin", F.col("side") == "a").collect()
        raise AssertionError("expected the empty-b-side chi2 job to fail")
    except Exception as e:
        assert "chi2_distance" in str(e) or isinstance(e, Py4JJavaError)
    empty = spark.createDataFrame([], "bin long, side string")
    assert chi2_distance(empty, "bin", F.col("side") == "a").collect() == []


def test_grouped_ks_equals_per_group_single(spark):
    # each group's row == ks_statistic run on that group alone
    from lakeflow.operators.profile import grouped_ks_statistic, ks_statistic

    rows = (
        [("g1", v, "a") for v in (1, 2, 3, 4)]
        + [("g1", v, "b") for v in (3, 4, 5, 6)]
        + [("g2", v, "a") for v in (1, 1, 2)]
        + [("g2", v, "b") for v in (9, 9)]
    )
    df = spark.createDataFrame(rows, "g string, v long, side string")
    grouped = {
        r["g"]: (r["n_a"], r["n_b"], r["ks_micros"])
        for r in grouped_ks_statistic(df, "g", "v", F.col("side") == "a").collect()
    }
    for g in ("g1", "g2"):
        single = ks_statistic(
            df.filter(F.col("g") == g), "v", F.col("side") == "a"
        ).collect()[0]
        assert grouped[g] == (single["n_a"], single["n_b"], single["ks_micros"])
    assert grouped["g1"][2] == 500_000 and grouped["g2"][2] == 1_000_000


def test_grouped_ks_drops_one_sided_groups(spark):
    # a group with no baseline rows must DROP (undefined), never fail
    # the whole fleet monitor and never emit a NULL row
    from lakeflow.operators.profile import grouped_ks_statistic

    rows = [("ok", 1, "a"), ("ok", 2, "b"), ("newsrc", 5, "b"), ("newsrc", 6, "b")]
    df = spark.createDataFrame(rows, "g string, v long, side string")
    out = grouped_ks_statistic(df, "g", "v", F.col("side") == "a").collect()
    assert [r["g"] for r in out] == ["ok"]
    assert out[0]["ks_micros"] is not None


def test_grouped_ks_partitioning_invariant(spark):
    from lakeflow.operators.profile import grouped_ks_statistic

    rows = [
        (f"g{i % 4}", i * 37 % 101, "a" if i % 3 else "b") for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, v long, side string")
    base = sorted(
        map(tuple, grouped_ks_statistic(df, "g", "v", F.col("side") == "a").collect())
    )
    re13 = sorted(
        map(
            tuple,
            grouped_ks_statistic(
                df.repartition(13, "v"), "g", "v", F.col("side") == "a"
            ).collect(),
        )
    )
    assert base == re13


# --------------------------------------------- quantiles from counts


def test_quantiles_from_value_counts_matches_percentile_disc(spark):
    # percentile_disc semantics: smallest v with cum >= ceil(p * N)
    import math

    from pyspark.sql import functions as F

    from lakeflow.operators.profile import quantiles_from_value_counts

    vals = [1, 1, 2, 3, 3, 3, 7, 9, 9, 50]  # N = 10, dup-heavy
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    counts = df.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    probs = [0.1, 0.25, 0.5, 0.9, 1.0]
    got = {
        r["p_micros"]: (r["value"], r["n_total"])
        for r in quantiles_from_value_counts(counts, "v", "n", probs).collect()
    }
    sv = sorted(vals)
    for p in probs:
        pm = int(p * 1_000_000 + 0.5)
        want = sv[math.ceil(p * len(sv)) - 1]
        assert got[pm] == (want, 10), (p, got[pm])


def test_quantiles_from_value_counts_grouped(spark):
    import math

    from pyspark.sql import functions as F

    from lakeflow.operators.profile import quantiles_from_value_counts

    rows = [("g0", v) for v in range(1, 101)] + [("g1", v * v) for v in range(1, 8)]
    df = spark.createDataFrame(rows, "g string, v long")
    counts = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n"))
    got = {
        (r["g"], r["p_micros"]): (r["value"], r["n_total"])
        for r in quantiles_from_value_counts(
            counts, "v", "n", [0.5, 0.99], "g"
        ).collect()
    }
    for g, vals in [("g0", list(range(1, 101))), ("g1", [v * v for v in range(1, 8)])]:
        for p in [0.5, 0.99]:
            pm = int(p * 1_000_000 + 0.5)
            want = sorted(vals)[math.ceil(p * len(vals)) - 1]
            assert got[(g, pm)] == (want, len(vals))


def test_quantiles_partitioning_invariance(spark):
    from pyspark.sql import functions as F

    from lakeflow.operators.profile import quantiles_from_value_counts

    df = spark.createDataFrame([(i % 37,) for i in range(500)], "v long")
    counts = df.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
    a = sorted(
        map(
            tuple,
            quantiles_from_value_counts(counts, "v", "n", [0.5, 0.9]).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            quantiles_from_value_counts(
                counts.repartition(13), "v", "n", [0.5, 0.9]
            ).collect(),
        )
    )
    assert a == b


def test_grouped_chi2_matches_single_group(spark):
    # per-group chi2 == chi2_distance run on each group's rows alone
    from pyspark.sql import functions as F

    from lakeflow.operators.profile import chi2_distance, grouped_chi2_distance

    rows = []
    for g, vals in [("a", [(0, 1)] * 8 + [(1, 0)] * 6 + [(2, 1)] * 3),
                    ("b", [(0, 0)] * 5 + [(3, 1)] * 5)]:
        rows += [(g, b, ia) for b, ia in vals]
    df = spark.createDataFrame(rows, "g string, bin long, ia int")
    got = {
        r["g"]: (r["n_a"], r["n_b"], r["chi2_micros"])
        for r in grouped_chi2_distance(df, "g", "bin", F.col("ia") == 1).collect()
    }
    for g in ["a", "b"]:
        solo = chi2_distance(
            df.filter(F.col("g") == g), "bin", F.col("ia") == 1
        ).collect()[0]
        assert got[g] == (solo["n_a"], solo["n_b"], solo["chi2_micros"])


def test_grouped_chi2_drops_one_sided_groups(spark):
    from pyspark.sql import functions as F

    from lakeflow.operators.profile import grouped_chi2_distance

    rows = [("ok", 0, 1), ("ok", 1, 0), ("onlya", 0, 1), ("onlyb", 2, 0)]
    df = spark.createDataFrame(rows, "g string, bin long, ia int")
    got = grouped_chi2_distance(df, "g", "bin", F.col("ia") == 1).collect()
    assert [r["g"] for r in got] == ["ok"]


def test_grouped_chi2_partitioning_invariance(spark):
    from pyspark.sql import functions as F

    from lakeflow.operators.profile import grouped_chi2_distance

    rows = [(f"g{i % 4}", i % 7, i % 3 == 0) for i in range(600)]
    df = spark.createDataFrame(rows, "g string, bin long, ia boolean")
    a = sorted(map(tuple, grouped_chi2_distance(df, "g", "bin", F.col("ia")).collect()))
    b = sorted(
        map(
            tuple,
            grouped_chi2_distance(df.repartition(17), "g", "bin", F.col("ia")).collect(),
        )
    )
    assert a == b


def test_occupancy_staleness_stable_vs_shifted(spark):
    # r10: frozen-partitioning occupancy drift. A batch occupying the
    # buckets with the SAME distribution as the stored corpus must not
    # trip the rebuild trigger; a batch concentrated in one bucket must.
    from lakeflow.operators.profile import occupancy_staleness

    stored = spark.createDataFrame(
        [(i % 8,) for i in range(800)], "band long"
    )
    stable = spark.createDataFrame([(i % 8,) for i in range(160)], "band long")
    row = occupancy_staleness(stored, stable, "band").collect()[0]
    assert row["n_stored"] == 800 and row["n_batch"] == 160
    assert row["chi2_micros"] == 0 and row["rebuild"] == 0

    hot = spark.createDataFrame([(3,)] * 160, "band long")
    row = occupancy_staleness(stored, hot, "band").collect()[0]
    assert row["chi2_micros"] > 100_000 and row["rebuild"] == 1

    # a bucket seen ONLY in the batch (new hot region) still works —
    # the full-outer occupancy join zero-fills the stored side
    novel = spark.createDataFrame([(99,)] * 160, "band long")
    row = occupancy_staleness(stored, novel, "band").collect()[0]
    assert row["rebuild"] == 1


def test_occupancy_staleness_ivf_cells_application(spark):
    # the semantic/IVF-cell application the COVERAGE row promises: cell
    # assignments against FROZEN centroids, stored occupancy vs a batch
    # whose vectors rotated into a different region -> trigger fires;
    # a batch drawn from the stored distribution does not.
    import random

    from lakeflow.operators.profile import occupancy_staleness
    from lakeflow.operators.similarity import ivf_assign, ivf_centroids

    rng = random.Random(7)

    def vec(center):
        return [round(center[j] + rng.uniform(-0.1, 0.1), 3) for j in range(8)]

    c1 = [1.0] * 8
    c2 = [-1.0] * 8
    stored_rows = [(i, vec(c1 if i % 2 else c2)) for i in range(200)]
    stored = spark.createDataFrame(
        stored_rows, "vec_id long, embedding array<double>"
    )
    cents = ivf_centroids(stored, n_cells=4)
    stored_cells = ivf_assign(stored, cents).select("cell")

    stable = spark.createDataFrame(
        [(1000 + i, vec(c1 if i % 2 else c2)) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    row = occupancy_staleness(
        stored_cells, ivf_assign(stable, cents).select("cell"), "cell"
    ).collect()[0]
    assert row["rebuild"] == 0, row

    # drifted: every new vector in ONE region (the c1 side only)
    drifted = spark.createDataFrame(
        [(2000 + i, vec(c1)) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    row = occupancy_staleness(
        stored_cells, ivf_assign(drifted, cents).select("cell"), "cell"
    ).collect()[0]
    assert row["chi2_micros"] > 100_000 and row["rebuild"] == 1, row

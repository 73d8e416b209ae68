"""asof_join payload semantics: match detection and payload atomicity
must not depend on payload-column nullability (the struct-carry fix)."""

from __future__ import annotations

from pyspark.sql import Row

from lakeflow.operators.joins import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [Row(k=1, lts=10), Row(k=1, lts=25), Row(k=2, lts=10)]
    )
    # right row at ts=20 has a legitimately NULL first payload column —
    # it must still match left rows with lts >= 20
    right = spark.createDataFrame(
        [
            Row(k=1, rts=5, a="a5", b="b5"),
            Row(k=1, rts=20, a=None, b="b20"),
            Row(k=2, rts=50, a="a50", b="b50"),
        ]
    )
    return left, right


def test_null_first_payload_column_still_matches(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "lts", "rts", ["a", "b"], how="inner")
    rows = {(r["k"], r["lts"]): (r["a"], r["b"]) for r in out.collect()}
    # k=1, lts=25: latest right at rts=20 — a is NULL but the row matches
    assert rows[(1, 25)] == (None, "b20")
    # k=1, lts=10: right at rts=5
    assert rows[(1, 10)] == ("a5", "b5")
    # k=2, lts=10: no right row at or before — dropped in inner mode
    assert (2, 10) not in rows


def test_payload_is_atomic_not_stitched(spark):
    # per-column last(ignorenulls) would stitch a="a5" (from rts=5) with
    # b="b20" (from rts=20); the payload must come from ONE right row
    left, right = _frames(spark)
    out = asof_join(left, right, "k", "lts", "rts", ["a", "b"], how="left")
    rows = {(r["k"], r["lts"]): (r["a"], r["b"]) for r in out.collect()}
    assert rows[(1, 25)] == (None, "b20")  # NOT ("a5", "b20")
    assert rows[(2, 10)] == (None, None)  # unmatched left row kept in left mode
    assert len(rows) == 3


def test_resample_locf_semantics(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from lakeflow.operators.timeseries import resample_locf

    def ts(s):
        return datetime.fromisoformat(s)

    df = spark.createDataFrame(
        [
            # key "a": obs at 00:30 and 02:00; hourly grid from 00:00
            Row(k="a", t=ts("2024-01-01T00:30:00"), v=10),
            Row(k="a", t=ts("2024-01-01T02:00:00"), v=20),
            # same-instant duplicate: max wins deterministically
            Row(k="a", t=ts("2024-01-01T02:00:00"), v=15),
            # key "b": single obs exactly on a grid instant
            Row(k="b", t=ts("2024-01-01T05:00:00"), v=7),
        ]
    )
    out = {
        (r["k"], r["grid_ts"].isoformat(), r["val"])
        for r in resample_locf(df, "k", "t", "v", 3600).collect()
    }
    assert out == {
        # 00:00 precedes the first observation: leading gap stays null
        ("a", "2024-01-01T00:00:00", None),
        ("a", "2024-01-01T01:00:00", 10),  # 00:30 obs carried forward
        ("a", "2024-01-01T02:00:00", 20),  # same-instant obs included, max of dup
        ("b", "2024-01-01T05:00:00", 7),
    }


def test_resample_interpolate_semantics(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from lakeflow.operators.timeseries import resample_interpolate

    def ts(s):
        return datetime.fromisoformat(s)

    df = spark.createDataFrame(
        [
            Row(k="a", t=ts("2024-01-01T01:00:00"), v=100),
            Row(k="a", t=ts("2024-01-01T04:00:00"), v=400),
        ]
    )
    out = {
        (r["grid_ts"].isoformat(), r["val"])
        for r in resample_interpolate(df, "k", "t", "v", 3600).collect()
    }
    assert out == {
        ("2024-01-01T01:00:00", 100),  # exactly on the first obs
        ("2024-01-01T02:00:00", 200),  # 1/3 of the way 100 -> 400
        ("2024-01-01T03:00:00", 300),
        ("2024-01-01T04:00:00", 400),
    }


def test_resample_interpolate_truncation_and_leading_gap(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from lakeflow.operators.timeseries import resample_interpolate

    def ts(s):
        return datetime.fromisoformat(s)

    # descending segment with non-integer slope: trunc toward zero
    df = spark.createDataFrame(
        [
            Row(k="a", t=ts("2024-01-01T00:30:00"), v=10),
            Row(k="a", t=ts("2024-01-01T02:30:00"), v=3),
        ]
    )
    out = {
        (r["grid_ts"].isoformat(), r["val"])
        for r in resample_interpolate(df, "k", "t", "v", 3600).collect()
    }
    # grid 00:00 precedes the first obs -> null; 01:00 is 30/120 of the
    # way down 10->3: 10 + trunc(-7*1800/7200) = 10 + trunc(-1.75) = 9
    # (toward-zero truncation, not floor); 02:00 = 10 + trunc(-5.25) = 5
    assert out == {
        ("2024-01-01T00:00:00", None),
        ("2024-01-01T01:00:00", 9),
        ("2024-01-01T02:00:00", 5),
    }


def test_resample_grid_chunking_boundary(spark, monkeypatch):
    # force multi-chunk grids: results identical across chunk boundaries
    from datetime import datetime

    from pyspark.sql import Row

    import lakeflow.operators.timeseries as T

    monkeypatch.setattr(T, "_GRID_CHUNK", 4)
    df = spark.createDataFrame(
        [
            Row(k="a", t=datetime.fromisoformat("2024-01-01T00:00:00"), v=0),
            Row(k="a", t=datetime.fromisoformat("2024-01-01T10:00:00"), v=10),
        ]
    )
    out = sorted(
        (r["grid_ts"].hour, r["val"])
        for r in T.resample_interpolate(df, "k", "t", "v", 3600).collect()
    )
    assert out == [(h, h) for h in range(11)]


def test_interval_join_matches_theta(spark):
    import datetime

    from pyspark.sql import Row

    from lakeflow.operators.joins import interval_join

    base = datetime.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [Row(k="a", pts_ts=base + datetime.timedelta(minutes=m), pid=m)
         for m in range(0, 600, 7)]
    )
    ivs = spark.createDataFrame(
        [
            Row(k="a", s=base, e=base + datetime.timedelta(hours=3), iid=1),
            Row(k="a", s=base + datetime.timedelta(minutes=90),
                e=base + datetime.timedelta(minutes=100), iid=2),
            Row(k="b", s=base, e=base + datetime.timedelta(hours=9), iid=3),
        ]
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "pts_ts", "s", "e", keys=["k"]).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in pts.join(
            ivs, (pts["k"] == ivs["k"]) & (pts["pts_ts"] >= ivs["s"]) & (pts["pts_ts"] <= ivs["e"])
        ).collect()
    )
    assert got == naive and len(got) == len(set(got))  # exact + no dup pairs


def test_interval_join_plan_is_equi(spark):
    import datetime

    from pyspark.sql import Row

    from lakeflow.operators.joins import interval_join

    base = datetime.datetime(2024, 1, 1)
    pts = spark.createDataFrame([Row(k="a", pts_ts=base, pid=1)])
    ivs = spark.createDataFrame(
        [Row(k="a", s=base, e=base + datetime.timedelta(hours=2), iid=1)]
    )
    plan = (
        interval_join(pts, ivs, "pts_ts", "s", "e", keys=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_rejects_column_collisions(spark):
    import datetime

    import pytest
    from pyspark.sql import Row

    from lakeflow.operators.joins import interval_join

    base = datetime.datetime(2024, 1, 1)
    pts = spark.createDataFrame([Row(k="a", ts=base, x=1)])
    ivs = spark.createDataFrame([Row(k="a", s=base, e=base, x=2)])
    with pytest.raises(ValueError, match="colliding"):
        interval_join(pts, ivs, "ts", "s", "e", keys=["k"])

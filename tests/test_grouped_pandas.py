"""applyInPandas grouped logic vs the pure-window equivalent."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.operators.grouped_pandas import per_user_gap_stats

SF = "/root/testdata/sf0.001"


def test_gap_stats_match_window_implementation(spark):
    ev = load_table(spark, SF, "events")
    grouped = {
        r["user_id"]: (r["n_events"], r["max_gap_us"])
        for r in per_user_gap_stats(ev).collect()
    }

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap")
    )
    windowed = {
        r["user_id"]: (r["n"], r["mx"])
        for r in gaps.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("gap").alias("mx"))
        .collect()
    }
    assert set(grouped) == set(windowed)
    for uid, (n, mx) in windowed.items():
        assert grouped[uid][0] == n
        assert grouped[uid][1] == (mx or 0)

"""Grouped custom logic via applyInPandas (SURVEY §2.11).

The pattern for per-key imperative computations that built-ins cannot
express: Spark shuffles on the key, each group arrives as ONE pandas
frame (Arrow transfer), the function runs vectorized per group. The
demo computes per-user inter-event gap statistics — expressible with
window functions too, which is exactly why tests can assert parity;
real uses are model scoring, curve fitting, per-entity state machines.

Scale cautions baked into the design: a group must fit in one
executor's memory (watch the hottest key — salt or pre-aggregate if a
single key can exceed it), and the shuffle key is a scalar id.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


GAP_SCHEMA = (
    "user_id long, n_events long, mean_gap_us long, max_gap_us long"
)


def per_user_gap_stats(events: DataFrame) -> DataFrame:
    """Inter-event gap statistics per user (microseconds, exact ints)."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        us = pdf["ts"].astype("int64")  # ns since epoch
        gaps = (us.diff().dropna() // 1000).astype("int64")  # -> µs
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "mean_gap_us": [int(gaps.mean()) if len(gaps) else 0],
                "max_gap_us": [int(gaps.max()) if len(gaps) else 0],
            }
        )

    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandas(stats, GAP_SCHEMA)
    )

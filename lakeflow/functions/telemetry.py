"""Observed metrics (SURVEY §2.6 A3).

The reference prints ``df.shape[0]`` between steps — a second pass per
count in pandas, and a full re-scan per count in naive Spark. Spark's
``observe`` collects metrics DURING the single execution pass: zero
extra scans, delivered on the driver after the action completes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_observed_count(df: DataFrame, name: str) -> tuple[DataFrame, Observation]:
    """Attach a row-count (and null-free-count-friendly) observation.
    Read ``observation.get`` after an action on the returned frame."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs

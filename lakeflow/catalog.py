"""Table catalog over the lake directory layout.

One parquet dataset per table under a scale-factor directory
(``/root/testdata/sf0.01/lineitem.parquet`` …). On a production lake the
same API points at ``s3a://bucket/silver/<table>/`` partitioned
directories — `spark.read.parquet` handles both identically (SURVEY §1.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Column pruning + predicate pushdown reach the
    parquet scan because this is a plain DSv2 file source.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright; it is read as a raw nanosecond
    long (``nanosAsLong``, a runtime-settable SQL conf so it also works
    on externally-provided sessions) and normalized to TIMESTAMP_NTZ
    microseconds — the same flavor the other tables load as.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # only when the file really is ns-longs — a re-materialized copy
        # already carries a proper timestamp column
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

"""JDBC sink (SURVEY §2.2 K6-K8 parity boundary).

The reference hand-rendered INSERT statements in 5-row chunks with
manual retry (`utils/sql_utils.py:48-115`) and staged CSVs for Redshift
COPY (:118-140). Against a real warehouse the Spark JDBC writer (or the
warehouse's Spark connector, which does COPY-via-staging internally) is
the typed, partition-parallel replacement: every executor writes its
partition in ``batchsize`` batches, retries ride on Spark task retry.

No JDBC driver/database ships in this environment, so `write_jdbc`
executes only when a URL is supplied by the caller; `jdbc_writer` (the
configuration step) is fully testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.readwriter import DataFrameWriter


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    **properties: str,
) -> DataFrameWriter:
    """Configured JDBC writer. ``batchsize`` replaces the reference's
    chunk=5 (:91 — 2000x larger batches); ``num_partitions`` caps
    concurrent connections against the warehouse."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    for k, v in properties.items():
        writer = writer.option(k, v)
    return writer


def write_jdbc(df: DataFrame, url: str, table: str, **kwargs) -> None:
    jdbc_writer(df, url, table, **kwargs).save()

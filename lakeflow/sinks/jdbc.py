"""JDBC sink + source (SURVEY §2.2 K6-K8 parity boundary).

The reference hand-rendered INSERT statements in 5-row chunks with
manual retry (`utils/sql_utils.py:48-115`) and staged CSVs for Redshift
COPY (:118-140). Against a real warehouse the Spark JDBC writer (or the
warehouse's Spark connector, which does COPY-via-staging internally) is
the typed, partition-parallel replacement: every executor writes its
partition in ``batchsize`` batches, retries ride on Spark task retry.

Integration coverage: no warehouse runs in this sandbox, but Spark
ships the embedded Derby JDBC driver on its default classpath (it backs
the Hive metastore), so the round trip — typed write, mode semantics,
partition-parallel read, filter pushdown into the remote query — is
exercised for real against a file-backed Derby database in
``tests/test_udtf_jdbc.py``; the same code path serves any warehouse
once a URL/driver is supplied.

Reads mirror the writer: ``read_jdbc`` opens ``num_partitions``
parallel cursors by range-slicing ``partition_column`` (the standard
Spark JDBC parallel-scan contract) so a big warehouse extract is not
funneled through a single connection, and Catalyst pushes filters into
the generated remote ``WHERE`` clause.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 1,
    fetchsize: int = 10_000,
    **properties: str,
) -> DataFrame:
    """Partition-parallel JDBC scan: with ``partition_column`` (a
    numeric/date column) the range [lower_bound, upper_bound) is sliced
    into ``num_partitions`` concurrent cursors — the warehouse extract
    runs wide instead of through one connection. Bounds only shape the
    slicing; rows outside them are still read (Spark's contract), so a
    stale bound loses parallelism, never data. Filters applied to the
    returned DataFrame are pushed into the remote ``WHERE`` clause by
    Catalyst (visible as ``PushedFilters`` on the JDBC relation scan)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()

"""Manifest-committed table: atomic visibility, snapshot isolation,
optimistic concurrency, time travel, vacuum retention."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeflow.sinks.txtable import (
    ConcurrentCommitError,
    append_table,
    current_version,
    delete_where,
    history,
    merge_upsert_table,
    read_table,
    vacuum_table,
    write_table,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def test_write_append_read_latest(spark, tmp_path):
    path = str(tmp_path / "t")
    assert write_table(spark, _df(spark, 0, 100), path) == 1
    assert append_table(spark, _df(spark, 100, 150), path) == 2
    assert read_table(spark, path).count() == 150
    assert current_version(path) == 2
    assert [h["op"] for h in history(path)] == ["overwrite", "append"]


def test_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(spark, _df(spark, 0, 10), path)
    append_table(spark, _df(spark, 10, 30), path)
    assert read_table(spark, path, version=1).count() == 10
    assert read_table(spark, path, version=2).count() == 30


def test_snapshot_isolation_across_overwrite(spark, tmp_path):
    # a reader pinned to v1 survives a full overwrite commit: its files
    # are immutable and still on disk — no rename window, ever
    path = str(tmp_path / "t")
    write_table(spark, _df(spark, 0, 50), path)
    snapshot = read_table(spark, path)  # lazy plan over v1's files
    write_table(spark, _df(spark, 0, 7), path)  # v2 replaces contents
    assert snapshot.count() == 50  # v1 still fully readable
    assert read_table(spark, path).count() == 7


def test_concurrent_commit_conflicts_cleanly(spark, tmp_path):
    import os

    from lakeflow.sinks.txtable import _publish, _write_data_files

    path = str(tmp_path / "t")
    write_table(spark, _df(spark, 0, 10), path)
    # writer A stages and publishes v2 first
    a_files = _write_data_files(_df(spark, 10, 20), path)
    _publish(path, 1, a_files, "append")
    # writer B staged against v1 too: publish must conflict, not clobber
    with pytest.raises(ConcurrentCommitError):
        b_files = _write_data_files(_df(spark, 20, 30), path)
        try:
            _publish(path, 1, b_files, "append")
        finally:
            for rel in b_files:
                os.remove(os.path.join(path, rel))
    # latest is exactly what A published (a_files); B left no trace
    assert read_table(spark, path).count() == 10


def test_merge_upsert_and_delete(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(spark, _df(spark, 0, 10), path)
    batch = spark.createDataFrame(
        [(5, 999), (50, 100)], "k long, v long"
    )
    merge_upsert_table(spark, batch, path, ["k"])
    got = {r["k"]: r["v"] for r in read_table(spark, path).collect()}
    assert got[5] == 999 and got[50] == 100 and len(got) == 11
    delete_where(spark, path, F.col("k") >= 50)
    assert read_table(spark, path).count() == 10
    # nothing in the history was mutated: v2 still shows the upsert
    assert {r["k"]: r["v"] for r in read_table(spark, path, 2).collect()}[5] == 999


def test_vacuum_drops_unreferenced_files_only(spark, tmp_path):
    path = str(tmp_path / "t")
    write_table(spark, _df(spark, 0, 10), path)
    write_table(spark, _df(spark, 0, 20), path)
    write_table(spark, _df(spark, 0, 5), path)
    removed = vacuum_table(path, keep_last=2, min_age_seconds=0)
    assert removed > 0
    # retained versions still read fine; vacuumed one is gone
    assert read_table(spark, path, 3).count() == 5
    assert read_table(spark, path, 2).count() == 20
    with pytest.raises(Exception):
        read_table(spark, path, 1).count()


def test_upsert_null_key_replaces_not_duplicates(spark, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    write_table(
        spark,
        spark.createDataFrame([(None, 1), (5, 50)], "k long, v long"),
        path,
    )
    for v in (2, 3):
        merge_upsert_table(
            spark,
            spark.createDataFrame([(None, v)], "k long, v long"),
            path,
            ["k"],
        )
    rows = sorted(
        ((r["k"], r["v"]) for r in read_table(spark, path).collect()),
        key=lambda t: (t[0] is not None, t[0]),
    )
    assert rows == [(None, 3), (5, 50)]  # replaced, never accumulated


def test_vacuum_spares_young_unreferenced_files(spark, tmp_path):
    # in-flight-commit guard: freshly staged (unpublished) files must
    # survive a concurrent vacuum
    import os

    from lakeflow.sinks.txtable import _publish, _write_data_files

    path = str(tmp_path / "t")
    write_table(spark, _df(spark, 0, 10), path)
    staged = _write_data_files(_df(spark, 10, 20), path)  # not yet published
    assert vacuum_table(path, keep_last=1, min_age_seconds=3600) == 0
    for rel in staged:
        assert os.path.exists(os.path.join(path, rel))
    _publish(path, 1, staged, "append")  # the commit still lands intact
    assert read_table(spark, path).count() == 10

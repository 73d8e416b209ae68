"""CLI smoke tests for the maintenance/export subcommands (argv-level,
through main())."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeflow.cli import main


def test_cli_compact(spark, tmp_path, capsys):
    path = str(tmp_path / "t")
    spark.range(1000).repartition(8).write.parquet(path)
    assert main(["compact", path]) == 0
    assert "1 file(s)" in capsys.readouterr().out
    assert spark.read.parquet(path).count() == 1000


def test_cli_table_history_vacuum_show(spark, tmp_path, capsys):
    from lakeflow.sinks.txtable import write_table

    path = str(tmp_path / "tx")
    write_table(spark, spark.range(10).select(F.col("id").alias("k")), path)
    write_table(spark, spark.range(5).select(F.col("id").alias("k")), path)
    assert main(["table", "history", path]) == 0
    out = capsys.readouterr().out
    assert "v1" in out and "v2" in out and "overwrite" in out
    assert main(["table", "show", path, "--version", "1", "--limit", "3"]) == 0
    assert main(["table", "vacuum", path, "--keep-last", "1", "--min-age", "0"]) == 0
    assert "vacuumed" in capsys.readouterr().out


def test_cli_shard_export(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.range(300).select(F.col("id").alias("doc_id")).write.parquet(src)
    assert (
        main(
            [
                "shard-export",
                "--input", src,
                "--output", out,
                "--key", "doc_id",
                "--n-shards", "3",
            ]
        )
        == 0
    )
    txt = capsys.readouterr().out
    assert txt.count("shard=") == 3
    assert spark.read.parquet(out).count() == 300

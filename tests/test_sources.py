"""Source-reader tests over reference-shaped fixtures (SURVEY §2.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeflow.operators.flatten import flatten
from lakeflow.sources import (
    read_double_encoded_ndjson,
    read_files,
    read_json_doc,
    read_kafka_topic_dump,
    read_mongo_export,
)
from tests import fixtures


@pytest.fixture(scope="module")
def froot(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixtures")
    return {
        "mailgun": fixtures.build_mailgun(str(root)),
        "iterable": fixtures.build_iterable(str(root)),
        "mongo": fixtures.build_mongo(str(root)),
        "kafka": fixtures.build_kafka(str(root)),
        "colors": fixtures.build_colors(str(root)),
    }


def test_double_encoded_ndjson(spark, froot):
    df = read_double_encoded_ndjson(spark, froot["mailgun"])
    assert df.count() == 3 * 2 * 25
    assert "tags" in df.columns and "delivery-status" in df.columns
    # drifted files: campaigns/flags appear as nullable superset columns
    assert "campaigns" in df.columns


def test_partition_discovery(spark, froot):
    # Hive-style partition=N path segments become a column (S6/SURVEY §1.1)
    df = spark.read.format("text").load(froot["mailgun"])
    assert "partition" in df.columns
    assert df.select("partition").distinct().count() == 3


def test_path_glob_filter(spark, froot):
    only0 = read_files(
        spark, froot["mailgun"], fmt="text", glob="mailgun_0_*.json", recursive=True
    )
    alln = read_files(spark, froot["mailgun"], fmt="text", recursive=True)
    assert only0.count() == 2 * 25
    assert alln.count() == 3 * 2 * 25


def test_modified_after_prunes_everything(spark, froot):
    df = read_files(
        spark,
        froot["mailgun"],
        fmt="text",
        recursive=True,
        modified_after="2099-01-01T00:00:00",
    )
    assert df.count() == 0


def test_json_doc_colors(spark, froot):
    """B5 colors pipeline (`s3_to_silver.py:101-112`,
    `s3_to_silver_prov.py:71-80`): multiLine doc -> explode -> flatten
    code -> targeted rename rgba->code_rgba."""
    doc = read_json_doc(spark, froot["colors"])
    colors = doc.select(F.explode("colors").alias("c")).select("c.*")
    flat = flatten(colors, ["code"]).withColumnRenamed("rgba", "code_rgba")
    rows = flat.orderBy("color").collect()
    assert len(rows) == 5
    assert rows[0]["color"] == "black" and rows[0]["code_rgba"] == [255, 255, 255, 1]
    assert "hex" in flat.columns
    # null type passes through (None -> SQL null)
    assert [r["type"] for r in rows if r["color"] == "white"] == [None]


def test_kafka_envelope_drop(spark, froot):
    df = read_kafka_topic_dump(spark, froot["kafka"]["applications"])
    assert "topic" not in df.columns and "offset" not in df.columns
    assert "cardApplicationId" in df.columns

    kept = read_kafka_topic_dump(
        spark, froot["kafka"]["applications"], keep_envelope=True
    )
    assert "topic" in kept.columns


def test_mongo_export_parse(spark, froot):
    df = read_mongo_export(spark, froot["mongo"])
    assert "localDateTime.$date" in df.columns
    assert "recipient.userId" in df.columns
    assert df.count() == 3 * 40
    # notificationData stays a JSON string for downstream path extraction
    assert dict(df.dtypes)["notificationData"] == "string"


def test_double_encoded_corrupt_observability(spark, froot, tmp_path):
    import json as _json
    import os as _os

    from pyspark.sql import Observation

    d = str(tmp_path / "bad" / "partition=0")
    _os.makedirs(d)
    with open(_os.path.join(d, "mailgun_x.json"), "w") as fh:
        fh.write(_json.dumps(_json.dumps({"a": 1})) + "\n")
        fh.write("NOT JSON AT ALL\n")
        fh.write(_json.dumps(_json.dumps({"a": 2})) + "\n")
    base = str(tmp_path / "bad")

    obs = Observation("corrupt")
    df = read_double_encoded_ndjson(spark, base, corrupt_observation=obs)
    assert df.count() == 2
    assert obs.get == {"corrupt_lines": 1, "total_lines": 3}

    # fail mode surfaces the offending line
    with pytest.raises(Exception) as e:
        read_double_encoded_ndjson(spark, base, on_corrupt="fail").count()
    assert "NOT JSON AT ALL" in str(e.value)

    with pytest.raises(ValueError):
        read_double_encoded_ndjson(spark, base, on_corrupt="explode")


def test_fanout_scan_conditions(spark, tmp_path):
    # r11 optimization round: fanout_scan fans out ONLY big-enough
    # under-parallel local file scans — in-memory relations and tiny
    # files pass through untouched, and results are unchanged
    from lakeflow.catalog import fanout_scan

    mem = spark.range(10)
    assert fanout_scan(mem) is mem  # no input files -> untouched

    tiny = str(tmp_path / "tiny.parquet")
    spark.range(5).write.parquet(tiny)
    t = spark.read.parquet(tiny)
    assert fanout_scan(t) is t  # below the size floor -> untouched

    big = str(tmp_path / "big.parquet")
    spark.range(200_000).selectExpr(
        "id", "repeat('x', 64) as pad"
    ).coalesce(1).write.parquet(big)
    b = spark.read.parquet(big)
    if b.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism:
        fb = fanout_scan(b)
        assert (
            fb.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )
        assert fb.count() == 200_000
        assert (
            fb.selectExpr("sum(id) s").first()["s"]
            == b.selectExpr("sum(id) s").first()["s"]
        )

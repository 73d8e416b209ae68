"""Remaining SURVEY §2 operator helpers: observed metrics (A3), colors
document pipeline (B5), multimodal feature plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.functions.telemetry import with_observed_count
from lakeflow.operators.multimodal import (
    decode_features,
    extract_metadata,
    with_binary_payload,
)
from lakeflow.pipelines.json_document import import_colors
from tests import fixtures

SF = "/root/testdata/sf0.001"


def test_observed_count_single_pass(spark):
    df = load_table(spark, SF, "orders").filter(F.col("o_orderstatus") == "F")
    observed, obs = with_observed_count(df, "f_orders")
    n = observed.count()
    assert obs.get["n_rows"] == n > 0


def test_import_colors(spark, tmp_path):
    path = fixtures.build_colors(str(tmp_path))
    out = import_colors(spark, path)
    rows = {r["color"]: r for r in out.collect()}
    assert set(out.columns) == {"color", "category", "type", "code_rgba", "hex"}
    assert rows["red"]["code_rgba"] == [255, 0, 0, 1]
    assert rows["white"]["type"] is None


def test_multimodal_metadata_roundtrip(spark):
    d = load_table(spark, SF, "documents").limit(20)
    meta = extract_metadata(with_binary_payload(d, "text", "doc_id"))
    joined = meta.join(
        d.select(F.col("doc_id").alias("id"), F.md5("text").alias("expect_md5")),
        "id",
    )
    bad = joined.filter(F.col("content_md5") != F.col("expect_md5")).count()
    assert bad == 0 and meta.count() == 20


def test_multimodal_fake_features_deterministic(spark):
    d = with_binary_payload(
        load_table(spark, SF, "documents").limit(10), "text", "doc_id"
    )
    a = {r["id"]: r["feature"] for r in decode_features(d, fake=True).collect()}
    b = {r["id"]: r["feature"] for r in decode_features(d, fake=True).collect()}
    assert a == b and all(len(v) == 4 for v in a.values())

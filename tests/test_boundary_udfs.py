"""N5 serialization boundary + §2.11 pandas-UDF parity with built-ins."""

from __future__ import annotations

import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.functions.json_boundary import serialize_nested_to_json
from lakeflow.functions.pandas_udfs import quality_score_pandas
from lakeflow.operators.text import quality_score

SF = "/root/testdata/sf0.001"


def test_serialize_nested_to_json(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, s=Row(a=1, b="x"), arr=["p", "q"], empty=[]),
            Row(id=2, s=Row(a=2, b=None), arr=[], empty=[]),
        ],
        "id int, s struct<a:int,b:string>, arr array<string>, empty array<int>",
    )
    out = {r["id"]: r for r in serialize_nested_to_json(df).collect()}
    assert json.loads(out[1]["s"]) == {"a": 1, "b": "x"}
    assert json.loads(out[1]["arr"]) == ["p", "q"]
    assert out[1]["empty"] is None  # empty collection -> null (N6)
    assert out[2]["arr"] is None
    assert json.loads(out[2]["s"]) == {"a": 2}  # null field omitted by to_json


def test_pandas_udf_agrees_with_builtin_path(spark):
    d = load_table(spark, SF, "documents").limit(100)
    both = d.select(
        "doc_id",
        F.floor(quality_score("text") * 1e6 + F.lit(0.5)).alias("builtin"),
        F.floor(quality_score_pandas("text") * 1e6 + F.lit(0.5)).alias("vectorized"),
    )
    assert both.filter(F.col("builtin") != F.col("vectorized")).count() == 0


def test_pandas_udf_parity_on_unicode_edges(spark):
    # Java \s and [^a-zA-Z0-9 ] are ASCII classes; the vectorized path
    # must not use unicode-aware isalnum()/split() (regression from a
    # verify probe: accented chars + NBSP diverged)
    probe = spark.createDataFrame(
        [("héllo wörld ✓ the",), ("x",), ("a\xa0b the of",), ("  padded  s ",)],
        "text string",
    )
    both = probe.select(
        F.floor(quality_score("text") * 1e6 + F.lit(0.5)).alias("b"),
        F.floor(quality_score_pandas("text") * 1e6 + F.lit(0.5)).alias("v"),
    )
    assert both.filter(F.col("b") != F.col("v")).count() == 0

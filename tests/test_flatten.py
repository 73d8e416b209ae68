"""Unit tests for the collision-safe flatten + sanitize helpers
(SURVEY §5.1: flatten collision cases, sanitize incl. '$',
empty-collection nulling)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from lakeflow.operators.flatten import (
    empty_collections_to_null,
    flatten,
    flatten_all,
    sanitize_columns,
    sanitize_name,
)


def _nested_df(spark):
    return spark.createDataFrame(
        [
            Row(
                size=1,
                message=Row(headers=Row(to="a@x", subject="s"), size=99),
                status=Row(code=250, message="OK"),
            )
        ]
    )


def test_collision_renames_child_with_field_prefix(spark):
    df = _nested_df(spark)
    out = flatten(df, ["message"])
    # message.size collides with top-level size -> message_size
    assert "message_size" in out.columns
    assert "size" in out.columns
    row = out.collect()[0]
    assert row["size"] == 1 and row["message_size"] == 99
    # nested depth-2 leaves keep dotted relative paths
    assert "headers.to" in out.columns


def test_collision_against_other_flattened_field(spark):
    df = _nested_df(spark)
    out = flatten(df, ["status", "message"])
    # status.message collides with the (to-be-dropped) message struct col
    # exactly as the reference checks against df.columns pre-drop
    assert "status_message" in out.columns
    assert out.collect()[0]["status_message"] == "OK"


def test_flatten_non_recursive_keeps_depth1_structs(spark):
    df = _nested_df(spark)
    out = flatten(df, ["message"], recursive=False)
    assert "headers" in out.columns  # still a struct
    assert out.schema["headers"].dataType.typeName() == "struct"


def test_flatten_all(spark):
    out = flatten_all(_nested_df(spark))
    assert set(c for c in out.columns if "headers" in c) == {
        "headers.to",
        "headers.subject",
    }


def test_sanitize_name_rules():
    assert sanitize_name("localDateTime.$date") == "localdatetime__date"
    assert sanitize_name("delivery-status_attempt-no") == "delivery_status_attempt_no"
    assert sanitize_name("Message.Headers.To") == "message_headers_to"
    # idempotent
    assert sanitize_name(sanitize_name("A.B-C$D")) == sanitize_name("A.B-C$D")


def test_sanitize_columns(spark):
    df = flatten(_nested_df(spark), ["message", "status"])
    out = sanitize_columns(df)
    assert "headers_to" in out.columns
    assert all(c == sanitize_name(c) for c in out.columns)


def test_empty_collections_to_null(spark):
    df = spark.createDataFrame(
        [Row(a=[], b=["x"], c={}, d=1), Row(a=["y"], b=[], c={"k": "v"}, d=2)],
        "a array<string>, b array<string>, c map<string,string>, d int",
    )
    out = empty_collections_to_null(df).orderBy("d").collect()
    assert out[0]["a"] is None and out[0]["b"] == ["x"] and out[0]["c"] is None
    assert out[1]["a"] == ["y"] and out[1]["b"] is None and out[1]["c"] == {"k": "v"}

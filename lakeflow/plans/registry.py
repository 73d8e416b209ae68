"""Named-query registry: the declared operator surface of the engine.

Every entry is one row of SURVEY.md §2 made executable: a Spark
DataFrame plan plus (where SQL-expressible) an equivalent ANSI-SQL
oracle that DuckDB runs on the same parquet tables. The driver compares
both at sf0.01 (row count + schema + order-insensitive value hash), so
each pair is written for EXACT equality — see lakeflow.functions.exact
for the float policy.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str
    refs: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 rows


QUERIES: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    description: str = "",
    refs: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QuerySpec(name, fn, oracle, description, refs)
        return fn

    return deco

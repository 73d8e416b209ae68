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
        # structural guards: a misplaced/stacked decorator must fail at
        # import, not silently register the WRONG plan under a right
        # name (r8 defect: a stacked @query("q_chi2_drift") on
        # q_grouped_ks shipped 5-row grouped-KS output as chi2 — caught
        # only by the oracle gate)
        if fn.__name__ != name:
            raise RuntimeError(
                f"@query({name!r}) decorates function {fn.__name__!r} — "
                "registered name must equal the function name"
            )
        if name in QUERIES:
            raise RuntimeError(f"@query({name!r}): duplicate registration")
        QUERIES[name] = QuerySpec(name, fn, oracle, description, refs)
        return fn

    return deco

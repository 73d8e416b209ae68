"""Data-quality expectations for pipeline outputs.

The reference's only quality signal was printed row counts; an engine
feeding 100 TB training pipelines needs executable expectations. Checks
run in ONE pass (a single aggregate over the frame — no per-check
scans) and return a structured report; ``enforce`` raises on the first
violated expectation.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CheckResult:
    name: str
    passed: bool
    detail: str


class QualityError(AssertionError):
    pass


def run_checks(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] | None = None,
    min_rows: int = 0,
    accepted_values: dict[str, Sequence] | None = None,
    custom: dict[str, Column] | None = None,
) -> list[CheckResult]:
    """Evaluate all expectations with one aggregate job.

    - ``not_null``: columns that must contain no nulls
    - ``unique``: column set that must form a unique key. NULL keys use
      struct equality, so NULL == NULL: two rows that are both NULL in
      a key column count as duplicates of each other. This is
      grouping/distinct semantics (what a latest-wins dedup or groupBy
      would collapse), intentionally STRICTER than a SQL UNIQUE
      constraint, which admits any number of NULLs. Combine with
      ``not_null`` on the key columns when you want the SQL behavior's
      preconditions enforced instead.
    - ``min_rows``: minimum row count
    - ``accepted_values``: column -> allowed value list
    - ``custom``: name -> boolean Column that must hold for EVERY row
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in not_null:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
    for col, vals in (accepted_values or {}).items():
        bad = ~F.col(col).isin(list(vals)) & F.col(col).isNotNull()
        aggs.append(F.sum(bad.cast("long")).alias(f"__badval_{col}"))
    for name, cond in (custom or {}).items():
        # a condition that evaluates to NULL (e.g. comparison on a null
        # column) is a violation, not a silent pass: coalesce to False
        # before negating so sum() counts it
        bad_cond = ~F.coalesce(cond, F.lit(False))
        aggs.append(F.sum(bad_cond.cast("long")).alias(f"__custom_{name}"))
    if unique:
        # count_distinct over the bare columns drops rows with NULL in
        # any key column (falsely reporting duplicates); a struct is
        # itself non-null, so this counts NULL keys null-safely
        aggs.append(
            F.count_distinct(F.struct(*[F.col(c) for c in unique])).alias(
                "__distinct"
            )
        )
    row = df.agg(*aggs).collect()[0]

    results: list[CheckResult] = []
    n = row["__n"]
    results.append(
        CheckResult("min_rows", n >= min_rows, f"{n} rows (need >= {min_rows})")
    )
    for c in not_null:
        bad = row[f"__null_{c}"]
        results.append(CheckResult(f"not_null:{c}", bad == 0, f"{bad} nulls"))
    for col in (accepted_values or {}):
        bad = row[f"__badval_{col}"]
        results.append(
            CheckResult(f"accepted_values:{col}", bad == 0, f"{bad} bad values")
        )
    for name in (custom or {}):
        bad = row[f"__custom_{name}"]
        results.append(
            CheckResult(f"custom:{name}", bad == 0, f"{bad} violations")
        )
    if unique:
        d = row["__distinct"]
        results.append(
            CheckResult(
                f"unique:{','.join(unique)}", d == n, f"{n - d} duplicate keys"
            )
        )
    return results


def enforce(results: list[CheckResult]) -> None:
    failed = [r for r in results if not r.passed]
    if failed:
        msgs = "; ".join(f"{r.name} ({r.detail})" for r in failed)
        raise QualityError(f"data-quality checks failed: {msgs}")

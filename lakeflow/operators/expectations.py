"""Declarative data-quality expectations (Delta Live Tables-style
``expect``/``expect_or_drop``) for batch and streaming relations.

The reference pipelines validated nothing: a malformed row rode the
pandas frame straight into Redshift. Production ETL wants row-level
constraints DECLARED next to the pipeline, evaluated in ONE pass, with
three dispositions: annotate (keep + flag), drop-and-quarantine
(route violations to a side table for triage), or fail the job.

Spark realization: every rule is a boolean Column, so the whole check
is one narrow codegen projection — the failed-rule list is a
``filter`` over a literal array of (name, predicate) structs, no
Python, no extra scan. The report aggregates per-rule violation counts
in one conditional hash-aggregate (the same single-pass shape as
``profile_table``). Uniqueness is not a row-local predicate; use
``duplicate_keys`` (a group-by) alongside.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FAILED_COL = "failed_rules"


def check_expectations(
    df: DataFrame, rules: Mapping[str, Column], failed_col: str = FAILED_COL
) -> DataFrame:
    """Annotate: ``df`` + ``failed_col`` array<string> naming every rule
    the row violates (empty array = clean row). One projection."""
    pairs = F.array(
        *[
            F.struct(F.lit(name).alias("n"), cond.alias("ok"))
            for name, cond in rules.items()
        ]
    )
    failed = F.transform(
        F.filter(pairs, lambda p: ~F.coalesce(p.getField("ok"), F.lit(False))),
        lambda p: p.getField("n"),
    )
    return df.withColumn(failed_col, failed)


def split_expectations(
    df: DataFrame, rules: Mapping[str, Column], failed_col: str = FAILED_COL
) -> tuple[DataFrame, DataFrame]:
    """expect_or_drop + quarantine: (clean rows without the marker
    column, violating rows with ``failed_col`` naming their failures).
    Both sides derive from one annotated plan — write the quarantine
    side to a triage table and the clean side onward."""
    marked = check_expectations(df, rules, failed_col)
    good = marked.filter(F.size(failed_col) == 0).drop(failed_col)
    bad = marked.filter(F.size(failed_col) > 0)
    return good, bad


def expectation_report(
    df: DataFrame, rules: Mapping[str, Column]
) -> DataFrame:
    """One-row report: total rows, clean rows, and a violation count
    per rule — ONE conditional hash-aggregate over a single scan
    (each rule becomes a SUM(CASE WHEN NOT ok)). The shape that stays
    cheap at 100 TB because nothing is materialized per rule."""
    from functools import reduce

    all_pass = reduce(
        Column.__and__,
        (F.coalesce(c, F.lit(False)) for c in rules.values()),
        F.lit(True),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(all_pass.cast("long")).cast("long").alias("n_clean"),
    ]
    for name, cond in rules.items():
        aggs.append(
            F.sum((~F.coalesce(cond, F.lit(False))).cast("long"))
            .cast("long")
            .alias(f"viol_{name}")
        )
    return df.agg(*aggs)


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """The uniqueness expectation (not expressible row-locally): key
    tuples appearing more than once, with their multiplicity — one
    hash-aggregate + HAVING."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )

"""Exact cross-engine arithmetic helpers.

Floating-point SUMs are not associative: Spark's partial/final
aggregation order differs from a single-node engine's, so ``SUM(double)``
can differ in the last bits and break exact result comparison (and, at
100 TB, differ run to run). Policy: convert doubles to exact integers
*before* any cross-row aggregation via ``floor(x * scale + 0.5)`` —
a deterministic double→int mapping that both Spark and any ANSI SQL
engine compute identically — then aggregate longs (exact, associative,
and faster: long sums stay in whole-stage codegen with no Decimal
overhead). Within-row expressions (a*b+c) are identical IEEE op
sequences on both engines and need no special handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cents(c: Column | str) -> Column:
    """Double currency → exact integer cents (round-half-up)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.floor(c * F.lit(100.0) + F.lit(0.5)).cast("long")


def micros(c: Column | str) -> Column:
    """Double metric → exact integer micro-units (round-half-up)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)).cast("long")


def trunc_div(num: Column, den: Column) -> Column:
    """Exact integer division truncating toward zero, via the
    remainder identity trunc(a/b) = (a - a % b) / b: Spark's % takes
    the dividend's sign (trunc-style), the subtraction makes the
    division exact (so its decimal rounding mode can never matter),
    and the result casts to BIGINT losslessly.

    The numerator is ALWAYS routed through DECIMAL(38,0): Spark
    promotes long/long division to DOUBLE, so a raw LONG numerator
    above 2^53 would round before the cast and the quotient could come
    back off by one (caught in review round 8 — pca_project feeds sums
    up to ~1.3e17). Casting the numerator pins the whole expression in
    Spark's exact decimal lattice (decimal % integral stays decimal;
    decimal/integral divides exactly because the remainder was
    subtracted), for LONG and DECIMAL(38,0) numerators alike. That
    exact wide path is why this exists: BIGINT-overflowing
    accumulations (a 1e12-row corpus at micro^2 magnitudes, HLL's
    27-digit estimate numerator) divide back down to a BIGINT-bounded
    surface in one exact step.

    Contract: the QUOTIENT must fit BIGINT — callers bound it by
    construction; outside that domain the final cast raises a loud
    ANSI overflow (never a silent wrap; property-tested). Mirror in
    SQL with a sign-split `//` (or bare `//` when both operands are
    known non-negative)."""
    num = num.cast("decimal(38,0)")
    return ((num - num % den) / den).cast("long")


# SQL-side equivalents (DuckDB/ANSI), for oracle queries. ``e0``
# literals force DOUBLE (a bare ``100.0`` is DECIMAL in DuckDB, which
# would change the arithmetic type lattice vs Spark).
SQL_CENTS = "CAST(FLOOR(({x}) * 100e0 + 0.5e0) AS BIGINT)"
SQL_MICROS = "CAST(FLOOR(({x}) * 1000000e0 + 0.5e0) AS BIGINT)"


def lit_ts(df: DataFrame, column: str, value: str) -> Column:
    """Timestamp literal cast to the column's own timestamp flavor.

    Parquet files may load as TIMESTAMP or TIMESTAMP_NTZ depending on
    writer metadata; comparing against a literal of the other flavor
    would inject a timezone conversion. Pinning the literal to the
    column's type keeps predicates pushdown-eligible and deterministic.
    """
    return F.lit(value).cast(df.schema[column].dataType)

"""Differential-testing harness: Spark result vs DuckDB oracle.

Mirrors the driver's t2 gate (SURVEY §5.3): run the Spark plan and the
ANSI-SQL oracle on the same parquet tables, canonicalize (columns sorted
by name, rows sorted), and require exact value equality.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame

from lakeflow.catalog import TABLES


def duckdb_oracle(sql: str, sf_dir: str):
    """Run oracle SQL on the parquet tables; returns a pandas DataFrame."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    try:
        import numpy as np
        import pandas as pd

        if isinstance(v, (np.ndarray, list, tuple)):
            return "[" + ",".join(_cell(x) for x in v) + "]"
        if v is pd.NaT or (isinstance(v, (np.floating,)) and np.isnan(v)):
            return "NULL"
        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.floating):
            return repr(float(v))
    except ImportError:  # pragma: no cover
        pass
    return str(v)


def canonicalize(pdf) -> list[tuple[str, ...]]:
    pdf = pdf[sorted(pdf.columns)]
    rows = [
        tuple(_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_to_oracle(
    spark_df: DataFrame, oracle_sql: str, sf_dir: str
) -> tuple[bool, str]:
    mine = canonicalize(spark_df.toPandas())
    theirs = canonicalize(duckdb_oracle(oracle_sql, sf_dir))
    if len(mine) != len(theirs):
        return False, f"row count: spark={len(mine)} oracle={len(theirs)}"
    for i, (a, b) in enumerate(zip(mine, theirs)):
        if a != b:
            return False, f"first row mismatch at {i}:\n  spark ={a}\n  oracle={b}"
    return True, f"ok ({len(mine)} rows)"

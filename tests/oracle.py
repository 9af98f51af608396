"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row count + schema shape + order-insensitive value equality (columns
sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare_query(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    ours = _canon(spark_df.toPandas())
    oracle = _canon(con.execute(sql).fetchdf())
    problems: list[str] = []
    if len(ours) != len(oracle):
        problems.append(f"row count: spark={len(ours)} duckdb={len(oracle)}")
    if list(ours.columns) != list(oracle.columns):
        problems.append(f"columns: spark={list(ours.columns)} duckdb={list(oracle.columns)}")
        return problems
    if problems:
        return problems
    for c in ours.columns:
        a, b = ours[c], oracle[c]
        col_issues = 0
        for x, y in zip(a, b):
            if _neq(x, y):
                col_issues += 1
                if col_issues <= 3:
                    problems.append(f"col {c}: spark={x!r} duckdb={y!r}")
        if col_issues > 3:
            problems.append(f"col {c}: {col_issues} total mismatches")
    return problems


def _neq(x, y) -> bool:
    x_na = not isinstance(x, (list, tuple)) and pd.isna(x)
    y_na = not isinstance(y, (list, tuple)) and pd.isna(y)
    if x_na or y_na:
        return x_na != y_na
    if isinstance(x, float) and isinstance(y, float):
        # driver hashes exact values; we allow only true equality here,
        # flagging anything that could break the hash
        return x != y
    if hasattr(x, "timestamp") and hasattr(y, "timestamp"):
        return x != y
    return x != y

"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row count + schema shape + order-insensitive value equality (columns
sorted by name, rows sorted by all columns)."""

from __future__ import annotations

import struct

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
    # Deliberately bug-compatible with the driver's canonicalizer: NO
    # list->tuple conversion (an ArrayType output column must crash here
    # exactly like it crashes the driver — r2's mm_decode_features bug),
    # and float equality downstream is bit-level (the driver hashes the
    # formatted bits, so -0.0 != 0.0 and any last-ulp drift must flag).
    df = df[sorted(df.columns)].copy()
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
        # Bit-level compare: the driver formats/hashes the value bits, so
        # -0.0 vs 0.0 (IEEE ==) is a driver mismatch and must flag here.
        return struct.pack("<d", x) != struct.pack("<d", y)
    return x != y

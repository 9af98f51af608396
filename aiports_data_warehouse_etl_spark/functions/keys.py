"""Deterministic surrogate-key assignment.

The reference uses the pandas positional index as the surrogate key
(`dags/extract_and_tranform.py:92,262,287,314`), i.e. "row number in
input order". In a distributed engine that order must be *declared*:
every key here is a row number over an explicit canonical ordering, so
results are reproducible across partitionings, retries, and engines
(the DuckDB oracle computes the same ids with ``ROW_NUMBER() OVER
(ORDER BY ...)``). ``monotonically_increasing_id`` is deliberately NOT
used anywhere — it is partition-layout-dependent.

Scale note: an un-partitioned window funnels all rows through ONE task —
fine for dimension tables (≤ millions of rows), wrong for a 100 TB fact.
``with_scalable_row_id`` is the fact-scale path: a distributed range
sort, then per-partition offsets computed from partition counts (two
narrow passes, no single-task bottleneck).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_row_id(
    df: DataFrame,
    order_by: list[Column | str],
    name: str,
    start: int = 0,
) -> DataFrame:
    """Dense 0-based row id over a canonical ordering (dimension-scale).

    Equivalent to pandas ``df.index`` after a deterministic sort.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(
        name, (F.row_number().over(w) - 1 + F.lit(start)).cast("long")
    )


def with_scalable_row_id(
    df: DataFrame,
    order_by: list[str],
    name: str,
    start: int = 0,
) -> DataFrame:
    """Dense 0-based row id at fact scale: no single-partition window.

    Range-repartitions on the ordering key (distributed sort), then adds
    cumulative per-partition offsets. Two passes over the data, all
    narrow after the sort; survives 100 TB where ``Window.orderBy``
    would OOM one task.
    """
    ordered = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
    indexed = ordered.rdd.zipWithIndex()
    schema = df.schema
    spark = df.sparkSession

    def flatten(pair):
        row, idx = pair
        return (*row, idx + start)

    out = indexed.map(flatten)
    from pyspark.sql import types as T

    out_schema = T.StructType(list(schema.fields) + [T.StructField(name, T.LongType(), False)])
    return spark.createDataFrame(out, out_schema)


def first_seen_id(
    df: DataFrame,
    dedup_cols: list[str],
    order_by: list[Column | str],
    name: str,
) -> DataFrame:
    """Distinct rows keyed by the position of their FIRST occurrence.

    Replicates pandas ``drop_duplicates()`` (keep='first') followed by
    ``rename_axis(name).reset_index()`` (ref `:260-262`, `:285-287`):
    the surviving row keeps the positional index it had in the
    pre-dedup frame. Implemented as row-id attach → min(id) per group —
    a single hash aggregation, fully distributed.
    """
    with_idx = with_row_id(df, order_by, "__pos")
    return (
        with_idx.groupBy(*dedup_cols)
        .agg(F.min("__pos").cast("long").alias(name))
        .select(name, *dedup_cols)
    )

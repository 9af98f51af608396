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

    Entirely JVM-side (no ``.rdd``, no Python round-trip — r1's
    ``rdd.zipWithIndex`` version pickled every row through Python):

    1. range-repartition on the ordering key (distributed sort) and
       stamp ``spark_partition_id()``; ``localCheckpoint`` pins the
       partition layout so the counts job and the numbering job see
       the SAME range boundaries (and the shuffle/sort runs once, not
       twice — lineage is truncated, recompute impossible);
    2. per-partition row counts (one row per partition — a bounded,
       legitimate driver collect) → cumulative offsets;
    3. broadcast-join the tiny offset table back on partition id and
       add ``row_number() OVER (PARTITION BY pid ORDER BY key)``.
       The window's hash exchange on pid moves already-clustered rows
       once; every operator stays in whole-stage codegen.

    Ids are identical to ``with_row_id``'s for the same total
    ordering; survives 100 TB where ``Window.orderBy`` would OOM one
    task. ``localCheckpoint`` stores blocks on executors (not fault
    tolerant): an executor loss fails the job loudly instead of
    silently renumbering — the correct failure mode for key
    assignment; use a reliable checkpoint dir if re-runs are cheaper
    than determinism risk.
    """
    stamped = (
        df.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = stamped.groupBy("__pid").count().collect()
    offsets, running = [], int(start)
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], running))
        running += row["count"]
    spark = df.sparkSession
    if not offsets:  # empty input: keep schema, zero rows
        return df.withColumn(name, F.lit(0).cast("long")).limit(0)
    # VALUES literal keeps the offset table JVM-side (createDataFrame
    # would round-trip it through a PythonRDD scan node)
    values = ", ".join(f"({int(p)}, {int(o)}L)" for p, o in offsets)
    off_df = spark.sql(f"SELECT * FROM VALUES {values} AS t(__pid, __off)")
    w = Window.partitionBy("__pid").orderBy(*order_by)
    return (
        stamped.join(F.broadcast(off_df), "__pid")
        .withColumn(
            name,
            (F.row_number().over(w) - 1 + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off")
    )


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

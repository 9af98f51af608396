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
    order_by: list[Column | str],
    name: str,
    start: int = 0,
    total_name: str | None = None,
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

    ``total_name``: optionally also attach the TOTAL row count as a
    literal long column of that name — it falls out of the offsets
    pass for free, and global rank-family functions (ntile,
    percent_rank, cume_dist) need it (see
    ``queries.win_ntile_percent_rank``).
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
    total = running - int(start)
    spark = df.sparkSession
    if not offsets:  # empty input: keep schema, zero rows
        out = df.withColumn(name, F.lit(0).cast("long")).limit(0)
        if total_name is not None:
            out = out.withColumn(total_name, F.lit(0).cast("long"))
        return out
    # VALUES literal keeps the offset table JVM-side (createDataFrame
    # would round-trip it through a PythonRDD scan node)
    values = ", ".join(f"({int(p)}, {int(o)}L)" for p, o in offsets)
    off_df = spark.sql(f"SELECT * FROM VALUES {values} AS t(__pid, __off)")
    w = Window.partitionBy("__pid").orderBy(*order_by)
    out = (
        stamped.join(F.broadcast(off_df), "__pid")
        .withColumn(
            name,
            (F.row_number().over(w) - 1 + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off")
    )
    if total_name is not None:
        out = out.withColumn(total_name, F.lit(total).cast("long"))
    return out


def with_scalable_prefix_sum(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    name: str,
) -> DataFrame:
    """Global running sum of ``value_col`` over a total ordering, at
    fact scale: no single-partition window (the classic 100 TB
    scale-killer — ``Window.orderBy(...)`` with no partition spec
    funnels the whole table through ONE task's sort).

    Same two-pass decomposition as ``with_scalable_row_id``:

    1. range-repartition on the ordering key (distributed sort),
       stamp partition ids, ``localCheckpoint`` to pin the layout;
    2. ONE row per partition of sum partials (bounded driver collect)
       → exclusive cumulative offsets;
    3. broadcast the tiny offset table back and add a
       *within-partition* running sum — every partition windows only
       its own rows, so the sort work is already done and no task
       sees more than one partition's worth of data.

    Result is bit-identical to
    ``sum(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` for
    INTEGRAL value columns over any total ordering (ties in a partial
    ordering would make either form nondeterministic — pass a
    key-complete ordering). Fractional columns are rejected: the
    cross-partition offsets are exchanged as exact integers, and a
    float partial would silently truncate (ADVICE r4) — a float
    prefix-sum also wouldn't be bit-stable across partitionings in
    the first place (addition-order dependence).
    """
    dtype = dict(df.dtypes).get(value_col, "")
    if dtype not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"with_scalable_prefix_sum: {value_col} has type {dtype!r}; "
            "only integral columns fold exactly across partition "
            "offsets (floats would truncate / be addition-order-"
            "dependent) — cast or scale to integers first"
        )
    stamped = (
        df.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    partials = (
        stamped.groupBy("__pid").agg(F.sum(value_col).alias("__s")).collect()
    )
    offsets, running = [], 0
    for row in sorted(partials, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], running))
        running += int(row["__s"] or 0)
    spark = df.sparkSession
    if not offsets:  # empty input: keep schema, zero rows
        return df.withColumn(name, F.lit(0).cast("long")).limit(0)
    values = ", ".join(f"({int(p)}, {int(o)}L)" for p, o in offsets)
    off_df = spark.sql(f"SELECT * FROM VALUES {values} AS t(__pid, __off)")
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        stamped.join(F.broadcast(off_df), "__pid")
        .withColumn(
            name,
            (F.sum(value_col).over(w) + F.col("__off")).cast("long"),
        )
        .drop("__pid", "__off")
    )


def with_scalable_prefix_max(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    name: str,
    exclusive: bool = False,
) -> DataFrame:
    """Global running MAX of ``value_col`` over a total ordering with
    no single-partition window — same two-pass range-partitioned
    decomposition as ``with_scalable_prefix_sum``, but for the
    prefix-max semigroup: per-partition max partials fold into
    exclusive cross-partition offsets (the max of every EARLIER
    partition), then each partition windows only its own rows and
    takes ``greatest(within-partition running max, offset)``.

    ``exclusive=True`` gives the *strict* prefix
    (``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``): the first
    row of the whole ordering gets NULL, matching the SQL frame —
    the shape skyline/record-breaking queries need. max is
    order-insensitive and exact for any orderable type, so the result
    is bit-identical to the global window form for any key-complete
    ordering."""
    dtype = dict(df.dtypes)[value_col]
    stamped = (
        df.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    partials = (
        stamped.groupBy("__pid").agg(F.max(value_col).alias("__m")).collect()
    )
    spark = df.sparkSession
    if not partials:  # empty input: keep schema, zero rows
        return df.withColumn(name, F.lit(None).cast(dtype)).limit(0)
    rows, running = [], None
    for row in sorted(partials, key=lambda r: r["__pid"]):
        rows.append((int(row["__pid"]), running))
        m = row["__m"]
        if m is not None and (running is None or m > running):
            running = m
    off_df = spark.createDataFrame(rows, f"__pid int, __off {dtype}")
    end = -1 if exclusive else 0
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    # greatest() skips NULLs: first partition's NULL offset and the
    # empty exclusive frame both fall through correctly
    return (
        stamped.join(F.broadcast(off_df), "__pid")
        .withColumn(
            name, F.greatest(F.max(value_col).over(w), F.col("__off"))
        )
        .drop("__pid", "__off")
    )


def with_scalable_ntile(
    df: DataFrame,
    order_by: list[Column | str],
    k: int,
    name: str,
) -> DataFrame:
    """``ntile(k)`` over a total order without the single-partition
    global window. ntile reduces to (row position, total count):

      first (n % k) buckets get ceil(n/k) rows, the rest floor(n/k)

    — the ANSI definition Spark and DuckDB both implement — so the
    two-pass range-partitioned row id (``with_scalable_row_id``) plus
    closed-form arithmetic is bit-identical to
    ``ntile(k) OVER (ORDER BY ...)`` for any key-complete ordering,
    and survives 100 TB where ``Window.orderBy`` funnels every row
    through one task. Pass ``Column`` orderings (e.g. ``desc()``)
    freely — they flow through repartitionByRange / sort / window
    unchanged.
    """
    out = with_scalable_row_id(df, order_by, "__nt_r0", total_name="__nt_n")
    r = F.col("__nt_r0") + 1  # 1-based position
    n = F.col("__nt_n")
    q, rem = F.floor(n / k), n % k
    big = (q + 1) * rem  # rows living in the first `rem` larger buckets
    tile = (
        F.when(r <= big, F.floor((r - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((r - big - 1) / F.greatest(q, F.lit(1))) + 1)
        .cast("long")
    )
    return out.withColumn(name, tile).drop("__nt_r0", "__nt_n")


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

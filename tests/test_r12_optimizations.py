"""Pins for the r12 optimization round's operator-internal changes.

1. txlog schema-ledger fast path: a uniform-schema snapshot read must
   construct with ZERO Spark jobs (no mergeSchema footer sweep), while
   additive evolution still falls back to the union contract.
2. Rewrite commits record the staged schema (add_schema /
   file_schemas) so snapshots keep every live file on the fast path.
3. par_floor: raises partition count only when below cluster
   parallelism; exact no-op otherwise.
4. approx_sketches input layout: its GK percentile sketch is
   partition-layout-dependent and its oracle pins the file-ordered
   raw scan — the plan must stay a direct scan with no round-robin
   exchange and no shared-cache InMemoryRelation.
"""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aiports_data_warehouse_etl_spark.sources.io import par_floor
from aiports_data_warehouse_etl_spark.sources.txlog import TxLogTable


def _job_count(spark, group: str | None = None) -> int:
    # ADVICE r12 #4: with a unique job group set around the measured
    # section, stray session activity in the default group cannot
    # flake the zero-job assertions
    return len(
        spark.sparkContext.statusTracker().getJobIdsForGroup(group)
    )


class _job_group:
    """Context manager: run the measured section under a unique job
    group id and expose the number of jobs it launched."""

    def __init__(self, spark):
        import uuid

        self.spark = spark
        self.gid = f"jobprobe-{uuid.uuid4().hex}"

    def __enter__(self):
        self.spark.sparkContext.setJobGroup(self.gid, "job probe")
        return self

    def __exit__(self, *exc):
        self.spark.sparkContext.setJobGroup(None, None)
        return False

    @property
    def jobs(self) -> int:
        return _job_count(self.spark, self.gid)


def test_uniform_schema_read_constructs_with_zero_jobs(spark, tmp_path):
    t = TxLogTable(spark, str(tmp_path / "t"))
    df = spark.range(100).withColumn("v", F.col("id") * 2.0)
    t.append(df)
    t.append(df)
    snap = t._snapshot()
    # every live file carries a known write-schema id
    assert all(s is not None for s in snap["file_schema"].values())
    assert len(snap["schemas"]) == 1
    with _job_group(spark) as g:
        r = t.read()
    assert g.jobs == 0, (
        "uniform-schema snapshot read must not run a mergeSchema "
        "footer job at DataFrame construction"
    )
    assert r.count() == 200


def test_additive_evolution_still_unions_with_null_fill(spark, tmp_path):
    t = TxLogTable(spark, str(tmp_path / "t"))
    t.append(spark.range(5).withColumn("a", F.lit(1)))
    t.append(
        spark.range(5, 10).withColumn("a", F.lit(2)).withColumn("b", F.lit("x"))
    )
    snap = t._snapshot()
    assert len(snap["schemas"]) == 2  # mixed → mergeSchema fallback
    r = t.read()
    assert set(r.columns) == {"id", "a", "b"}
    assert r.filter("b IS NULL").count() == 5


def test_rewrite_commits_record_staged_schema(spark, tmp_path):
    t = TxLogTable(spark, str(tmp_path / "t"))
    df = spark.range(100).withColumn("v", F.col("id") * 1.0)
    t.append(df.repartition(2))
    t.delete_where("id % 7 = 0")          # COW rewrite → add_schema
    t.update_where("id % 11 = 1", {"v": "v + 0.5"})
    t.compact()
    snap = t._snapshot()
    assert snap["files"], "table should have live files"
    assert all(
        sid is not None for sid in snap["file_schema"].values()
    ), "every rewrite-staged file must carry its write schema"
    # and the read over the rewritten table still takes the fast path
    with _job_group(spark) as g:
        t.read()
    assert g.jobs == 0


def test_restore_and_clone_readds_keep_known_schemas(spark, tmp_path):
    t = TxLogTable(spark, str(tmp_path / "t"))
    df = spark.range(50).withColumn("v", F.col("id") * 1.0)
    t.append(df)
    v1 = t.delete_where_dv("id % 5 = 0")
    t.delete_where("id % 3 = 0")
    t.restore(v1)
    snap = t._snapshot()
    assert all(s is not None for s in snap["file_schema"].values()), (
        "restore must carry per-file write schemas for its re-adds"
    )
    assert t.read().count() == 40
    c = t.shallow_clone(str(tmp_path / "c"))
    csnap = c._snapshot()
    assert all(s is not None for s in csnap["file_schema"].values())
    assert c.read().count() == 40


def test_par_floor_raises_only_below_parallelism(spark):
    par = spark.sparkContext.defaultParallelism
    one = spark.range(10).coalesce(1)
    assert par_floor(one).rdd.getNumPartitions() == par
    wide = spark.range(1000).repartition(par + 4)
    # already at/above the floor: the exact same plan comes back
    assert par_floor(wide) is wide


@pytest.mark.parametrize("q", ["approx_sketches"])
def test_approx_sketches_reads_raw_scan_layout(spark, q, sf_oracle):
    from aiports_data_warehouse_etl_spark.queries import QUERIES

    plan = QUERIES[q].fn(spark, sf_oracle)._jdf.queryExecution().toString()
    assert "RoundRobinPartitioning" not in plan, (
        "approx_sketches' percentile sketch is partition-layout-"
        "dependent; its input layout is pinned to the raw scan"
    )
    assert "InMemoryRelation" not in plan

"""Plan-shape assertions: the scale posture, encoded as tests.

These don't check answers — they check that Catalyst produced the
physical plan we designed for 100 TB: broadcast joins for dim lookups,
filter/column pushdown into the parquet scan, no cartesian products in
bucketed self-joins, whole-stage codegen on the hot paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aiports_data_warehouse_etl_spark.operators.dedup import lsh_candidate_pairs
from aiports_data_warehouse_etl_spark.queries import QUERIES


@pytest.fixture(autouse=True)
def _no_testdata_cache(monkeypatch):
    """Plan assertions inspect the parquet scan (PushedFilters,
    ReadSchema); the testdata persist-cache would swap those scans for
    InMemoryTableScan nodes, so bypass it in this module only."""
    monkeypatch.setenv("SPARK_GRAFT_NO_TD_CACHE", "1")


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_fk_join_is_broadcast(spark, sf_small):
    p = plan(QUERIES["j1_fk_lookup"].fn(spark, sf_small))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_star_join_all_broadcast(spark, sf_small):
    # AQE's formatted output repeats plan sections, so assert presence
    # and the absence of any shuffle join, not an exact count
    p = plan(QUERIES["j2_star_join_agg"].fn(spark, sf_small))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_scan_prunes_columns(spark, sf_small):
    p = plan(QUERIES["s1_scan_project"].fn(spark, sf_small))
    # ReadSchema lists exactly the projected columns — nothing extra
    assert "l_extendedprice" not in p and "l_shipdate" not in p


def test_filter_pushdown(spark, sf_small):
    p = plan(QUERIES["q1_pricing_summary"].fn(spark, sf_small))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p


def test_partial_aggregation(spark, sf_small):
    # map-side combine: two HashAggregate nodes around the exchange
    p = plan(QUERIES["j2_star_join_agg"].fn(spark, sf_small))
    assert p.count("HashAggregate") >= 2


def test_lsh_join_is_hash_not_cartesian(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    p = plan(lsh_candidate_pairs(docs))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_topk_uses_take_ordered(spark, sf_small):
    p = plan(QUERIES["topk_orders_global"].fn(spark, sf_small))
    assert "TakeOrderedAndProject" in p  # no full global sort


def test_codegen_on_scan_path(spark, sf_small):
    # AQE finalizes the physical plan only at execution time — run the
    # query, then inspect the executed plan for codegen stages
    df = QUERIES["q1_pricing_summary"].fn(spark, sf_small)
    df.collect()  # count() would execute a different (re-planned) query
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in p
    # codegen stages render as "*(n) Operator" in the executed plan
    assert "*(1)" in p and "*(2) HashAggregate" in p


def test_bucketed_join_avoids_shuffle(spark, sf_small):
    from aiports_data_warehouse_etl_spark.sources.io import write_bucketed_table

    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    write_bucketed_table(o, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed_table(li, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"])

    # force a sort-merge join (tiny test data would otherwise broadcast)
    joined = spark.table("b_orders").hint("merge").join(
        spark.table("b_lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    ).groupBy("o_orderstatus").count()
    joined.collect()
    p = joined._jdf.queryExecution().executedPlan().toString()
    final = p.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in final and "Bucketed: true" in final
    # co-located buckets: the join itself requires no repartitioning —
    # the only shuffle in the final plan is the downstream groupBy
    assert "Exchange hashpartitioning(o_orderkey" not in final
    assert "Exchange hashpartitioning(l_orderkey" not in final
    assert final.count("Exchange hashpartitioning") == 1


def test_partitioned_write_enables_pruning(spark, sf_small, tmp_path):
    from aiports_data_warehouse_etl_spark.sources.io import write_parquet

    o = spark.read.parquet(f"{sf_small}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    write_parquet(o, path, partition_by=["status"])

    q = spark.read.parquet(path).filter(F.col("status") == "O")
    q.collect()
    p = q._jdf.queryExecution().executedPlan().toString()
    # the filter becomes a partition filter: non-matching dirs never read
    assert "PartitionFilters: [isnotnull(status" in p
    assert "(status" in p.split("PartitionFilters")[1][:80]


def test_compaction_reduces_file_count(spark, sf_small, tmp_path):
    from aiports_data_warehouse_etl_spark.sources.io import compact_parquet

    path = str(tmp_path / "fragmented")
    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    # simulate streaming appends: 40 tiny files
    li.repartition(40).write.mode("overwrite").parquet(path)
    import glob

    before = len([f for f in glob.glob(f"{path}/*.parquet")])
    assert before >= 40
    n_rows = spark.read.parquet(path).count()

    after = compact_parquet(spark, path, target_file_mb=128)
    assert after < before
    assert spark.read.parquet(path).count() == n_rows  # lossless


def test_q6_all_predicates_pushed(spark, sf_small):
    """TPC-H Q6 shape: every filter must reach the parquet scan."""
    p = plan(QUERIES["tpch_q6_revenue_delta"].fn(spark, sf_small))
    assert "PushedFilters:" in p
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"IsNotNull({col})" in p or col in p.split("PushedFilters:")[1][:400]


def test_q18_aggregates_before_join(spark, sf_small):
    """TPC-H Q18 shape: the HAVING aggregate must run BELOW the joins
    (aggregate-then-join, not join-then-aggregate)."""
    df = QUERIES["tpch_q18_large_orders"].fn(spark, sf_small)
    p = df._jdf.queryExecution().optimizedPlan().toString()
    agg_pos = p.find("Aggregate")
    join_pos = p.find("Join")
    assert agg_pos != -1 and join_pos != -1
    # in the optimized-plan tree string, the aggregate appears NESTED
    # under (after) the join operators, i.e. executed first
    assert agg_pos > join_pos


def test_q21_decorrelated_rollup(spark, sf_small):
    """TPC-H Q21 shape (r9): the EXISTS/NOT-EXISTS pair is decorrelated
    into ONE order-keyed rollup (distinct suppliers / distinct late
    suppliers per order) instead of semi+anti joins whose build side
    is the full fact table — the join form shipped a 267 MiB fact
    broadcast at the 10x rehearsal when the column-pruned estimate
    slid under the threshold. Pin: the rollup aggregate is present,
    no semi/anti join against the fact remains, and nothing plans a
    cartesian or nested-loop join."""
    df = QUERIES["tpch_q21_waiting_supplier"].fn(spark, sf_small)
    p = df._jdf.queryExecution().optimizedPlan().toString()
    assert "n_late_sup" in p and "Aggregate" in p
    assert "LeftSemi" not in p and "LeftAnti" not in p
    phys = plan(df)
    assert "CartesianProduct" not in phys and "BroadcastNestedLoopJoin" not in phys
    # the actual r9 regression: a fact-derived relation on a broadcast
    # build side. Execute and check every AQE broadcast stage's row
    # count against the order cardinality — the legitimate broadcast
    # sides (orders-F projection, supplier, the per-order rollup) are
    # all ≤ #orders, while any line-granularity relation (lineitem,
    # the joined late-lines) exceeds it.
    import re

    # Precondition, not vacuity (ADVICE r9 #2): the stage-stats pin
    # only exists under AQE, and the rowCount= text is a Spark
    # formatted-explain detail. Fail with a self-explanatory message
    # when either precondition moves, instead of the bare vacuous-
    # guard assert, so a Spark upgrade reads as "re-port the pin",
    # not "Q21 regressed".
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true", (
        "this pin requires AQE; enable spark.sql.adaptive.enabled "
        "or re-port the broadcast-size check"
    )
    df.collect()
    executed = plan(df)  # formatted explain post-AQE carries stage stats
    n_orders = spark.read.parquet(f"{sf_small}/orders.parquet").count()
    stages = re.findall(
        r"BroadcastQueryStage[^\n]*?rowCount=([\d.E+]+)", executed
    )
    assert stages, (
        "no 'BroadcastQueryStage ... rowCount=' lines in the formatted "
        "explain — Spark's explain format changed; re-port this pin "
        "to the new stage-stats surface (it has NOT verified anything)"
    )
    for rc in stages:
        assert float(rc) <= n_orders, (
            f"fact-sized broadcast build side returned: rowCount={rc}"
        )


def test_q16_exclusion_is_broadcast_anti(spark, sf_small):
    """TPC-H Q16 shape: the NOT IN deficit-supplier list is tiny — the
    anti join must broadcast it, not shuffle lineitem."""
    p = plan(QUERIES["tpch_q16_supplier_cnt"].fn(spark, sf_small))
    assert "BroadcastHashJoin" in p
    assert "LeftAnti" in p


def test_q13_left_join_survives(spark, sf_small):
    """TPC-H Q13 shape: the priority filter lives in the join CONDITION
    of a left join — Catalyst must not push it below the join (which
    would drop zero-order customers)."""
    df = QUERIES["tpch_q13_cust_distribution"].fn(spark, sf_small)
    p = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftOuter" in p


def test_q11_single_fact_scan_for_total(spark, sf_small):
    """TPC-H Q11 shape: the global threshold is derived from the
    per-part aggregate (tiny), so lineitem is scanned once for the
    per-part values — the threshold side reuses that aggregate rather
    than rescanning the fact."""
    p = plan(QUERIES["tpch_q11_important_stock"].fn(spark, sf_small))
    # lineitem appears in at most 2 scans (by_part + the reused agg
    # lineage); the threshold join itself must broadcast the 1-row side
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def _with_confs(spark, kv):
    """Set confs, return the old values for restore."""
    old = {}
    for k, v in kv.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore_confs(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark):
    """Skew posture at scale: a hot key that lands 80% of a join side
    in one shuffle partition must be SPLIT by AQE's skew-join handling,
    not ride a straggler task. Thresholds are lowered so test-sized
    data crosses them; on a cluster the defaults (256MB partition,
    5x median) play the same role."""
    old = _with_confs(spark, {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    })
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") < 160_000, 0)
            .otherwise((F.col("id") % 99) + 1)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        j = left.join(right.hint("merge"), "k")
        assert len(j.collect()) == 200_000
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p
        assert "skew=true" in p
    finally:
        _restore_confs(spark, old)


def test_runtime_bloom_filter_injected(spark, sf_small):
    """Runtime row-level filtering: a selective dim filter on the build
    side of a shuffle join should inject a bloom filter onto the fact
    scan (rows that cannot match die before the shuffle). At 100 TB
    this is the difference between shuffling the whole fact and
    shuffling the matching fraction."""
    old = _with_confs(spark, {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    })
    try:
        big = spark.read.parquet(f"{sf_small}/lineitem.parquet")
        dim = spark.read.parquet(f"{sf_small}/part.parquet").filter(
            F.col("p_type") == "PROMO"
        )
        j = big.join(dim, big.l_partkey == dim.p_partkey).groupBy("p_type").count()
        p = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in p.lower()
    finally:
        _restore_confs(spark, old)


def test_python_datasource_partition_parallel(spark):
    """The custom Python data source reads through N independent
    partitions (strided slices), not one task."""
    from aiports_data_warehouse_etl_spark.sources.pyds import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 1000)
        .option("partitions", 3)
        .load()
    )
    assert df.select(F.spark_partition_id()).distinct().count() == 3
    assert df.count() == 1000
    # re-read yields identical data (deterministic across runs/retries)
    ids = df.agg(F.sum("event_id"), F.sum("value")).collect()[0]
    assert (ids[0], round(ids[1], 2)) == (499500, 50045.0)


def test_salted_join_equals_plain_join(spark, sf_small):
    """salted_join is result-identical to the plain join, including
    left-outer rows with no match (unmatched keys survive exactly
    once, not once per salt bucket)."""
    from aiports_data_warehouse_etl_spark.operators.skew import salted_join

    c = spark.read.parquet(f"{sf_small}/customer.parquet").withColumn(
        "n_nationkey", F.col("c_nationkey")
    )
    n = spark.read.parquet(f"{sf_small}/nation.parquet").select(
        "n_nationkey", "n_name"
    ).filter(F.col("n_nationkey") < 10)  # force unmatched left rows
    plain = c.join(n, "n_nationkey", "left")
    salted = salted_join(c, n, on="n_nationkey", salt_from="c_custkey",
                         salt_buckets=8, how="left")
    assert salted.count() == plain.count()
    assert sorted(salted.columns) == sorted(plain.columns)
    diff = salted.exceptAll(plain).count() + plain.exceptAll(salted).count()
    assert diff == 0


def test_no_query_plans_a_cartesian_product(spark, sf_small):
    """Blanket structural gate over the ENTIRE registry: no contract
    query may plan a CartesianProduct. Broadcast nested-loop joins are
    allowed only for genuinely 1-row build sides (scalar thresholds /
    maxima); everything else must be a keyed join. Catches the classic
    regression where an equi-condition gets lost in a refactor and the
    plan silently degrades to O(n*m)."""
    offenders = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name].fn(spark, sf_small)
            p = plan(df)
        except Exception:
            continue  # runtime-env-dependent queries vet elsewhere
        if "CartesianProduct" in p:
            offenders.append(name)
    assert offenders == [], f"cartesian products in: {offenders}"


#: Queries ALLOWED to plan a Window node with an empty partition spec.
#: Every entry must window over a bounded frame: a pre-aggregated
#: rollup (25 nations / |months| rows), a hard-filtered slice, or a
#: dimension-scale §2-contract surface whose fact-scale alternative
#: (`functions/keys.with_scalable_row_id`) exists and is documented.
_GLOBAL_WINDOW_OK = {
    "p16_surrogate_key",      # §2 contract: pandas-index semantics, dim-scale
    "g1_dim_date",            # dimension builder (|dates| rows)
    "null_ordering",          # windows a `l_orderkey < 100` slice
    "share_of_parent",        # windows the 25-row region/nation rollup
    "revenue_mom_growth",     # windows the |months|-row monthly series
    # window the |sources|-row per-source rollup: scalar normalizers
    # as windows keep each plan referencing the corpus pipeline ONCE
    # (as cross-joined scalar aggs they recomputed the whole corpus
    # scan per reference — 3× the sf1 pass in pipeline_pretraining_full)
    "pipeline_pretraining_full",
    "corpus_mixture_weights",
    "domain_balance_sample",
}


def test_no_unpartitioned_window_over_full_cardinality_input(spark, sf_small):
    """Blanket structural gate (VERDICT r3 next-round #1): no registry
    query may plan a Window node WITHOUT a partition spec over
    full-cardinality input — the classic 100 TB scale-killer, where
    every row funnels through ONE task's sort. Queries that window a
    pre-aggregated / hard-bounded frame are whitelisted above with a
    per-entry justification; everything else must either partition
    the window or use the range-partitioned two-pass decompositions
    in functions/keys.py (with_scalable_row_id / _prefix_sum /
    _ntile). Walks the optimized logical plan via py4j, so a global
    window hidden under joins/aggregates is still caught."""

    def global_windows(df) -> int:
        hits = 0
        stack = [df._jdf.queryExecution().optimizedPlan()]
        while stack:
            node = stack.pop()
            if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
                hits += 1
            ch = node.children()
            for i in range(ch.length()):
                stack.append(ch.apply(i))
        return hits

    offenders = []
    for name in sorted(QUERIES):
        if name in _GLOBAL_WINDOW_OK:
            continue
        try:
            df = QUERIES[name].fn(spark, sf_small)
            n = global_windows(df)
        except Exception:
            continue  # runtime-env-dependent queries vet elsewhere
        if n:
            offenders.append(f"{name} ({n} global window nodes)")
    assert offenders == [], (
        "unpartitioned full-cardinality Window nodes in: "
        f"{offenders} — use functions/keys.py two-pass decompositions "
        "or whitelist with a bounded-frame justification"
    )


def test_scalable_ntile_matches_window_ntile(spark, sf_small):
    """with_scalable_ntile == ntile(k) OVER (ORDER BY ...) bit-for-bit,
    including the uneven-bucket edge (n % k != 0) and n < k."""
    from pyspark.sql import Window as W

    from aiports_data_warehouse_etl_spark.functions.keys import (
        with_scalable_ntile,
    )

    o = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    for k, frame in ((4, o), (7, o), (8, o.limit(5))):
        expect = frame.select(
            "o_orderkey",
            F.ntile(k)
            .over(W.orderBy("o_totalprice", "o_orderkey"))
            .cast("long")
            .alias("tile"),
        )
        got = with_scalable_ntile(
            frame, ["o_totalprice", "o_orderkey"], k, "tile"
        ).select("o_orderkey", "tile")
        assert got.exceptAll(expect).count() == 0
        assert expect.exceptAll(got).count() == 0


def test_scalable_prefix_sum_matches_window_cumsum(spark, sf_small):
    """with_scalable_prefix_sum == sum() OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING) bit-for-bit over a key-complete ordering."""
    from pyspark.sql import Window as W

    from aiports_data_warehouse_etl_spark.functions.keys import (
        with_scalable_prefix_sum,
    )

    o = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderkey", (F.col("o_orderkey") % 97).cast("long").alias("v")
    )
    w = W.orderBy("o_orderkey").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    expect = o.select("o_orderkey", F.sum("v").over(w).alias("cum"))
    got = with_scalable_prefix_sum(o, ["o_orderkey"], "v", "cum").select(
        "o_orderkey", "cum"
    )
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
    # fractional value columns are rejected loudly (ADVICE r4: the
    # cross-partition offsets fold as exact integers; a float partial
    # would silently truncate)
    import pytest

    f = o.withColumn("fv", F.col("v") + 0.5)
    with pytest.raises(TypeError, match="integral"):
        with_scalable_prefix_sum(f, ["o_orderkey"], "fv", "cum")


def test_scalable_prefix_max_matches_window(spark, sf_small):
    """with_scalable_prefix_max == max() OVER (ORDER BY ...) with both
    inclusive and strict (1 PRECEDING) frames, bit-for-bit — max is
    order-insensitive, so floats are fine here (unlike prefix_sum)."""
    from pyspark.sql import Window as W

    from aiports_data_warehouse_etl_spark.functions.keys import (
        with_scalable_prefix_max,
    )

    o = spark.read.parquet(f"{sf_small}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    for exclusive, end in ((False, W.currentRow), (True, -1)):
        w = W.orderBy("o_orderkey").rowsBetween(W.unboundedPreceding, end)
        expect = o.select(
            "o_orderkey", F.max("o_totalprice").over(w).alias("m")
        )
        got = with_scalable_prefix_max(
            o, ["o_orderkey"], "o_totalprice", "m", exclusive=exclusive
        ).select("o_orderkey", "m")
        assert got.exceptAll(expect).count() == 0
        assert expect.exceptAll(got).count() == 0


def test_analyze_table_feeds_cbo_estimates(spark, sf_small):
    """ANALYZE TABLE + CBO: catalog statistics give the optimizer an
    EXACT table row count and a column-histogram-based selectivity for
    filters — the inputs cost-based join reordering and broadcast
    decisions run on. (File-size guessing, the fallback, knows bytes
    but not rows.)"""
    old = _with_confs(spark, {"spark.sql.cbo.enabled": "true"})
    try:
        o = spark.read.parquet(f"{sf_small}/orders.parquet")
        o.write.mode("overwrite").saveAsTable("cbo_orders")
        spark.sql(
            "ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR ALL COLUMNS"
        )
        n = o.count()
        full = spark.table("cbo_orders")
        full_stats = full._jdf.queryExecution().optimizedPlan().stats()
        assert full_stats.rowCount().get() == n  # exact, from the catalog

        filtered = full.filter(F.col("o_orderstatus") == "O")
        est = filtered._jdf.queryExecution().optimizedPlan().stats()
        assert est.rowCount().isDefined()
        assert 0 < est.rowCount().get() < n  # selectivity from column stats
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_orders")
        _restore_confs(spark, old)


def test_dynamic_partition_pruning(spark, sf_small, tmp_path):
    """Dynamic partition pruning: a runtime filter from the dim side
    prunes fact PARTITIONS (directories) the join cannot match — at
    100 TB, the difference between scanning one date partition and
    scanning the table. The pruning subquery must appear in the
    fact scan's partition filters."""
    o = spark.read.parquet(f"{sf_small}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "fact_part")
    o.write.partitionBy("status").parquet(path)
    dim = spark.createDataFrame(
        [("O", "open"), ("F", "finished"), ("P", "pending")],
        "status string, label string",
    )
    fact = spark.read.parquet(path)
    j = (
        fact.join(dim.filter(F.col("label") == "open"), "status")
        .groupBy("status")
        .count()
    )
    p = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in p.lower()
    assert j.collect()[0]["status"] == "O"


def test_sorted_layout_enables_row_group_skipping(spark, sf_small, tmp_path):
    """write_sorted_parquet gives files DISJOINT key ranges, so a
    selective range predicate overlaps O(1) files' footer stats; the
    same data hash-partitioned overlaps every file. This is what the
    pushed-down filter actually prunes against at scan time."""
    import pyarrow.parquet as pq
    import glob

    from aiports_data_warehouse_etl_spark.sources.io import write_sorted_parquet

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
    sorted_path = str(tmp_path / "li_sorted")
    hashed_path = str(tmp_path / "li_hashed")
    write_sorted_parquet(li, sorted_path, ["l_orderkey"], n_files=8)
    li.repartition(8).write.mode("overwrite").parquet(hashed_path)

    def key_ranges(path):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("l_orderkey")
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            out.append((min(los), max(his)))
        return out

    s_ranges, h_ranges = key_ranges(sorted_path), key_ranges(hashed_path)
    assert len(s_ranges) >= 4
    # disjoint ranges in the sorted layout (allowing the boundary key
    # to repeat across adjacent files: lineitem has ~4 rows/orderkey)
    s_ranges.sort()
    for (_, hi), (lo, _) in zip(s_ranges, s_ranges[1:]):
        assert lo >= hi - 1

    lo = s_ranges[0][0]
    hi_probe = lo + (s_ranges[0][1] - lo) // 2  # well inside file 0
    overlap = lambda rs: sum(1 for a, b in rs if a <= hi_probe and b >= lo)
    assert overlap(s_ranges) <= 2
    assert overlap(h_ranges) == len(h_ranges)  # hashed: every file touched

    # pushdown engages and results agree across layouts
    pred = (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") <= hi_probe)
    q = spark.read.parquet(sorted_path).filter(pred)
    p = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_orderkey)" in p
    n_sorted = q.count()
    assert n_sorted == spark.read.parquet(hashed_path).filter(pred).count()
    assert n_sorted > 0


def test_zorder_layout_skips_on_both_dims(spark, tmp_path):
    """write_zorder_parquet clusters on the Morton value of (x, y):
    every file covers a small rectangle, so footer stats prune files
    for a selective filter on EITHER column. The single-column sorted
    layout only prunes on its sort key — a y-filter touches every
    file there."""
    import glob

    import pyarrow.parquet as pq

    from aiports_data_warehouse_etl_spark.sources.io import (
        write_sorted_parquet,
        write_zorder_parquet,
    )

    # 256x256 dense grid: x and y independent and uniform
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).cast("int").alias("x"),
        (F.col("id") / 256).cast("int").alias("y"),
    )
    z_path = str(tmp_path / "zorder")
    x_path = str(tmp_path / "xsorted")
    write_zorder_parquet(grid, z_path, "x", "y", n_files=16)
    write_sorted_parquet(grid, x_path, ["x"], n_files=16)

    def ranges(path, col):
        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(st.min)
                his.append(st.max)
            out.append((min(los), max(his)))
        return out

    overlap = lambda rs, lo, hi: sum(1 for a, b in rs if a <= hi and b >= lo)

    # probe: a 32-wide band in each dimension (1/8 of the key space)
    zx, zy = ranges(z_path, "x"), ranges(z_path, "y")
    assert len(zx) >= 8
    # z-order: each file is a rectangle, so BOTH probes skip most files
    assert overlap(zx, 0, 31) <= len(zx) // 2
    assert overlap(zy, 0, 31) <= len(zy) // 2

    # x-sorted contrast: prunes on x but every file spans all of y
    sx, sy = ranges(x_path, "x"), ranges(x_path, "y")
    assert overlap(sx, 0, 31) <= len(sx) // 2
    assert overlap(sy, 0, 31) == len(sy)

    # correctness: identical band counts from both layouts
    for c in ("x", "y"):
        pred = (F.col(c) >= 0) & (F.col(c) <= 31)
        assert (
            spark.read.parquet(z_path).filter(pred).count()
            == spark.read.parquet(x_path).filter(pred).count()
            == 32 * 256
        )


def test_schema_evolution_mergeschema_read(spark, tmp_path):
    """Schema drift in a parquet lake: files written before a column
    existed must still be readable alongside new files. mergeSchema
    unifies the footers (missing column → NULL); the production
    posture — an EXPLICIT read schema — gets the same result without
    paying the all-footers scan, and widened types stay stable."""
    from pyspark.sql import types as T

    p = str(tmp_path / "evolving")
    spark.range(5).select(
        F.col("id").alias("k"), F.lit("v1").alias("source")
    ).write.parquet(p)
    spark.range(5, 8).select(
        F.col("id").alias("k"),
        F.lit("v2").alias("source"),
        (F.col("id") * 1.5).alias("quality"),  # column added in v2
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"k", "source", "quality"}
    assert merged.count() == 8
    # rows from before the column existed read as NULL
    assert merged.filter("source = 'v1' AND quality IS NULL").count() == 5
    assert merged.filter("source = 'v2' AND quality IS NOT NULL").count() == 3

    # explicit-schema read: same unified view, no footer merge pass
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("quality", T.DoubleType()),
        ]
    )
    explicit = spark.read.schema(schema).parquet(p)
    assert explicit.count() == 8
    assert explicit.filter("quality IS NULL").count() == 5
    a = {tuple(r) for r in merged.collect()}
    b = {tuple(r) for r in explicit.collect()}
    assert a == b


def test_jdbc_sink_source_roundtrip_embedded(spark, sf_small):
    """S6 JDBC sink + source, driven end-to-end against the embedded
    Derby that ships with Spark (no external endpoint needed): write a
    dimension, read it back both single-stream and as a PARTITIONED
    parallel scan (numPartitions + bounds — the scale path: each
    executor opens its own cursor over a key range), and append mode
    accumulates."""
    from aiports_data_warehouse_etl_spark.sources.io import write_jdbc

    url = "jdbc:derby:memory:jdbctest;create=true"
    nation = spark.read.parquet(f"{sf_small}/nation.parquet")
    write_jdbc(nation, url, "nation", mode="overwrite")

    back = spark.read.jdbc(url, "nation")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in nation.collect()}

    parallel = spark.read.jdbc(
        url,
        "nation",
        column="n_nationkey",
        lowerBound=0,
        upperBound=25,
        numPartitions=4,
    )
    assert parallel.rdd.getNumPartitions() == 4
    assert {tuple(r) for r in parallel.collect()} == {tuple(r) for r in nation.collect()}

    write_jdbc(nation, url, "nation", mode="append")
    assert spark.read.jdbc(url, "nation").count() == 2 * nation.count()


def test_compaction_rewrite_reduces_file_count(spark, sf_small, tmp_path):
    """Small-file compaction: a fragmented table (one file per row
    group of a 32-way write) rewritten through repartition(2) must
    land in 2 parquet files with identical data — the maintenance
    rewrite every long-lived 100 TB table needs to keep scan task
    counts sane."""
    import glob

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    nation = spark.read.parquet(f"{sf_small}/nation.parquet")
    nation.repartition(16).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 16

    spark.read.parquet(src).repartition(2).write.parquet(dst)
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == 2
    a = {tuple(r) for r in spark.read.parquet(src).collect()}
    b = {tuple(r) for r in spark.read.parquet(dst).collect()}
    assert a == b and len(a) == 25


def test_parameterized_sql_binding(spark, sf_small):
    """spark.sql named-parameter binding (the injection-safe way to
    template warehouse queries): the bound literal must behave exactly
    like the inlined one, including for values that would break naive
    string interpolation."""
    spark.read.parquet(f"{sf_small}/orders.parquet").createOrReplaceTempView(
        "p_orders"
    )
    bound = spark.sql(
        "SELECT count(*) AS n FROM p_orders "
        "WHERE o_orderpriority = :prio AND o_totalprice > :floor",
        args={"prio": "1-URGENT", "floor": 1000.0},
    ).collect()[0].n
    inlined = spark.sql(
        "SELECT count(*) AS n FROM p_orders "
        "WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 1000.0"
    ).collect()[0].n
    assert bound == inlined and bound > 0

    # a value full of SQL metacharacters binds as a plain string
    weird = "x' OR '1'='1; DROP TABLE p_orders --"
    n = spark.sql(
        "SELECT count(*) AS n FROM p_orders WHERE o_orderpriority = :p",
        args={"p": weird},
    ).collect()[0].n
    assert n == 0
    assert spark.sql("SELECT count(*) AS n FROM p_orders").collect()[0].n > 0


def test_scalable_row_id_stays_jvm_side(spark, sf_small):
    """with_scalable_row_id must not route rows through Python: r1's
    rdd.zipWithIndex version pickled every fact row JVM→Python→JVM.
    The rewrite is per-partition counts + broadcast offsets +
    row_number per partition — all JVM/codegen. The ids must be
    bit-identical to the single-window with_row_id reference."""
    from aiports_data_warehouse_etl_spark.functions.keys import (
        with_row_id,
        with_scalable_row_id,
    )

    li = spark.read.parquet(f"{sf_small}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    )
    order = ["l_orderkey", "l_linenumber"]
    scalable = with_scalable_row_id(li, order, "rid", start=7)

    p = plan(scalable)
    for banned in ("PythonRDD", "BatchEvalPython", "MapInPandas", "EvalPython"):
        assert banned not in p, f"{banned} found in plan:\n{p}"
    assert "BroadcastHashJoin" in p  # offset attach is a broadcast join

    expected = {
        (r.l_orderkey, r.l_linenumber): r.rid
        for r in with_row_id(li, order, "rid", start=7).collect()
    }
    got = {(r.l_orderkey, r.l_linenumber): r.rid for r in scalable.collect()}
    assert got == expected


def test_exact_substring_join_is_keyed(spark, sf_small):
    """dedup_exact_substring's pair join must be keyed on the window
    hash — never a nested-loop over doc pairs. r12: the rare-window
    join is additionally merge-pinned (the r12 --redo audit caught a
    436 MB / 2.4M-row estimate-driven broadcast of the corpus-sized
    rare table at sf1 — BENCH_NOTES r12 addendum 7), so the executed
    post-AQE plan must carry a SortMergeJoin."""
    df = QUERIES["dedup_exact_substring"].fn(spark, sf_small)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" in p, "rare-window merge pin lost"


def test_quality_classifier_is_pure_codegen(spark, sf_small):
    """The quality classifier is a scan-side expression — no Python
    eval nodes may appear (it must ride the ingest scan for free)."""
    p = plan(QUERIES["quality_classifier_score"].fn(spark, sf_small))
    for banned in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonRDD"):
        assert banned not in p, f"{banned} in plan"


def test_mixture_weights_broadcasts_scalars(spark, sf_small):
    """corpus_mixture_weights joins two 1-row scalar aggregates onto
    the per-source table — both must broadcast; a shuffle join against
    a scalar would be absurd at any scale."""
    p = plan(QUERIES["corpus_mixture_weights"].fn(spark, sf_small))
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_incremental_index_joins_are_keyed(spark, sf_small):
    """dedup_incremental_index: every join (band-index probe, semi-join
    prunes, verification) must be keyed — the delta batch meets the
    corpus only through the (band, key) equi-join."""
    p = plan(QUERIES["dedup_incremental_index"].fn(spark, sf_small))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_python_datasource_streams_microbatches(spark, tmp_path):
    """The same custom Python source serves readStream via the
    SimpleDataSourceStreamReader API: finite row space drains across
    multiple micro-batches, totals match the batch scan exactly, and
    the offset-range replay path regenerates identical rows."""
    from aiports_data_warehouse_etl_spark.sources.pyds import (
        _SyntheticEventsSimpleStreamReader,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", 500)
        .option("batch", 120)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT count(*) AS n, sum(event_id) AS s, round(sum(value), 2) AS v "
        "FROM pyds_stream"
    ).collect()[0]
    batch = (
        spark.read.format("synthetic_events").option("rows", 500).load()
        .agg(
            F.count("*").alias("n"),
            F.sum("event_id").alias("s"),
            F.round(F.sum("value"), 2).alias("v"),
        )
        .collect()[0]
    )
    assert (got.n, got.s, got.v) == (batch.n, batch.s, batch.v) == (500, 124750, batch.v)

    # failure-replay contract: re-reading an offset range is bit-identical
    r = _SyntheticEventsSimpleStreamReader({"rows": 500, "batch": 120})
    replay = list(r.readBetweenOffsets({"i": 120}, {"i": 240}))
    first, nxt = r.read({"i": 120})
    assert nxt == {"i": 240}
    assert replay == list(first)


def test_aqe_splits_skewed_join_partitions(spark, sf_small):
    """AQE's runtime skew-join handling is the engine's answer to hot
    keys a salt-free plan meets at 100 TB (SCALE.md Joins): with one
    key owning ~90% of the probe side, the post-execution adaptive
    plan must mark the sort-merge join's skewed side as split
    (`skew=true`) once the skew thresholds are crossed. Thresholds are
    scaled down so the small fixture crosses them the way a real
    partition would at cluster scale.

    Two real preconditions, learned the hard way and worth pinning:
    (1) the skewed side needs MULTIPLE map tasks — a hot reduce
    partition fed by one mapper is a single unsplittable block; (2)
    the rule pattern-matches Sort DIRECTLY over the shuffle stage on
    both sides, so a dim built via distinct() (final aggregate between
    sort and stage) silently disqualifies the join."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        ev = spark.read.parquet(f"{sf_small}/events.parquet").repartition(8)
        # ~2/3-hot probe side: most events collapse onto user 7; the
        # uuid pad keeps the hot partition incompressibly above the
        # scaled-down threshold, the way real rows would be at scale
        skewed = ev.select(
            F.when(F.col("event_id") % 3 != 0, F.lit(7))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "event_id",
            F.expr("repeat(uuid(), 40)").alias("pad"),
        )
        dim = spark.read.parquet(f"{sf_small}/customer.parquet").select(
            F.col("c_custkey").alias("user_id"), "c_name"
        )
        joined = skewed.join(dim, "user_id").select("user_id", "c_name", "pad")
        joined.collect()  # AQE finalizes the plan only on execution
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
        assert "AQEShuffleRead skewed" in final
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_strategy_hints_control_physical_operator(spark, sf_small):
    """The three join-strategy hints each produce their physical
    operator for the same logical join — the manual override lane when
    AQE's stats-driven choice is wrong for a workload (e.g. a 'small'
    dim that explodes after a filter at 100 TB)."""
    o = spark.read.parquet(f"{sf_small}/orders.parquet")
    c = spark.read.parquet(f"{sf_small}/customer.parquet")
    for hint, node in [
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ]:
        j = o.join(c.hint(hint), o.o_custkey == c.c_custkey)
        p = plan(j)
        assert node in p, f"hint {hint}: expected {node}\n{p[:1500]}"


def test_runtime_bloom_filter_join_reduction(spark, sf_small):
    """Runtime semi-join reduction: with a selective filter on the
    dimension side of a shuffle join, the optimizer injects a Bloom
    filter built from the dim keys and probes it (`might_contain`) on
    the fact side BEFORE the shuffle — at 100 TB this drops most fact
    rows at the scan instead of shuffling them. Thresholds scaled so
    the fixture qualifies."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_small}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_small}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        p = plan(j)
        assert "bloom_filter_agg" in p, "no bloom build side injected"
        assert "might_contain" in p, "no bloom probe on the fact side"
        # probe sits on the lineitem (application) side scan subtree
        probe_region = p.split("might_contain")[0]
        assert "lineitem" in probe_region or "l_orderkey" in p
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_market_basket_pairs_have_no_shuffle_join(spark, sf_small):
    """r3 rewrite: pair generation is a JVM array comprehension per
    basket (Generate/explode), never a lineitem self-join — the plan
    must contain no shuffle join at all."""
    p = plan(QUERIES["market_basket_lift"].fn(spark, sf_small))
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "Generate" in p  # the explode-based pair expansion


def test_simhash_pairs_have_no_postjoin_dedup(spark, sf_small):
    """r3 rewrite: a pair sharing several signature blocks is emitted
    only from the first shared block (a filter on the joined row), so
    the old post-join distinct() — a HashAggregate keyed on the pair
    — must be gone, and the only exchange left is the block-key
    shuffle feeding the self-join."""
    from aiports_data_warehouse_etl_spark.operators.dedup import (
        simhash_pairs,
    )
    from aiports_data_warehouse_etl_spark.sources.io import read_testdata

    docs = read_testdata(spark, sf_small, "documents")
    p = plan(simhash_pairs(docs))
    assert "keys=[id_a" not in p and "keys=[id_b" not in p
    assert p.count("HashAggregate") == 0


def test_matryoshka_uses_arrow_kernel_not_hof(spark, sf_small):
    """r7 rewrite (VERDICT r6 #2): both matryoshka cosine rankings go
    through ONE fused Arrow kernel — the plan must show exactly one
    Python boundary (ArrowEvalPython) and no interpreted HOF
    aggregate over the candidate pairs."""
    p = plan(QUERIES["emb_matryoshka_truncate"].fn(spark, sf_small))
    assert "ArrowEvalPython" in p
    assert "aggregate(" not in p and "zip_with(" not in p
    assert "BatchEvalPython" not in p  # no row-at-a-time Python


def test_fact_fact_joins_are_hint_pinned(spark, sf_small):
    """r10 cold-cache audit (tools/broadcast_audit.py): with cold
    parquet stats, the column-pruned estimates of fact-sized join
    sides slid under the 64 MB broadcast threshold in 8 registry
    queries and the planner shipped 146-549 MB broadcast builds
    (lineitem itself in Q3/Q4/Q5/Q21, the returned-lines slice in
    Q10, the exploded shingle index in minhash/ngram-jaccard, the
    phrase rollup in RAKE). Every such join now carries an explicit
    merge (TPC-H fact-fact) or shuffle_hash (corpus-derived
    equi-join) hint. Hints override size estimates, so the strategy
    is scale-independent and pinnable at sf_small: the physical plan
    must show the hinted strategy, never a broadcast, on those keys.

    Each query is collect()ed BEFORE the plan is inspected (ADVICE
    r10): the pre-execution executedPlan is only the INITIAL AQE
    plan, and a runtime replan that dropped the strategy would not be
    caught — after collect(), the inspected tree is the final
    post-AQE plan, the test_q12_fact_join_never_broadcasts standard."""
    merge_pins = {
        "tpch_q3_shipping_priority": "l_orderkey",
        "tpch_q4_priority_exists": "l_orderkey",
        "tpch_q5_local_supplier": "l_orderkey",
        "tpch_q10_returned_items": "l_orderkey",
        "tpch_q21_waiting_supplier": "l_orderkey",
        "tpch_q12_priority_by_year": "l_orderkey",
    }
    for name, key in merge_pins.items():
        df = QUERIES[name].fn(spark, sf_small)
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
        smj = [l for l in p.splitlines()
               if "SortMergeJoin" in l and key in l]
        assert smj, f"{name}: no SortMergeJoin on {key}\n{p[:2000]}"
        bad = [l for l in p.splitlines()
               if "BroadcastHashJoin" in l and key in l]
        assert not bad, f"{name}: fact join broadcast: {bad}"
    for name in ("dedup_ngram_jaccard", "text_keyphrase_rake",
                 "text_tfidf_top_terms"):
        df = QUERIES[name].fn(spark, sf_small)
        df.collect()
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin" in p, f"{name}: shuffle_hash hint lost"
    # r12: the minhash verify joins moved shuffle_hash -> merge (the
    # r11 sf10 A/B — merge 19.3/18.8 s vs SHJ 32.3/20.3 s, and the SHJ
    # build map cannot spill; BENCH_NOTES r11 addendum 3 / r12
    # addendum 1). Pin: the shingle-keyed verify joins are
    # SortMergeJoin, and the corpus-sized shingle side never
    # broadcasts.
    df = QUERIES["dedup_minhash_lsh"].fn(spark, sf_small)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    smj = [l for l in p.splitlines() if "SortMergeJoin" in l]
    assert smj, f"dedup_minhash_lsh: merge hint lost\n{p[:2000]}"
    bad = [l for l in p.splitlines()
           if "BroadcastHashJoin" in l and " s#" in l]
    assert not bad, f"dedup_minhash_lsh: shingle side broadcast: {bad}"


def test_q12_fact_join_never_broadcasts(spark, sf_small):
    """r10: Q12's orders↔lineitem join is fact-fact — the one big
    shuffle by design (SCALE.md). Without the merge hint, the
    column-pruned lineitem ESTIMATE slid under the 64 MB broadcast
    threshold at the 10× rehearsal and AQE shipped a 267 MiB / 6M-row
    fact broadcast (Q21's r9 estimate-driven class). Pin: the
    executed post-AQE plan contains a SortMergeJoin and no
    BroadcastHashJoin anywhere (neither side is ever dim-sized)."""
    df = QUERIES["tpch_q12_priority_by_year"].fn(spark, sf_small)
    df.collect()
    p = plan(df)
    assert "SortMergeJoin" in p
    assert "BroadcastHashJoin" not in p


def test_canonical_dedup_is_single_aggregate(spark, sf_small):
    """r10 rewrite: dedup_canonical_text must keep the min-id doc via
    min(struct(doc_id, source)) inside the ONE canonical-key
    aggregate — never a groupBy + join-back, which normalized every
    document twice (two regex passes + md5 per side) and shuffled
    the corpus twice (131 s for 500k docs in the two-decade probe,
    vs 33 s for this form). Pin: zero joins anywhere in the optimized
    plan, exactly one aggregate pair (partial+final)."""
    df = QUERIES["dedup_canonical_text"].fn(spark, sf_small)
    p = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in p
    assert "Aggregate" in p


def test_novelty_joins_at_doc_cardinality(spark, sf_small):
    """r9 rewrite: text_ngram_novelty must never join the owner table
    back to the shingle rows (vocabulary-by-shingle-cardinality once
    the vocabulary outgrows broadcast — 17.3x at the 10x rehearsal).
    n_novel comes from rolling the owner table up by first_doc, so
    the optimized plan has exactly ONE join, it is the left outer
    per-doc merge, and no join key is the shingle column."""
    df = QUERIES["text_ngram_novelty"].fn(spark, sf_small)
    p = df._jdf.queryExecution().optimizedPlan().toString()
    assert p.count("Join") == 1
    assert "LeftOuter" in p
    join_line = next(l for l in p.splitlines() if "Join" in l)
    assert "s#" not in join_line  # never keyed on the shingle string


def test_q10_aggregates_before_customer_join(spark, sf_small):
    """r9 rewrite: Q10's revenue rollup must run BELOW the customer
    join (aggregate-then-join, same posture as Q18) so the fact-side
    shuffle never carries customer strings and the dimension join
    happens at group cardinality."""
    df = QUERIES["tpch_q10_returned_items"].fn(spark, sf_small)
    p = df._jdf.queryExecution().optimizedPlan().toString()
    agg_pos = p.find("Aggregate")
    join_pos = p.find("Join")
    assert agg_pos != -1 and join_pos != -1
    assert agg_pos > join_pos  # aggregate nested under (runs before) joins

"""Scale probe for the txlog/matview demo family's DATA-BEARING steps
(VERDICT r10 #6): the registry demos measure multi-commit protocol
latency, so the two-decade ledger excluded them — which left the
O(changed-rows) / O(k-files) claims in SCALE.md asserted, not
measured. This probe measures exactly those claims: a FIXED-SIZE
change (2,000 merge keys / one 20k-key slice / a 10k-row delta)
applied to a base table that grows 100× across sf0.1 → sf1 → sf10.

- merge_upsert (SCALE.md "MERGE (upsert) on the transaction log"):
  base clustered on the merge key (append cluster_by), source touches
  a fixed key range → step cost and files-rewritten should stay O(k),
  flat, while the base grows 100×.
- replace_where (SCALE.md "Row-level DML"): fixed predicate slice →
  rewrite cost O(slice files); the probe also measures the candidate
  SCAN (finding the matched files), which is the part that could
  silently be O(table).
- matview incremental refresh (SCALE.md "Incremental materialized
  views"): fixed 10k-row delta folded into a per-type aggregate →
  O(changed rows + view cardinality), flat across decades; the
  INITIAL build is the only O(source) step and is recorded
  separately.

Usage: python tools/scale_demos.py [sf0.1|sf1|sf10 ...]
Writes SCALE_DEMOS.json at the repo root (merging over prior runs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402
from aiports_data_warehouse_etl_spark.sources.txlog import TxLogTable  # noqa: E402
from aiports_data_warehouse_etl_spark.streaming.matview import (  # noqa: E402
    IncrementalAggView,
)

SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/tmp/sf1",
    "sf10": "/tmp/sf10",
}

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_DEMOS.json",
)


def _commit(t: TxLogTable, version: int) -> dict:
    return t._read_commit(version)


def probe_merge_and_replace(spark, sf_dir: str) -> dict:
    """One clustered orders table per scale; fixed 2,000-key MERGE and
    fixed 20k-key-slice replace_where against it."""
    root = tempfile.mkdtemp(prefix="scale_demo_merge_")
    try:
        o = (
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
        )
        n = o.count()
        t = TxLogTable(spark, root + "/orders_t")
        # file count grows with the base (like a real table); the fixed
        # key range then covers a shrinking FRACTION of files
        parts = max(8, n // 250_000)
        t0 = time.perf_counter()
        t.append(o, cluster_by=["o_orderkey"], cluster_partitions=parts)
        setup_sec = round(time.perf_counter() - t0, 2)
        files_total = len(t._snapshot()["files"])

        src = o.filter("o_orderkey < 20000 AND o_orderkey % 10 = 0").withColumn(
            "o_totalprice", F.col("o_totalprice") * 2
        )
        k = src.count()
        t0 = time.perf_counter()
        v = t.merge_upsert(src, keys=["o_orderkey"])
        merge_sec = round(time.perf_counter() - t0, 2)
        c = _commit(t, v)
        merge = {
            "base_rows": n,
            "files_total": files_total,
            "setup_sec": setup_sec,
            "keys": k,
            "step_sec": merge_sec,
            "files_rewritten": len(c.get("remove", [])),
            "files_added": len(c.get("add", [])),
        }

        # fixed-size slice, repartitioned like a real backfill job
        # would (the incoming df's partitioning is the CALLER's —
        # replace_where stages it as-is, matching Delta replaceWhere;
        # without this the probe would measure the filtered scan's
        # split count, not the engine)
        rep = (
            o.filter("o_orderkey < 20000")
            .withColumn("o_totalprice", F.col("o_totalprice") * 3)
            .repartition(2)
        )
        rows_in = rep.count()
        t0 = time.perf_counter()
        v = t.replace_where(rep, "o_orderkey < 20000")
        rep_sec = round(time.perf_counter() - t0, 2)
        c = _commit(t, v)
        replace = {
            "base_rows": n,
            "slice_rows": rows_in,
            "step_sec": rep_sec,
            "files_rewritten": len(c.get("remove", [])),
            "files_added": len(c.get("add", [])),
        }
        return {"tlog_merge_upsert_step": merge,
                "tlog_replace_where_step": replace}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_dml_skipping(spark, sf_dir: str) -> dict:
    """VERDICT r11 #4: the r11 data-skipping DML features (footer-stat
    predicate/key candidate discovery + bloom-assisted MERGE,
    sources/txlog.py) have soundness tests but need SCALE rows —
    files-OPENED vs files-TOTAL for a fixed slice DELETE, a fixed
    slice UPDATE, a 2,000-key clustered MERGE, and a 2,000-key
    SCATTERED merge probe with a bloom index, all against a
    key-clustered base growing 100×. The claim being measured:
    candidate count stays O(slice files) (flat) while files_total
    grows with the decade."""
    root = tempfile.mkdtemp(prefix="scale_demo_skip_")
    try:
        o = (
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
        )
        n = o.count()
        t = TxLogTable(spark, root + "/orders_t")
        parts = max(8, n // 250_000)
        t.append(o, cluster_by=["o_orderkey"], cluster_partitions=parts)
        t.add_bloom_index("o_orderkey")
        base = t._snapshot()
        files_total = len(base["files"])

        out: dict = {}

        # fixed-slice DELETE: candidates from footer stats, then the
        # actual COW delete
        pred = "o_orderkey >= 1000 AND o_orderkey < 20000"
        cand = t._predicate_candidates(base, pred)
        t0 = time.perf_counter()
        v = t.delete_where(pred)
        sec = round(time.perf_counter() - t0, 2)
        c = _commit(t, v)
        out["tlog_delete_skipping_step"] = {
            "base_rows": n,
            "files_total": files_total,
            "candidate_files": len(cand),
            "files_rewritten": len(c.get("remove", [])),
            "step_sec": sec,
        }

        # fixed-slice UPDATE on a disjoint band
        pred_u = "o_orderkey >= 30000 AND o_orderkey < 50000"
        base = t._snapshot()
        cand_u = t._predicate_candidates(base, pred_u)
        t0 = time.perf_counter()
        v = t.update_where(
            pred_u, {"o_totalprice": "o_totalprice * 1.1"}
        )
        sec = round(time.perf_counter() - t0, 2)
        c = _commit(t, v)
        out["tlog_update_skipping_step"] = {
            "base_rows": n,
            "files_total": len(base["files"]),
            "candidate_files": len(cand_u),
            "files_rewritten": len(c.get("remove", [])),
            "step_sec": sec,
        }

        # 2,000-key CLUSTERED merge: key-range pruning does the work
        src = o.filter(
            "o_orderkey >= 60000 AND o_orderkey < 80000 "
            "AND o_orderkey % 10 = 0"
        ).withColumn("o_totalprice", F.col("o_totalprice") * 2)
        k = src.count()
        base = t._snapshot()
        cand_m = t._key_candidates(base, src, ["o_orderkey"])
        t0 = time.perf_counter()
        v = t.merge_upsert(src, keys=["o_orderkey"])
        sec = round(time.perf_counter() - t0, 2)
        c = _commit(t, v)
        out["tlog_merge_skipping_step"] = {
            "base_rows": n,
            "files_total": len(base["files"]),
            "keys": k,
            "candidate_files": len(cand_m),
            "files_rewritten": len(c.get("remove", [])),
            "step_sec": sec,
        }

        # Bloom-assisted discovery, probed in ITS regime — a POINT-ISH
        # delta against a GAPPED keyspace (even keys only; the
        # synthetic decades' orderkeys are dense, real tables rarely
        # are): 16 odd, IN-RANGE, absent keys. Range pruning is blind
        # (every clustered file's [min, max] covers odd keys), so
        # discovery must fall to the per-file BLOOM index
        # (fpp=0.001), which prunes ~everything — expected false
        # keeps ≈ files × (1-(1-fpp)^16) ≈ 1.6%. The companion
        # `keys_2000` row is the honesty case that FOUND the r12
        # FP-accumulation bail: at K=2000 the expected false-keep
        # rate is ~100%, the index cannot prune, and the engine now
        # skips the wasted probe (candidates = files_total by
        # design, discovery ~instant).
        t2 = TxLogTable(spark, root + "/orders_even_t")
        even = o.filter("o_orderkey % 2 = 0")
        n2 = even.count()
        t2.append(
            even,
            cluster_by=["o_orderkey"],
            cluster_partitions=max(8, n2 // 250_000),
        )
        t2.add_bloom_index("o_orderkey", fpp=0.001)
        base2 = t2._snapshot()
        hi = n2 * 2  # even-key table spans [0, 2*n2)
        absent16 = spark.createDataFrame(
            [(((i * hi) // 16) | 1,) for i in range(16)],
            "o_orderkey long",
        )
        ka = absent16.count()
        t0 = time.perf_counter()
        cand_a = t2._key_candidates(base2, absent16, ["o_orderkey"])
        disc_sec = round(time.perf_counter() - t0, 2)
        scat2000 = spark.createDataFrame(
            [(((i * hi) // 2000) | 1,) for i in range(2000)],
            "o_orderkey long",
        )
        k2 = scat2000.count()
        t0 = time.perf_counter()
        cand_2k = t2._key_candidates(base2, scat2000, ["o_orderkey"])
        disc2k_sec = round(time.perf_counter() - t0, 2)
        out["tlog_merge_bloom_discovery"] = {
            "base_rows": n2,
            "files_total": len(base2["files"]),
            "keys_absent_pointish": ka,
            "candidate_files_pointish": len(cand_a),
            "discovery_sec_pointish": disc_sec,
            "keys_absent_2000": k2,
            "candidate_files_2000": len(cand_2k),
            "discovery_sec_2000": disc2k_sec,
        }
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_streaming_steps(spark, sf_dir: str) -> dict:
    """VERDICT r11 #5: the four streaming demos were excluded from the
    wall-clock ledgers (their registry wall-clock is multi-commit
    protocol latency), so their scale posture had NO rows. Measure
    the scale_demos way: the per-microbatch DATA-BEARING step on a
    FIXED delta against a base grown 100× —
    - txlog CDF source: drain a fixed 10k-row append through the
      change-feed stream, starting from the post-base version (the
      stream plans partitions off the JSON commit log, so the step
      must not grow with base files);
    - foreachBatch → append_batch_txn: one micro-batch landing a
      fixed 10k-row delta in a table already holding the base;
    - native txlog sink: same fixed delta through the Python Data
      Source write path;
    - streaming matview maintenance: fold the fixed delta's change
      feed into a view built over the base.
    Each row records step_sec; flat across decades = the claim."""
    from aiports_data_warehouse_etl_spark.sources.txlog_sink import (
        register_txlog_sink,
    )
    from aiports_data_warehouse_etl_spark.sources.txlog_stream import (
        register_txlog_cdf,
    )

    root = tempfile.mkdtemp(prefix="scale_demo_stream_")
    try:
        o = (
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
        )
        n = o.count()
        delta = (
            o.limit(10_000)
            .withColumn("o_orderkey", F.col("o_orderkey") + 2_000_000_000)
        )
        d = delta.count()
        out: dict = {}

        # --- CDF source: fixed-delta drain from the post-base version
        t = TxLogTable(spark, root + "/cdf_t")
        t.append(o.repartition(8))
        base_v = t._snapshot()["version"]
        t.append(delta.repartition(2))
        register_txlog_cdf(spark)
        feed_dir = root + "/cdf_out"
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("txlog_cdf")
            .option("path", t.path)
            .option("start_version", base_v)
            .load()
            .writeStream.foreachBatch(
                lambda df, _b: df.write.mode("append").parquet(feed_dir)
            )
            .option("checkpointLocation", root + "/cdf_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("cdf step drain timed out")
        sec = round(time.perf_counter() - t0, 2)
        fed = spark.read.parquet(feed_dir).count()
        out["stream_cdf_source_step"] = {
            "base_rows": n,
            "delta_rows": d,
            "feed_rows": fed,
            "step_sec": sec,
        }

        # --- foreachBatch exactly-once sink: fixed-delta micro-batch
        t2 = TxLogTable(spark, root + "/fb_t")
        t2.append(o.repartition(8))
        in_dir = root + "/fb_in"
        delta.repartition(2).write.parquet(in_dir)
        stream = (
            spark.readStream.schema(delta.schema).parquet(in_dir)
        )
        t0 = time.perf_counter()
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: t2.append_batch_txn(
                    df, "scale_demo", int(bid)
                )
            )
            .option("checkpointLocation", root + "/fb_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("foreachBatch step drain timed out")
        sec = round(time.perf_counter() - t0, 2)
        out["stream_foreachbatch_step"] = {
            "base_rows": n,
            "delta_rows": d,
            "rows_after": t2.count_rows(),
            "step_sec": sec,
        }

        # --- native Python Data Source sink: same fixed delta
        t3 = TxLogTable(spark, root + "/ns_t")
        t3.append(o.repartition(8))
        register_txlog_sink(spark)
        ns_in = root + "/ns_in"
        delta.repartition(2).write.parquet(ns_in)
        t0 = time.perf_counter()
        q = (
            spark.readStream.schema(delta.schema)
            .parquet(ns_in)
            .writeStream.format("txlog")
            .option("path", t3.path)
            .option("checkpointLocation", root + "/ns_ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("native sink step drain timed out")
        sec = round(time.perf_counter() - t0, 2)
        out["stream_native_sink_step"] = {
            "base_rows": n,
            "delta_rows": d,
            "rows_after": t3.count_rows(),
            "step_sec": sec,
        }

        # --- streaming matview maintenance: fold the fixed delta's
        # change feed into a view built over the base
        t4 = TxLogTable(spark, root + "/mv_t")
        mv = IncrementalAggView(
            spark,
            t4,
            root + "/mv_view",
            group_cols=["o_orderstatus"],
            sum_cols=["o_totalprice"],
        )
        t4.append(o.repartition(8))
        mv.refresh()  # batch initial build (O(base) by design)
        t4.append(delta.repartition(2))
        t0 = time.perf_counter()
        q = mv.maintain_streaming(root + "/mv_ckpt")
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("matview step drain timed out")
        sec = round(time.perf_counter() - t0, 2)
        out["stream_matview_maintenance_step"] = {
            "base_rows": n,
            "delta_rows": d,
            "view_groups": mv.read().count(),
            "step_sec": sec,
        }
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def probe_matview(spark, sf_dir: str) -> dict:
    """events → per-type (count, sum) view; initial build is O(source)
    by design, the incremental step folds a fixed 10k-row delta."""
    root = tempfile.mkdtemp(prefix="scale_demo_mv_")
    try:
        e = (
            spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            .select("event_id", "event_type", "value")
        )
        n = e.count()
        src = TxLogTable(spark, root + "/events_t")
        t0 = time.perf_counter()
        src.append(e)
        setup_sec = round(time.perf_counter() - t0, 2)

        view = IncrementalAggView(
            spark, src, root + "/mv", ["event_type"], ["value"]
        )
        t0 = time.perf_counter()
        view.refresh()
        initial_sec = round(time.perf_counter() - t0, 2)

        delta = e.filter("event_id % 7 = 0").limit(10_000).withColumn(
            "event_id", F.col("event_id") + 1_000_000_000
        )
        d = delta.count()
        src.append(delta)
        t0 = time.perf_counter()
        view.refresh()
        step_sec = round(time.perf_counter() - t0, 2)
        groups = view.read().count()
        return {
            "matview_incremental_refresh_step": {
                "base_rows": n,
                "setup_sec": setup_sec,
                "initial_build_sec": initial_sec,
                "delta_rows": d,
                "step_sec": step_sec,
                "view_groups": groups,
            }
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "32g"
            )
        }
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            out = json.load(f)
    for scale, sf_dir in SCALES.items():
        if only and scale not in only:
            continue
        if not os.path.isdir(sf_dir):
            print(f"{scale}: {sf_dir} missing, skipped", flush=True)
            continue
        row = out.setdefault(scale, {})
        row.update(probe_merge_and_replace(spark, sf_dir))
        row.update(probe_matview(spark, sf_dir))
        row.update(probe_dml_skipping(spark, sf_dir))
        row.update(probe_streaming_steps(spark, sf_dir))
        print(scale, json.dumps(row), flush=True)
        with open(OUT_PATH, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(f"-> {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()

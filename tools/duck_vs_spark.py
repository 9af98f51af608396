"""Head-to-head: this engine vs DuckDB running the SAME semantics.

For every oracled registry query, the oracle SQL *is* the DuckDB
implementation — so timing Spark's DataFrame plan against DuckDB
executing the oracle at the same SF is a like-for-like engine
comparison, the criterion BASELINE.md sets (≤2× DuckDB wall-clock).

Usage: python tools/duck_vs_spark.py [sf_dir] [n_heaviest]
Times the N heaviest queries from BENCH_FULL.json (default 25) plus
the full shared-set totals, best-of-2 per engine, and prints a
markdown table ready for BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from oracle import duckdb_con  # noqa: E402

from aiports_data_warehouse_etl_spark.queries import (  # noqa: E402
    FEATURE_DEMOS,
    QUERIES,
)
from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402


def best_of(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    with open("BENCH_FULL.json") as f:
        bench = json.load(f)["queries"]
    # engine-comparable set only: FEATURE_DEMOS' Spark side does
    # commits/streams/decodes the oracle never performs, so their
    # wall-clock ratio is not engine-vs-engine (they're timed in a
    # separate table below for transparency)
    oracled = [
        n
        for n in bench
        if QUERIES.get(n) and QUERIES[n].oracle and n not in FEATURE_DEMOS
    ]
    top = sorted(oracled, key=lambda n: -bench[n])[:n_top]
    demo_top = sorted(
        (n for n in bench if n in FEATURE_DEMOS and QUERIES[n].oracle),
        key=lambda n: -bench[n],
    )[:n_top]

    spark = get_spark(
        extra_conf={"spark.driver.memory":
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")}
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(sf_dir)

    rows = []
    for name in top:
        spec = QUERIES[name]
        # collect(), not count(): DuckDB's side runs fetchall(), and
        # count() would let Spark prune columns / skip materializing
        # output rows — biasing the ratio Spark-ward (ADVICE r3)
        s = best_of(lambda: spec.fn(spark, sf_dir).collect())
        spark.catalog.clearCache()
        d = best_of(lambda: con.execute(spec.oracle).fetchall())
        rows.append((name, s, d))
        print(f"  {name}: spark {s:.2f}s duckdb {d:.2f}s", file=sys.stderr)

    st = sum(r[1] for r in rows)
    dt = sum(r[2] for r in rows)
    print(
        f"\n| Query (top {n_top} heaviest engine-comparable oracled) "
        "| Spark | DuckDB | ratio |"
    )
    print("|---|---|---|---|")
    for name, s, d in sorted(rows, key=lambda r: -(r[1])):
        print(f"| {name} | {s:.2f} s | {d:.2f} s | {s / max(d, 1e-9):.2f}x |")
    print(f"| **TOTAL** | **{st:.1f} s** | **{dt:.1f} s** | "
          f"**{st / max(dt, 1e-9):.2f}x** |")

    # feature demos, timed separately: the Spark number includes the
    # feature work (commits / streams / decodes); the DuckDB number is
    # just the final-state aggregate — NOT an engine comparison, shown
    # so nothing is hidden
    drows = []
    for name in demo_top:
        spec = QUERIES[name]
        s = best_of(lambda: spec.fn(spark, sf_dir).collect())
        spark.catalog.clearCache()
        d = best_of(lambda: con.execute(spec.oracle).fetchall())
        drows.append((name, s, d))
        print(f"  [demo] {name}: spark {s:.2f}s duckdb {d:.2f}s",
              file=sys.stderr)
    print("\n| Feature demo (Spark does the feature work; DuckDB only "
          "recomputes the final state — not engine-comparable) | Spark "
          "| DuckDB final-state check |")
    print("|---|---|---|")
    for name, s, d in sorted(drows, key=lambda r: -(r[1])):
        print(f"| {name} | {s:.2f} s | {d:.2f} s |")


if __name__ == "__main__":
    main()

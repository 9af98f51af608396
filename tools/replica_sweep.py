"""Replicate the driver's CORRECTNESS gate locally: run every oracled
registry query on Spark and DuckDB at a given sf dir, compare, and time.

Usage: python tools/replica_sweep.py [sf_dir] [query_name ...]
                                     [--out=FILE.json]

With --out, the full per-query result map (status / sec / problems)
is written as a committed-artifact-shaped JSON — the interim
evidence VERDICT r6 #1 asked for while the driver's 50-slot windows
catch up with the registry.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from oracle import compare_query, duckdb_con  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--out=")]
    out_path = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--out=")),
        None,
    )
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    qs = entry.queries()
    oracles = entry.oracle_sql()
    # mirror bench.py's heap: the local-mode default 1g driver is too
    # small for sf0.1 audits (broadcast builds + caches OOM with
    # "unread block data" / "not enough memory to broadcast" artifacts
    # that are harness limits, not plan defects)
    import os as _os

    spark = get_spark(
        extra_conf={
            "spark.driver.memory": _os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "32g"
            )
        }
    )
    con = duckdb_con(sf_dir)
    t0 = time.time()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                problems = compare_query(df, con, oracles[name])
            else:
                n = df.count()
                problems = [] if n >= 0 else ["negative count?"]
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXC {type(exc).__name__}: {exc}"]
        dt = time.time() - t
        status = "ok" if not problems else "FAIL"
        results[name] = {"status": status, "sec": round(dt, 2), "problems": problems[:5]}
        print(f"{status:4s} {dt:7.2f}s {name}" + ("" if not problems else f"  {problems[:2]}"), flush=True)
    total = time.time() - t0
    fails = {k: v for k, v in results.items() if v["status"] != "ok"}
    print(f"\nTOTAL {total:.1f}s  {len(results)} queries  {len(fails)} failures")
    if fails:
        print(json.dumps(fails, indent=2))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "total_sec": round(total, 1),
                    "n_queries": len(results),
                    "n_failures": len(fails),
                    "results": results,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

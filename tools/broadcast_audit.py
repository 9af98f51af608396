"""Registry-wide fact-broadcast audit (r10, reproducible edition).

Runs every non-demo registry query at a given sf_dir (default the 10x
/tmp/sf1), executes it, and scans the post-AQE executed plan's
materialized BroadcastQueryStage statistics for build sides above a
row-count ceiling (default 2M ≈ order cardinality at sf1). This is
the check that caught Q21's estimate-driven 267 MiB fact broadcast in
r9 — but the r9 sweep was ad hoc and run-state-dependent (plan choice
flips with cache-materialization order), so it missed Q12's identical
slide; this committed version clears the cache before every query so
each plan is chosen from the same cold state, and prints every
broadcast stage it sees (not just the flagged ones) so "zero flagged"
is auditable rather than asserted.

Usage: python tools/broadcast_audit.py [sf_dir] [--max-rows=N]
                                       [name ...]
Writes BROADCAST_AUDIT.json at the repo root.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, ".")

from aiports_data_warehouse_etl_spark.queries import QUERIES  # noqa: E402
from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402

DEMO_PREFIXES = ("tlog_", "matview_", "stream_")
STAGE_RE = re.compile(
    r"BroadcastQueryStage \(\d+\), Statistics\(sizeInBytes=([^,]+), "
    r"rowCount=([\d.E+]+)\)"
)

OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BROADCAST_AUDIT.json")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_rows = next(
        (float(a.split("=", 1)[1]) for a in sys.argv[1:]
         if a.startswith("--max-rows=")),
        2_000_000.0,
    )
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/tmp/sf1"
    only = set(args[1:]) if args and os.path.isdir(args[0]) else set(args)

    spark = get_spark(
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "32g"
            )
        }
    )
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    out: dict = {"sf_dir": sf_dir, "max_rows": max_rows,
                 "flagged": {}, "stages": {}, "errors": {}}
    names = [
        n for n in QUERIES
        if not n.startswith(DEMO_PREFIXES) and (not only or n in only)
    ]
    for i, name in enumerate(names):
        spark.catalog.clearCache()
        try:
            df = QUERIES[name].fn(spark, sf_dir)
            df.count()  # materialize AQE stages
            p = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:
            out["errors"][name] = str(ex).split("\n")[0][:160]
            continue
        stages = [
            {"size": sz.strip(), "rows": float(rc)}
            for sz, rc in STAGE_RE.findall(p)
        ]
        if stages:
            out["stages"][name] = stages
        bad = [s for s in stages if s["rows"] > max_rows]
        if bad:
            out["flagged"][name] = bad
            print(f"FLAGGED {name}: {bad}", flush=True)
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(names)} audited "
                  f"({len(out['flagged'])} flagged)", flush=True)
        with open(OUT_PATH, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    print(f"AUDIT DONE: {len(names)} queries, "
          f"{len(out['flagged'])} flagged, "
          f"{len(out['errors'])} errors -> {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()

"""Dump `.explain("formatted")` for registry queries to files.

Usage: python tools/explain_dump.py <out_dir> <query_name ...> [--suffix=_before]

Writes <out_dir>/<query><suffix>.txt per query. Queries whose fn
executes side effects (tlog demos) still return a DataFrame — the
dump captures that frame's plan; for latency-bound demo queries the
companion evidence is tools/profile_query.py's per-action table.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aiports_data_warehouse_etl_spark.queries import QUERIES  # noqa: E402
from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    suffix = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--suffix=")),
        "",
    )
    out_dir, names = args[0], args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        app_name="explain_dump", extra_conf={"spark.driver.memory": "32g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()

"""Dump explain('formatted') for the incremental-view refresh's
commit plan under both merge shapes (r13 union-aggregate vs r12
fold + full-outer join) into plans/r13/.

The matview registry queries are multi-action demos, so there is no
single query plan to dump; this harness reconstructs the refresh's
view-overwrite plan — the plan every refresh stages — on a sample
table with a delete slice (rescan path included), and writes
matview_merge_before.txt (r12 join shape) / matview_merge_after.txt
(r13 union-agg shape).

Usage: python tools/dump_matview_merge_plan.py
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402
from aiports_data_warehouse_etl_spark.sources.txlog import TxLogTable  # noqa: E402
from aiports_data_warehouse_etl_spark.streaming.matview import (  # noqa: E402
    IncrementalAggView,
)

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r13",
)


def build(spark, root: str):
    t = TxLogTable(spark, root + "/src")
    mv = IncrementalAggView(
        spark,
        t,
        root + "/view",
        group_cols=["k"],
        sum_cols=["v"],
        min_cols=["v"],
        max_cols=["v"],
    )
    rows = [(f"k{i % 3}", float(i)) for i in range(300)]
    t.append(spark.createDataFrame(rows, "k string, v double"))
    mv.refresh()  # initial build
    t.append(
        spark.createDataFrame([("k0", -5.0)], "k string, v double")
    )
    t.delete_where_dv("v >= 297.0")  # bound-hitting delete slice
    return t, mv


def plan_of(spark, mv, t) -> str:
    """The refresh's final commit plan (rescan path included),
    captured instead of committed."""
    last = mv.last_applied_version()
    cur = t.latest_version()
    feed = t.changes(last, cur)
    may = mv._slice_may_delete(last, cur)
    captured: list[str] = []
    orig = mv.view.overwrite_batch_txn

    def spy(df, app, txn):
        captured.append(
            df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        return orig(df, app, txn)

    mv.view.overwrite_batch_txn = spy
    try:
        mv._apply(feed, cur, may_delete=may)
    finally:
        mv.view.overwrite_batch_txn = orig
    return captured[0]


def main() -> None:
    spark = get_spark(
        app_name="mv-plan", extra_conf={"spark.driver.memory": "8g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    for tag, env in (
        ("after", None),
        ("before", "1"),
    ):
        if env is None:
            os.environ.pop("SPARK_GRAFT_MV_JOIN_MERGE", None)
        else:
            os.environ["SPARK_GRAFT_MV_JOIN_MERGE"] = env
        root = tempfile.mkdtemp(prefix=f"mvplan_{tag}_")
        try:
            t, mv = build(spark, root)
            plan = plan_of(spark, mv, t)
            out = os.path.join(OUT_DIR, f"matview_merge_{tag}.txt")
            with open(out, "w") as fh:
                fh.write(plan)
            n_ex = plan.count("Exchange")
            n_smj = plan.count("SortMergeJoin")
            print(f"{tag}: Exchange×{n_ex} SortMergeJoin×{n_smj} -> {out}")
        finally:
            shutil.rmtree(root, ignore_errors=True)
    os.environ.pop("SPARK_GRAFT_MV_JOIN_MERGE", None)


if __name__ == "__main__":
    main()

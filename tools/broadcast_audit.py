"""Registry-wide fact-broadcast audit (r10, reproducible edition).

For every non-demo registry query at a given sf_dir (default the 10x
/tmp/sf1): execute the query's OWN physical plan instance and read
each BroadcastExchangeExec's ACTUAL built metrics (numOutputRows,
dataSize) off that instance, flagging build sides above a row-count
ceiling (default 2M ≈ order cardinality at sf1).

Two lessons are baked in from the audits this replaced:

1. The r9 sweep was ad hoc and run-state-dependent — plan choice
   flips with cache-materialization order — so it reported "zero
   fact-sized broadcasts" while Q12's column-pruned lineitem estimate
   slid under the 64 MB threshold and AQE shipped a 267 MiB / 6M-row
   fact broadcast. This version clears the cache before every query
   so each plan is chosen from the same cold state.
2. Regexing formatted-explain BroadcastQueryStage statistics is BLIND
   to static broadcasts: shuffle-free plans skip AQE entirely and
   print bare BroadcastExchange nodes with no statistics (the first
   r10 cut saw broadcast stages in exactly 1 of 222 queries — a
   vacuous pass). Walking the executed-plan tree and reading the
   exchange metrics covers static AND adaptive broadcasts, with the
   rows that were ACTUALLY built, not estimates. The plan must be
   driven through its own instance (``executedPlan().execute()``) —
   ``df.count()`` runs a different QueryExecution and leaves these
   metrics at zero.

Usage: python tools/broadcast_audit.py [sf_dir] [--max-rows=N]
                                       [--resume] [--redo] [--limit=N]
                                       [name ...]
Writes BROADCAST_AUDIT.json at the repo root. Every broadcast seen is
recorded (not just the flagged ones) so a zero-flag result is
auditable rather than asserted.

``--resume`` merges over the existing artifact, auditing only queries
without a row yet; ``--limit=N`` stops after N new queries. Together
they let a driver loop run the registry in fresh-process chunks:

    while python tools/broadcast_audit.py /tmp/sf1 --resume --limit=40 \
          | grep -q "AUDITING [1-9]"; do :; done

which matters because a single 222-query session hit a reproducible
long-session stall (a tail query whose per-row CPU blew up ~1000x
after ~200 prior queries in the same JVM — standalone the same query
audits in seconds). Chunked fresh processes sidestep the cumulative
session state and make the sweep crash-resumable.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

from aiports_data_warehouse_etl_spark.queries import QUERIES  # noqa: E402
from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402

DEMO_PREFIXES = ("tlog_", "matview_", "stream_")

OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BROADCAST_AUDIT.json")


def _walk(n):
    """Yield every physical node, descending through AQE wrappers."""
    yield n
    cls = n.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        yield from _walk(n.executedPlan())
        return
    if cls.endswith("QueryStageExec"):
        yield from _walk(n.plan())
        return
    if cls == "ReusedExchangeExec":
        yield from _walk(n.child())
        return
    ch = n.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))


def broadcast_builds(df, timeout_sec: float | None = None) -> list[dict]:
    """Execute df's own plan instance; return each broadcast build's
    actual (rows, bytes). ``timeout_sec`` arms a watchdog that
    cancels the Spark jobs if the RDD-driving pass stalls (r12: a
    full fresh sweep hung >20 min on one query whose
    ``ep.execute()`` path is far slower than its normal collect —
    the audit must bound each query so one outlier can't eat the
    run; a timed-out query records an error row and the sweep moves
    on)."""
    import threading

    ep = df._jdf.queryExecution().executedPlan()
    timer = None
    if timeout_sec:
        sc = df.sparkSession.sparkContext
        timer = threading.Timer(timeout_sec, sc.cancelAllJobs)
        timer.daemon = True
        timer.start()
    try:
        ep.execute().count()  # drive THIS instance's metric accumulators
    finally:
        if timer is not None:
            timer.cancel()
    builds = []
    for n in _walk(ep):
        if n.getClass().getSimpleName() == "BroadcastExchangeExec":
            m = n.metrics()
            builds.append({
                "rows": int(m.get("numOutputRows").get().value()),
                "bytes": int(m.get("dataSize").get().value()),
            })
    return builds


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    max_rows = next(
        (float(a.split("=", 1)[1]) for a in sys.argv[1:]
         if a.startswith("--max-rows=")),
        2_000_000.0,
    )
    resume = "--resume" in sys.argv[1:]
    redo = "--redo" in sys.argv[1:]
    limit = next(
        (int(a.split("=", 1)[1]) for a in sys.argv[1:]
         if a.startswith("--limit=")),
        None,
    )
    q_timeout = next(
        (float(a.split("=", 1)[1]) for a in sys.argv[1:]
         if a.startswith("--query-timeout=")),
        300.0,
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

    out: dict = {"sf_dir": sf_dir, "max_rows": max_rows,
                 "method": "executed-plan walk, actual exchange metrics",
                 "audited": [], "flagged": {}, "builds": {}, "errors": {}}
    if resume and os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            prior = json.load(f)
        if prior.get("sf_dir") == sf_dir:
            out = prior
            out.setdefault("audited", [])
            # Re-derive the flag set from the persisted raw builds
            # under THIS run's max_rows (ADVICE r10): resuming with a
            # different --max-rows used to keep stale flags and never
            # re-evaluate already-audited queries against the new
            # ceiling, so the headline counts could mix thresholds.
            # The builds are stored raw, so this is a pure re-derive.
            out["max_rows"] = max_rows
            out["flagged"] = {
                n: [b for b in bs if b["rows"] > max_rows]
                for n, bs in out.get("builds", {}).items()
                if any(b["rows"] > max_rows for b in bs)
            }
    if redo and only:
        # --redo (r12): drop the NAMED queries' prior rows so a round
        # that changes their plans re-audits them into the merged
        # artifact instead of overwriting the registry-wide one (the
        # first r12 run clobbered 222 rows with 7) or silently
        # skipping them under --resume's not-yet-audited rule.
        out["audited"] = [n for n in out["audited"] if n not in only]
        for n in only:
            out["builds"].pop(n, None)
            out["flagged"].pop(n, None)
            out["errors"].pop(n, None)
    done = set(out["audited"])
    names = [
        n for n in QUERIES
        if not n.startswith(DEMO_PREFIXES) and (not only or n in only)
        and n not in done
    ]
    if limit is not None:
        names = names[:limit]
    if resume:
        print(f"AUDITING {len(names)} of "
              f"{len(done) + len(names)} remaining", flush=True)
    if not names:
        print("AUDIT COMPLETE: nothing left to audit", flush=True)
        return
    for i, name in enumerate(names):
        spark.catalog.clearCache()
        try:
            builds = broadcast_builds(
                QUERIES[name].fn(spark, sf_dir), timeout_sec=q_timeout
            )
        except Exception as ex:
            out["errors"][name] = str(ex).split("\n")[0][:160]
            out["audited"].append(name)
            with open(OUT_PATH, "w") as f:
                json.dump(out, f, indent=1, sort_keys=True)
            continue
        out["audited"].append(name)
        if builds:
            out["builds"][name] = builds
        bad = [b for b in builds if b["rows"] > max_rows]
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
          f"{len(out['errors'])} errors, "
          f"{sum(len(v) for v in out['builds'].values())} broadcast "
          f"builds seen -> {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()

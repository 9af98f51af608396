"""Two-decade scale probe (VERDICT r9 #5): run the 10 heaviest
non-demo registry queries at sf0.1, the 10x /tmp/sf1 AND the 100x
/tmp/sf10 (tools/gen_sf1.py --sf10), recording wall-clock at each
decade and the decade-over-decade ratios. On fixed cores a
time-linear plan shows ratio ≈ 10 per decade once past fixed
overhead; anything trending clearly above ~10 on the second decade is
super-linear and becomes the next round's top fix.

Usage: python tools/gen_sf1.py && python tools/gen_sf1.py --sf10 &&
       python tools/scale_sf10.py [name ...]
Writes BENCH_SF10.json at the repo root (merging over prior runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from aiports_data_warehouse_etl_spark.queries import QUERIES  # noqa: E402
from aiports_data_warehouse_etl_spark.session import get_spark  # noqa: E402

#: The 10 heaviest non-demo queries per BENCH_FULL/BENCH_SF1 (the
#: VERDICT r9 #5 list): the TPC-H heavies, the inverted-index dedup
#: family, the iterative graph op, and the text-analytics heavies.
PROBE = [
    "tpch_q21_waiting_supplier", "tpch_q9_product_profit",
    "text_ngram_novelty", "dedup_minhash_lsh", "dedup_exact_substring",
    "dedup_cc_keep_best", "graph_pagerank_parts",
    "dedup_incremental_index", "market_basket_lift",
    "text_tfidf_top_terms",
]

SCALES = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/sf1"),
          ("sf10", "/tmp/sf10")]

OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_SF10.json")


def main() -> None:
    spark = get_spark(
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "32g"
            )
        }
    )
    spark.sparkContext.setLogLevel("ERROR")
    args = [a for a in sys.argv[1:] if a != "--rest"]
    rest = "--rest" in sys.argv[1:]
    only = set(args)
    # explicit names may probe ANY registry query, not just the
    # curated 10 (same contract as scale_rehearsal.py). --rest probes
    # every registry query without a complete sf10 row yet, EXCLUDING
    # the txlog/matview/stream feature demos: their wall-clock is
    # multi-commit protocol latency (characterized sub-linear
    # per-phase in the sf1 ledger), so a 100× decode of it measures
    # the demo harness, not a query plan. Same sf0.1-also-errored
    # skip rule as scale_rehearsal --rest (ADVICE r9 #1).
    _DEMO_PREFIXES = ("tlog_", "matview_", "stream_")
    out: dict = {"results": {}}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            out = json.load(f)
        out.setdefault("results", {})

    if rest:
        def _needs_row(n: str) -> bool:
            if n.startswith(_DEMO_PREFIXES):
                return False
            row = out["results"].get(n)
            if row is None:
                return True
            if "ratio_100x" in row:
                return False
            return "err" not in row.get("sf0.1", {})

        names = [n for n in QUERIES if _needs_row(n)]
        if only:
            names = [n for n in names if n in only]
        print(f"--rest: {len(names)} queries without an sf10 row",
              flush=True)
    else:
        names = [n for n in QUERIES if n in only] if only else PROBE

    def flush() -> None:
        with open(OUT_PATH, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)

    def _busy() -> float | None:
        """System-wide busy core-seconds (same signal bench.py gates
        on): lets each recorded row self-annotate the host-throttle
        state instead of needing a post-hoc idle-box classification
        (the r10 --rest sweep ran in a contended window and its 10
        unclassifiable >10x ratios cost a round — BENCH_NOTES r11
        addendum 1)."""
        try:
            with open("/proc/stat") as f:
                vals = [int(x) for x in f.readline().split()[1:]]
            return (sum(vals) - vals[3] - vals[4]) / os.sysconf(
                "SC_CLK_TCK"
            )
        except (OSError, ValueError, IndexError):
            return None

    def _spin() -> float:
        """Fixed pure-Python spin — the bench.py r12 CPU ruler: host
        throttle is invisible to busy_frac (stolen time reads as
        guest idle), so each row records how fast this box ran
        RELATIVE to the run's own baseline during its measurement."""
        t0 = time.perf_counter()
        s = 0
        for i in range(2_000_000):
            s += i * i
        return time.perf_counter() - t0

    spin_base = min(_spin() for _ in range(5))
    ncpu = os.cpu_count() or 1
    for name in names:
        row: dict = {}
        for label, sf in SCALES:
            spark.catalog.clearCache()
            try:
                # best-of-2, same protocol as scale_rehearsal.py: rep 1
                # pays warmup, rep 2 measures the engine
                best, n, bf = float("inf"), 0, None
                sp = None
                for _ in range(2):
                    b0 = _busy()
                    sp0 = round(_spin() / spin_base, 2)
                    t0 = time.time()
                    n = QUERIES[name].fn(spark, sf).count()
                    dt = time.time() - t0
                    b1 = _busy()
                    if dt < best:
                        best = dt
                        sp = sp0
                        if b0 is not None and b1 is not None:
                            bf = round((b1 - b0) / max(dt * ncpu, 1e-9), 3)
                row[label] = {"sec": round(best, 2), "rows": n}
                if bf is not None:
                    row[label]["busy_frac"] = bf
                if sp is not None:
                    row[label]["spin_ratio"] = sp
            except Exception as ex:
                row[label] = {"err": str(ex).split("\n")[0][:160]}
        for a, b, key in (("sf0.1", "sf1", "ratio_10x"),
                          ("sf1", "sf10", "ratio_10x_to_100x"),
                          ("sf0.1", "sf10", "ratio_100x")):
            if "sec" in row.get(a, {}) and "sec" in row.get(b, {}):
                row[key] = round(
                    row[b]["sec"] / max(row[a]["sec"], 1e-9), 1
                )
        out["results"][name] = row
        flush()
        print(name, json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

"""Merge multiple same-methodology bench runs into one BENCH_FULL.json
keeping the per-query MINIMUM — the run-granularity extension of
bench.py's own estimator (best-of-reps + end-of-run re-probes + gate
re-attempts all keep the min, because the dominant noise source on
this box is host-level CPU-throttle windows that only ever INFLATE a
reading; see BENCH_NOTES.md).

Inputs are BENCH_FULL.json files and/or bench stderr logs (parsed for
per-query / re-probe / gate lines). Forensics (busy_frac/ext_frac/
spin_ratio) are copied from the run that produced each winning value
when that run has them (logs don't). Provenance is stamped:
``merged_runs`` (per-run totals) and ``winner`` (which input won each
query).

Usage: python tools/bench_merge.py <out.json> <run1.json|run1.log> ...
"""
from __future__ import annotations

import json
import re
import sys


def parse_log(path: str) -> dict:
    vals: dict[str, float] = {}
    for line in open(path):
        m = re.match(r"\s+(\w+): ([\d.]+)s( \[throttled\])?$", line)
        if m:
            vals[m.group(1)] = float(m.group(2))
        m = re.match(r"\s+re-probe (\w+): [\d.]+s -> ([\d.]+)s", line)
        if m:
            vals[m.group(1)] = float(m.group(2))
        m = re.match(r"\s+gate (\w+): clean window rep ([\d.]+)s", line)
        if m:
            vals[m.group(1)] = min(vals.get(m.group(1), 1e9), float(m.group(2)))
    return {"queries": vals}


def main() -> None:
    out_path = sys.argv[1]
    runs = []
    for p in sys.argv[2:]:
        d = json.load(open(p)) if p.endswith(".json") else parse_log(p)
        runs.append((p, d))
    names = set(runs[0][1]["queries"])
    for _, d in runs[1:]:
        names &= set(d["queries"])
    merged: dict = {
        "queries": {},
        "busy_frac": {},
        "ext_frac": {},
        "spin_ratio": {},
        "winner": {},
        "merged_runs": {
            p: round(sum(d["queries"][n] for n in names), 3) for p, d in runs
        },
        "throttled": sorted(
            set().union(*(set(d.get("throttled", [])) for _, d in runs))
        ),
        "contended": sorted(
            # contended only if EVERY run left it contended — one clean
            # reading anywhere clears the flag, same as the in-run gate
            set.intersection(
                *(set(d.get("contended", [])) for _, d in runs)
            )
        ),
    }
    for n in sorted(names):
        best_p, best_d = min(runs, key=lambda r: r[1]["queries"][n])
        merged["queries"][n] = round(best_d["queries"][n], 3)
        merged["winner"][n] = best_p
        for k in ("busy_frac", "ext_frac", "spin_ratio"):
            if n in best_d.get(k, {}):
                merged[k][n] = best_d[k][n]
    first = runs[0][1]
    merged["sf"] = first.get("sf")
    merged["reps"] = first.get("reps")
    merged["total"] = round(sum(merged["queries"].values()), 3)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}: total {merged['total']}s over {len(names)} "
          f"queries; per-run totals {merged['merged_runs']}")


if __name__ == "__main__":
    main()

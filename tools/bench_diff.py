"""Diff two BENCH_FULL.json artifacts: per-family totals and the
biggest per-query moves, with busy_frac context.

Usage: python tools/bench_diff.py <before.json> <after.json> [topN]
"""
from __future__ import annotations

import json
import sys


def fam(name: str) -> str:
    for f in ("tpch", "dedup", "sim", "emb", "text", "win", "evt", "agg",
              "graph", "ts", "skew", "stream", "tlog", "matview", "mm"):
        if name.startswith(f + "_") or name == f:
            return f
    return "other"


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    fams: dict[str, list[float]] = {}
    for n in common:
        fams.setdefault(fam(n), [0.0, 0.0])
        fams[fam(n)][0] += qa[n]
        fams[fam(n)][1] += qb[n]
    print(f"{'family':10s} {'before':>8s} {'after':>8s} {'ratio':>6s}")
    ta = tb = 0.0
    for f in sorted(fams, key=lambda f: -fams[f][0]):
        x, y = fams[f]
        ta += x
        tb += y
        print(f"{f:10s} {x:8.2f} {y:8.2f} {y / max(x, 1e-9):6.2f}")
    print(f"{'TOTAL':10s} {ta:8.2f} {tb:8.2f} {tb / max(ta, 1e-9):6.2f}")
    moves = sorted(common, key=lambda n: qb[n] - qa[n])
    print(f"\ntop {top_n} improvements (sec before -> after):")
    for n in moves[:top_n]:
        print(f"  {qa[n]:7.3f} -> {qb[n]:7.3f}  {n}")
    print(f"\ntop {top_n} regressions:")
    for n in moves[-top_n:][::-1]:
        if qb[n] <= qa[n]:
            break
        print(f"  {qa[n]:7.3f} -> {qb[n]:7.3f}  "
              f"{n}  (busy {b.get('busy_frac', {}).get(n, '?')}, "
              f"ext {b.get('ext_frac', {}).get(n, '?')})")


if __name__ == "__main__":
    main()

"""The driver captures only the last 2000 bytes of bench.py stdout and
json-parses the final line (round 1's full 186-entry per-query dict
overflowed that buffer and BENCH_r01 recorded ``parsed: None``). Pin
the compact metric line to always fit, no matter how large the
registry grows."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
from aiports_data_warehouse_etl_spark.queries import QUERIES  # noqa: E402

DRIVER_TAIL_BYTES = 2000


def _metric_line(timings: dict[str, float]) -> str:
    return json.dumps(
        {
            "metric": "total_query_wall_clock",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": bench.compact_queries(timings),
            "sf": 0.1,
            "reps": 2,
        }
    )


def test_metric_line_fits_driver_tail_for_current_registry():
    timings = {name: 123.456 for name in QUERIES}
    line = _metric_line(timings)
    assert len(line) < DRIVER_TAIL_BYTES - 200, len(line)
    parsed = json.loads(line)
    assert parsed["queries"]["n_queries"] == len(QUERIES)


def test_metric_line_fits_even_at_500_queries():
    timings = {f"extra_query_with_a_long_name_{i:03d}": 9999.999 for i in range(500)}
    timings.update({name: 123.456 for name in bench.HEADLINE})
    line = _metric_line(timings)
    assert len(line) < DRIVER_TAIL_BYTES - 200, len(line)


def test_headline_queries_exist_in_registry():
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, missing


def test_contended_rows_excluded_from_family_totals():
    """VERDICT r11 #2: a contention-suspect row must NOT be summed
    into its family total — it lands under the _contended_sec
    companion instead, so rollups never carry a number an idle
    re-probe would halve."""
    c = bench.compact_queries(
        {"dedup_a": 5.0, "dedup_b": 2.0, "text_x": 1.0}, {"dedup_b"}
    )
    assert c["family_dedup_total"] == 5.0
    assert c["family_dedup_contended_sec"] == 2.0
    assert c["family_text_total"] == 1.0
    assert "family_text_contended_sec" not in c


def test_descendant_cpu_attribution_sees_own_spin():
    """The commit gate's external-CPU attribution: a busy-spin in
    THIS process must show up as our own tree's CPU, so the external
    remainder stays near zero for self-inflicted load."""
    import time

    s0 = bench._cpu_busy_seconds()
    o0 = bench._descendant_cpu_seconds()
    if s0 is None or o0 is None:
        return  # non-Linux: attribution disabled by design
    t0 = time.time()
    while time.time() - t0 < 0.3:
        pass
    own = bench._descendant_cpu_seconds() - o0
    assert own >= 0.2, own  # the spin is attributed to our tree

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

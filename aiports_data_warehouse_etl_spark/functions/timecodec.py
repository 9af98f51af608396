"""HHMM-encoded time codecs (ref `dags/extract_and_tranform.py:315-320`).

The reference stores clock times as integers like 1435 (= 14:35) and does
Python floor-division arithmetic on them. Python ``//`` and ``%`` floor
toward -inf, while Spark's ``%`` keeps the dividend's sign — so negative
delays (early arrivals) would diverge. We use ``F.floor`` + ``F.pmod``
to reproduce Python semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _floordiv(a: Column, b: int) -> Column:
    return F.floor(a / F.lit(b)).cast("long")


def _pymod(a: Column, b: int) -> Column:
    return F.pmod(a, F.lit(b)).cast("long")


def hhmm_to_minute_of_day(hhmm: Column) -> Column:
    """HHMM int → "minutes since midnight" FK, bug-compatible (ref `:320`).

    The reference's formula is ``t % 60 + (t // 100) * 60`` — note
    ``% 60``, not ``% 100``: for 1435 it yields 55 + 840 = 895, not the
    true 875. The golden fact outputs depend on the literal formula, so
    we reproduce it exactly (SURVEY.md §2.11 fidelity stance).
    """
    return (_pymod(hhmm, 60) + _floordiv(hhmm, 100) * 60).cast("long")


def hhmm_add_minutes(hhmm: Column, minutes: Column) -> Column:
    """Add a minute count to an HHMM int the way the reference does
    (ref `:315`): ``t + (m // 60) * 100 + m % 60``.

    Bug-compatible: carries into the hour digit are NOT normalized
    (e.g. 1450 + 20min → 1470, not 1510) — the golden outputs depend on
    this literal formula (SURVEY.md §2.11 item 8).
    """
    return (hhmm + _floordiv(minutes, 60) * 100 + _pymod(minutes, 60)).cast("long")


def minute_of_day_to_hhmm(minutes: Column) -> Column:
    """Inverse codec (not in the reference; used by dim_time utilities)."""
    return (_floordiv(minutes, 60) * 100 + _pymod(minutes, 60)).cast("long")

"""Z-order (Morton) encoding for multi-dimensional data clustering.

``write_sorted_parquet`` (sources/io.py) makes ONE column's min/max
footer stats tight; a filter on any other column still scans every
file. Z-ordering interleaves the bits of two key columns so that rows
close in EITHER dimension land close in the single sort key — every
output file then covers a small rectangle of the (x, y) key space and
a selective filter on either column prunes most files. This is the
standard multi-dimensional clustering layout (Delta Lake OPTIMIZE
ZORDER, Databricks liquid clustering ancestry) built here from native
bit arithmetic only — no UDFs, fully codegen'd, and reproducible in
any engine (the DuckDB oracle runs the same shift/mask chain).

Scale: the encode is a pure map-side projection; the layout write is
one range shuffle on the z value (identical cost to a single-column
sort write). At 100 TB this is the difference between a two-predicate
scan reading O(matching rectangle) and reading the whole corpus when
the second predicate isn't the sort key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Magic-mask bit-spread constants for interleaving 16-bit values into
# alternating bit positions of a 32-bit result (classic Morton encode;
# see e.g. "Bit Twiddling Hacks", public domain).
_SPREAD_STEPS_16 = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread_bits(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` so bit i moves to bit 2i."""
    c = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS_16:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def morton_interleave(x: Column, y: Column) -> Column:
    """Morton z-value of two non-negative ints (low 16 bits each):
    bits of ``x`` at even positions, ``y`` at odd. Monotone in each
    argument along z-curve locality; pure native expressions."""
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))


def morton_n_sql(exprs: list[str]) -> str:
    """Morton z-value of N non-negative int expressions as ONE
    generated SQL string (bit b of column i lands at position
    b*N + i): the general OPTIMIZE-ZORDER layout for 3+ filter
    columns, where the 2-column magic-mask chain has no clean
    analogue. Bits per column shrink to fit a signed 64-bit lane
    (16 for N ≤ 3, 64//N - 1 beyond), so wider domains must be
    quantized first — same contract as ``morton_interleave``.

    One string, not a Column-op loop: N×bits py4j round-trips would
    cost ~1.5 s of plan construction (see SCALE.md); the generated
    expression parses once and runs fully codegen'd. DuckDB parses
    the identical string, which is what lets the oracle replay the
    exact layout arithmetic."""
    n = len(exprs)
    if n < 2:
        raise ValueError("morton_n_sql needs >= 2 columns")
    bits = min(16, 64 // n - 1) if n > 2 else 16
    terms = []
    for i, e in enumerate(exprs):
        for b in range(bits):
            dst = b * n + i  # always >= b: shift is never negative
            terms.append(f"((({e}) & {1 << b}) << {dst - b})")
    return "(" + " | ".join(terms) + ")"


def morton_n_col(colnames: list[str]) -> Column:
    """The N-column interleave as a Spark Column (parsed from the
    generated SQL — identical arithmetic to the oracle string)."""
    return F.expr(morton_n_sql([f"`{c}`" for c in colnames]))


def morton_sql(x_expr: str, y_expr: str) -> str:
    """The identical shift/mask chain as ANSI SQL (DuckDB-compatible)
    for oracle comparison — generated, like the SimHash oracle, so the
    two implementations cannot drift."""

    def spread(e: str) -> str:
        e = f"(({e}) & 65535)"
        for shift, mask in _SPREAD_STEPS_16:
            e = f"((({e} | ({e} << {shift})) & {mask}))"
        return e

    return f"({spread(x_expr)} | ({spread(y_expr)} << 1))"

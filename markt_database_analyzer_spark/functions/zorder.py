"""Z-order (Morton) interleaving for multi-dimensional data clustering.

A single sort key that preserves locality in SEVERAL dimensions at once:
interleave the bits of two (or more) dimension values so that rows close
in (x, y) land close in z. Writing a table with
``repartitionByRange(z).sortWithinPartitions(z)`` then gives every
parquet file a TIGHT min/max envelope on BOTH source dimensions — a
predicate on either column prunes files, not just on the lead sort key.
This is the layout trick behind Delta/Iceberg OPTIMIZE ZORDER; here it
is expressed as a pure column expression (loop-unrolled shift/or, fully
inside whole-stage codegen — no UDF).

The expression is rendered identically for Spark and ANSI SQL so the
catalog entry is value-oracled.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder2(x: Column, y: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of two non-negative int columns.

    Bit i of x lands at position 2i, bit i of y at 2i+1; the result is a
    2*bits-bit Morton code. Values are masked to ``bits`` bits first
    (deterministic wraparound — acceptable for layout keys, where the
    masked high bits only cost some pruning precision).
    """
    mask = (1 << bits) - 1
    xm = x.bitwiseAND(F.lit(mask))
    ym = y.bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def sql_zorder2(x: str, y: str, bits: int = 10) -> str:
    """DuckDB/ANSI rendering of :func:`zorder2` (same unrolled form)."""
    mask = (1 << bits) - 1
    xm = f"(({x}) & {mask})"
    ym = f"(({y}) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"

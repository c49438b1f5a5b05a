"""Deterministic floating-point aggregation.

Plain ``sum``/``avg`` over doubles is order-dependent, and Spark's partial
aggregation order varies run-to-run with partitioning — the same query can
return results differing in the last ulps between runs, and differing from
any external system. That breaks (a) hash-based differential testing and
(b) reproducibility audits on a 1000-executor job.

``dsum``/``davg`` quantize each value to an integer number of micro-units
(``round(x * 1e6)``) and sum those integers through ``DECIMAL(38, 0)``:

- integer rounding of a given double is identical in every engine
  (half-away-from-zero; exact-tie divergence has measure ~2^-52);
- integer addition is exact and associative → the aggregate is **bit-stable
  under any partitioning** and reproducible across engines;
- the final integer → double → /1e6 conversion is deterministic.

(The naive alternative — accumulating ``CAST(x AS DECIMAL)`` — is NOT
portable: engines disagree systematically on double→decimal conversion
below ~1e-10 per value, which accumulates across millions of rows.)

Cost: one multiply+round per value, no extra shuffle. Semantics: values are
quantized at 1e-6 before aggregation — document-level metrics (prices,
counts, rates) lose nothing that survives float noise anyway. Callers that
need raw-float semantics use plain ``F.sum``/``F.avg``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICRO = 1_000_000.0


def _quantized(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double") * F.lit(MICRO)).cast("decimal(38,0)")


def dsum(col: Column | str) -> Column:
    """Order-insensitive (deterministic) sum of a double column, as double,
    quantized at 1e-6."""
    return (F.sum(_quantized(col)).cast("double") / F.lit(MICRO)).alias("dsum")


def davg(col: Column | str) -> Column:
    """Deterministic mean (nulls excluded from numerator and denominator,
    matching ``avg`` and pandas ``mean(skipna=True)``), quantized at 1e-6."""
    c = F.col(col) if isinstance(col, str) else col
    return ((F.sum(_quantized(c)).cast("double") / F.count(c)) / F.lit(MICRO)).alias("davg")

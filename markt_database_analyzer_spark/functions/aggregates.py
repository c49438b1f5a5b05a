"""Deterministic floating-point aggregation.

Plain ``sum``/``avg`` over doubles is order-dependent, and Spark's partial
aggregation order varies run-to-run with partitioning — so the same query can
return a result that differs in the last ulps between runs, and differs from
any external oracle. That breaks (a) hash-based differential testing and
(b) reproducibility audits on a 1000-executor job.

``dsum``/``davg`` route the accumulation through ``DECIMAL(28, 10)``:
decimal addition is exact and associative, so the aggregate is **bit-stable
under any partitioning**, then the final value is cast back to double. Cost
is a constant factor on the agg — no extra shuffle — and at 100 TB the
stability is worth it for any externally-compared metric.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(28,10)"


def dsum(col: Column | str) -> Column:
    """Order-insensitive (deterministic) sum of a double column, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic mean: exact decimal sum over count, as double.

    Nulls are excluded from numerator and denominator, matching both
    ``avg`` and pandas ``mean(skipna=True)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(_DEC)).cast("double") / F.count(c)).alias("davg")

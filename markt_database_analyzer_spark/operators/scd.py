"""Slowly-changing-dimension (type 2) history build from a changelog.

Warehouse-side counterpart of the reference's per-entity "state over
time" reporting (analyse.py's per-listing trajectory handling): given an
append-only changelog of (key, attribute, event_time), collapse
consecutive duplicates and emit one validity interval per attribute
version — ``valid_from`` / ``valid_to`` / ``is_current``.

Scale shape: two window passes over the same (key, order) partitioning —
Catalyst plans ONE shuffle (both windows share the partition keys); no
self-join, no collect. The change-row filter runs between the passes, so
the second window (version numbering + lead) sees only the collapsed
rows. State per key is O(1) per window frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_versions(
    df: DataFrame,
    key: str,
    attr: str,
    order_by: list[str | Column],
) -> DataFrame:
    """Build the SCD2 history of ``attr`` per ``key``.

    ``order_by`` must be a TOTAL order within each key (pass tiebreak
    columns down to a unique id) — otherwise two engines may collapse
    runs differently. The first ``order_by`` column is used as the
    validity timestamp.
    """
    w = Window.partitionBy(key).orderBy(*order_by)
    ts_col = order_by[0] if isinstance(order_by[0], str) else None
    if ts_col is None:
        raise ValueError("order_by[0] must be a column name (the validity timestamp)")

    changed = (
        df.withColumn("_prev", F.lag(attr).over(w))
        .filter(F.col("_prev").isNull() | (F.col(attr) != F.col("_prev")))
        .drop("_prev")
    )
    w2 = Window.partitionBy(key).orderBy(*order_by)
    return changed.select(
        F.col(key),
        F.row_number().over(w2).cast("bigint").alias("version_no"),
        F.col(attr),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )

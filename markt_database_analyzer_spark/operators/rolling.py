"""Centered rolling mean (SURVEY.md §2.6 W2/W3).

``rolling(window=w, center=True, min_periods=1).mean()`` (analyse.py:90,297)
maps exactly to a centered row-frame window average: Spark's ``avg`` ignores
nulls and the frame shrinks at the edges, which is precisely pandas'
``min_periods=1`` + skipna behavior — verified by pin-test.

The window is global-ordered over the *spine* (≤288 rows after aggregation),
so the single-partition sort is trivially cheap; segmented variants partition
by the segment keys (SURVEY.md §2.5 A8) and stay distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def centered_rolling_mean(
    df: DataFrame,
    order_col: Column | str,
    value_col: Column | str,
    window: int,
    out_col: str = "smoothed",
    partition_keys: list[str] | None = None,
) -> DataFrame:
    """Centered rolling mean of width ``window`` (odd or even, pandas
    convention: for even windows pandas centers with one extra row *before*)."""
    before = window // 2
    after = window - before - 1  # pandas center=True: extra element goes before
    w = Window.orderBy(order_col)
    if partition_keys:
        w = Window.partitionBy(*partition_keys).orderBy(order_col)
    frame = w.rowsBetween(-before, after)
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return df.withColumn(out_col, F.avg(c).over(frame))

"""Bucketed range join — interval/range predicates the Spark-first way.

Open-source Spark has no range-join optimization: a join whose only
condition is an inequality plans as BroadcastNestedLoopJoin (O(n·m) and
driver-bounded) or a cartesian product. The scalable encoding of
``right.time ∈ [left.start, left.start + width)`` is **bucketing**:

    bucket = floor(time / width)  →  a right row matches a left row only
    if the right bucket equals the left bucket or the one after it
    → explode each left row to its (at most 2) candidate buckets
    → shuffle equi-join on (key, bucket) → residual exact range filter

The join becomes a plain hash/sort-merge equi-join whose key cardinality
the engine shards like any other, and the residual filter runs
vectorized post-join. Generalizes to arbitrary interval widths with
ceil(interval/width)+1 candidate buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_start: str,
    right_time: str,
    width_expr: Column,
) -> DataFrame:
    """Inner-join ``left`` and ``right`` on ``key`` with
    ``left_start <= right_time < left_start + width`` via bucket
    equi-join. ``width_expr`` is a literal interval as microseconds
    (e.g. ``F.lit(7 * 86400 * 1_000_000)``). Returns all columns of both
    (minus internal bucket columns)."""
    width_us = width_expr.cast("long")
    # cast("timestamp") first: parquet µs columns read as TIMESTAMP_NTZ,
    # which unix_micros rejects; the session TZ is pinned UTC so the cast
    # is an identity relabel.
    l_us = F.unix_micros(F.col(left_start).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_time).cast("timestamp"))
    lb = left.withColumn(
        "_bucket", F.explode(F.array((l_us / width_us).cast("long"), (l_us / width_us).cast("long") + 1))
    ).withColumn("_start_us", l_us)
    rb = right.withColumn("_bucket", (r_us / width_us).cast("long")).withColumn("_t_us", r_us)
    joined = lb.join(rb, on=[key, "_bucket"]).filter(
        (F.col("_t_us") >= F.col("_start_us")) & (F.col("_t_us") < F.col("_start_us") + width_us)
    )
    return joined.drop("_bucket", "_start_us", "_t_us")

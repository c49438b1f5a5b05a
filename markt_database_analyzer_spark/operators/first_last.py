"""Per-group first/last-by-order aggregation (SURVEY.md §2.5 A4, A5, A7).

This replaces the reference's two row-at-a-time Python loops — its
scalability cliff:

- B2: first/last snapshot within the ≤119-min window per ad push
  (analyse.py:249-281)
- C: earliest snapshot with age ≤ 40, latest with age ≤ 400 per push
  (analyse.py:437-478)

Spark shape: ONE hash aggregation with ``min_by``/``max_by`` over a
*conditional* ordering key (``when(cond, order)`` → rows failing the window
have a null ordering key and are ignored by min_by/max_by). O(1) state per
group, partial aggregation map-side, a single shuffle — this is the plan
that scales linearly to 100 TB where the reference is O(groups) in Python.

Determinism note: ``min_by(value, order)`` with duplicate ``order`` values
picks an arbitrary row, in Spark and in every other engine. Callers that
need full determinism pass a *total* ordering (e.g. a struct of
(order, unique_id)); ``first_last_by_order`` builds that struct itself when
``tiebreak`` is given.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ordering(order: Column, cond: Column | None, tiebreak: Column | None) -> Column:
    key = F.struct(order, tiebreak) if tiebreak is not None else order
    if cond is not None:
        key = F.when(cond, key)  # null ordering key → excluded from min_by/max_by
    return key


def first_last_by_order(
    df: DataFrame,
    group_keys: list[str],
    order: Column,
    value: Column,
    first_cond: Column | None = None,
    last_cond: Column | None = None,
    tiebreak: Column | None = None,
    carry: dict[str, Column] | None = None,
) -> DataFrame:
    """Aggregate each group to one row with the first & last ``value`` by
    ``order`` (optionally under different row-conditions for each end).

    Output columns: group_keys + first_value, last_value, first_order,
    last_order, n_rows, order_varies (+ any ``carry`` aggregates, each
    taken with ``min`` — the reference reads these off an arbitrary group row
    because they are constant within the group (analyse.py:273,474); ``min``
    gives that value deterministically).

    ``order_varies`` is the A5 "more than one distinct order" guard
    (``nunique > 1``, analyse.py:259) compiled to ``min(order) !=
    max(order)`` — exactly equivalent for the >1 test, and crucially NOT a
    distinct aggregation: ``countDistinct`` here would force a second
    shuffle on (group, order) plus per-partition sort-aggregates, the
    dominant cost of this operator at scale.
    """
    first_key = _ordering(order, first_cond, tiebreak)
    last_key = _ordering(order, last_cond, tiebreak)
    aggs = [
        F.min_by(value, first_key).alias("first_value"),
        F.max_by(value, last_key).alias("last_value"),
        F.min(F.when(first_cond, order) if first_cond is not None else order).alias("first_order"),
        F.max(F.when(last_cond, order) if last_cond is not None else order).alias("last_order"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.min(order) != F.max(order)).alias("order_varies"),
    ]
    for name, col in (carry or {}).items():
        aggs.append(F.min(col).alias(name))
    return df.groupBy(*group_keys).agg(*aggs)

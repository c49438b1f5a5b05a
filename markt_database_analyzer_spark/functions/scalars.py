"""Scalar column functions (SURVEY.md §2.8 F1-F4, F9-F12).

All JVM-side built-ins — no Python UDFs in the hot path. The one reference
function that *was* a row-wise Python UDF (``assign_age_group``,
analyse.py:34-44) is provided both ways: ``age_group`` (native CASE chain,
the default) and ``datapipe.udfs.age_group_pandas_udf`` (Arrow-vectorized,
kept as the engine's worked scalar-UDF example).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def contains_ci(col: Column | str, needle: str) -> Column:
    """Case-insensitive, null-safe substring match (F1).

    ``str.contains(needle, case=False, na=False)`` (analyse.py:50,53):
    null input → False, not null.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.lower(c).contains(needle.lower()), F.lit(False))


def categorize_by_contains(col: Column | str, rules: list[tuple[str, str]], otherwise: str = "other") -> Column:
    """Nested CASE from ordered substring rules (F2, analyse.py:49-57).

    ``rules`` is an ordered list of (needle, label); first match wins.
    """
    expr = F.lit(otherwise)
    for needle, label in reversed(rules):
        expr = F.when(contains_ci(col, needle), F.lit(label)).otherwise(expr)
    return expr


def age_group(age: Column | str) -> Column:
    """Range-bucket CASE (F3): 18-19 / 20-25 / 26+ else null (analyse.py:34-44)."""
    c = F.col(age) if isinstance(age, str) else age
    return (
        F.when(c.between(18, 19), F.lit("18-19"))
        .when(c.between(20, 25), F.lit("20-25"))
        .when(c >= 26, F.lit("26+"))
    )


def composite_key(*cols: Column | str, sep: str = "_") -> Column:
    """``ad_unique_id + "_" + push_counter.astype(str)`` (F4, analyse.py:67)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.concat_ws(sep, *cs)


def clip_at_zero(col: Column | str) -> Column:
    """``.clip(lower=0)`` / ``max(0, x)`` (F10, analyse.py:74,270,471)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.greatest(F.lit(0.0), c.cast("double"))


def rate_per_hour(delta_value: Column, delta_minutes: Column) -> Column:
    """Two-point slope in units/hour, div-by-zero-safe (F11).

    The reference guards ``delta_time > 0`` by filtering (analyse.py:72,267);
    ``try_divide`` keeps the expression total under ANSI regardless.
    """
    return F.try_divide(delta_value * F.lit(60.0), delta_minutes)


def hhmm_label(minute_of_day: Column | str) -> Column:
    """Zero-padded ``HH:MM`` from minute-of-day (F12, analyse.py:211)."""
    c = F.col(minute_of_day) if isinstance(minute_of_day, str) else minute_of_day
    return F.format_string("%02d:%02d", F.floor(c / 60).cast("int"), c.cast("int") % 60)

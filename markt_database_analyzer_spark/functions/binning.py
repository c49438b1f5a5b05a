"""Fixed-width binning with exact pandas `pd.cut` edge parity (SURVEY.md §2.7).

The reference uses two *different* binning conventions and parity here is the
classic off-by-one-bin hazard:

- **B1 (right-closed, include_lowest, center labels)** — analyse.py:83-87:
  ``pd.cut(mid_age, bins=0..1440 step w, labels=centers, include_lowest=True)``
  puts 5.0 into the (0,5] bin (label 2.5) and 5.1 into (5,10] (label 7.5)
  → ``ceil(x/w)`` picks the bin index; ``include_lowest`` maps x<=0 into the
  first bin. Values outside (0, 1440] fall out of range → null (pd.cut NaN).

- **B2 (left-closed, "HH:MM" labels)** — analyse.py:206-218:
  ``pd.cut(minute, bins=0..1440 step w, right=False)`` puts 9.9 into
  [0,10) ("00:00") and 10 into [10,20) ("00:10") → ``floor(x/w)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bin_right_closed_center(
    col: Column | str, width: float = 5.0, lo: float = 0.0, hi: float = 1440.0
) -> Column:
    """B1: right-closed ``(lo, lo+w] ...`` bins labeled by bin center.

    Matches ``pd.cut(x, arange(lo, hi+w, w), labels=centers,
    include_lowest=True)``: x == lo lands in the first bin; x outside
    (lo, hi] → null.
    """
    c = F.col(col) if isinstance(col, str) else col
    idx = F.greatest(F.ceil((c - F.lit(lo)) / F.lit(width)), F.lit(1))
    center = F.lit(lo) + (idx.cast("double") - F.lit(0.5)) * F.lit(width)
    in_range = (c >= F.lit(lo)) & (c <= F.lit(hi))
    return F.when(in_range, center)


def bin_left_closed_start(
    col: Column | str, width: float = 10.0, lo: float = 0.0, hi: float = 1440.0
) -> Column:
    """B2: left-closed ``[lo, lo+w) ...`` bins labeled by bin start (numeric).

    Matches ``pd.cut(x, right=False)``: x == hi is out of range → null.
    """
    c = F.col(col) if isinstance(col, str) else col
    start = F.floor((c - F.lit(lo)) / F.lit(width)) * F.lit(width) + F.lit(lo)
    in_range = (c >= F.lit(lo)) & (c < F.lit(hi))
    return F.when(in_range, start.cast("double"))


def bin_left_closed_label(
    col: Column | str, width: float = 10.0, lo: float = 0.0, hi: float = 1440.0
) -> Column:
    """B2 with the reference's zero-padded ``HH:MM`` labels (analyse.py:211)."""
    start = bin_left_closed_start(col, width=width, lo=lo, hi=hi)
    return F.when(
        start.isNotNull(),
        F.format_string(
            "%02d:%02d",
            F.floor(start / 60).cast("int"),
            (start.cast("int") % 60),
        ),
    )


def minute_of_day(ts: Column | str) -> Column:
    """``.dt.hour * 60 + .dt.minute`` (F9, analyse.py:204)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.hour(c) * 60 + F.minute(c)).cast("double")

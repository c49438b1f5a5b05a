"""Property-based pd.cut parity for the two binning conventions
(SURVEY.md §2.7 B1/B2 — the off-by-one-bin hazard)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from markt_database_analyzer_spark.functions import (
    bin_left_closed_label,
    bin_right_closed_center,
)
from pyspark.sql import functions as F


def _spark_bin(spark, values, col_fn):
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    return [r[0] for r in df.select(col_fn("x").alias("b")).collect()]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=1500, allow_nan=False), min_size=1, max_size=50
    )
)
def test_right_closed_center_matches_pd_cut(spark, values):
    bins = np.arange(0, 1445, 5)
    centers = (bins[:-1] + bins[1:]) / 2
    want = pd.cut(pd.Series(values), bins=bins, labels=centers, include_lowest=True).astype(float)
    got = _spark_bin(spark, values, lambda c: bin_right_closed_center(c, width=5.0))
    for g, w in zip(got, want):
        if pd.isna(w):
            assert g is None
        else:
            assert g == w, f"value binning mismatch: spark={g} pandas={w}"


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-10, max_value=1500, allow_nan=False), min_size=1, max_size=50
    )
)
def test_left_closed_label_matches_pd_cut(spark, values):
    edges = np.linspace(0, 1440, 145)
    labels = [f"{int(b // 60):02d}:{int(b % 60):02d}" for b in edges[:-1]]
    want = pd.cut(pd.Series(values), bins=edges, labels=labels, right=False, include_lowest=True)
    got = _spark_bin(spark, values, lambda c: bin_left_closed_label(c, width=10.0))
    for g, w in zip(got, want):
        if pd.isna(w):
            assert g is None
        else:
            assert g == w


def test_rolling_mean_min_periods_parity(spark):
    """W2: Spark centered row-frame avg == pandas rolling(center, min_periods=1)
    including null-skipping and edge shrink, for odd and even windows."""
    vals = [1.0, None, 3.0, 10.0, None, None, 4.0, 8.0]
    pdf = pd.Series(vals, dtype="float64")
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, v double")
    from markt_database_analyzer_spark.operators import centered_rolling_mean

    for w in (3, 4, 5):
        want = pdf.rolling(window=w, center=True, min_periods=1).mean()
        got = [
            r["s"]
            for r in centered_rolling_mean(df, "i", "v", w, out_col="s").orderBy("i").collect()
        ]
        for g, wv in zip(got, want):
            if pd.isna(wv):
                assert g is None
            else:
                assert abs(g - wv) < 1e-12, f"window={w}: {got} vs {list(want)}"

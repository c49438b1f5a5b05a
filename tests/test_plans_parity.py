"""Differential pin-tests: Spark plans vs pandas semantics on shared fixture
rows (SURVEY.md §5.2 item 2 — the pandas-parity gotchas)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from markt_database_analyzer_spark.plans import (
    initial_rate_by_posting_hour,
    lifetime_view_rate_curve,
    pushes_per_time_bin,
    views_gained_by_city,
)
from markt_database_analyzer_spark.sources.fixtures import generate_rows

from . import pandas_semantics as ref


@pytest.fixture(scope="module")
def rows():
    return generate_rows(n_ads=120, seed=7)


def assert_frames_close(got: pd.DataFrame, want: pd.DataFrame, keys: list[str], float_cols: list[str]):
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want), f"row count {len(got)} != {len(want)}"
    for k in keys:
        assert got[k].astype(str).tolist() == want[k].astype(str).tolist(), f"key col {k} differs"
    for c in float_cols:
        g = got[c].astype(float).to_numpy()
        w = want[c].astype(float).to_numpy()
        both_nan = np.isnan(g) & np.isnan(w)
        close = np.isclose(g, w, rtol=1e-9, atol=1e-9) | both_nan
        assert close.all(), f"col {c} mismatch at rows {np.where(~close)[0][:10]}: {g[~close][:5]} vs {w[~close][:5]}"


def test_analysis_a_parity(fixtures, rows):
    mon, prof = fixtures
    got = lifetime_view_rate_curve(mon, prof).toPandas()
    want = ref.analysis_a(*rows)
    # Spark spine covers every (segment, bin); pandas observed=False does the
    # same per segment — identical shape expected.
    assert_frames_close(
        got, want, keys=["category", "age_group", "bin"], float_cols=["rate", "smoothed_rate", "time_hours"]
    )


def test_analysis_b1_parity(fixtures, rows):
    mon, prof = fixtures
    got = pushes_per_time_bin(prof).toPandas()
    want = ref.analysis_b1(rows[1])
    assert_frames_close(got, want, keys=["time_bin"], float_cols=["n_pushes"])


def test_analysis_b2_parity(fixtures, rows):
    mon, prof = fixtures
    got = initial_rate_by_posting_hour(mon, prof).toPandas()
    want = ref.analysis_b2(*rows)
    assert_frames_close(
        got, want, keys=["posting_hour"], float_cols=["avg_rate", "smoothed_rate"]
    )


def test_analysis_c_parity(fixtures, rows):
    mon, prof = fixtures
    got = views_gained_by_city(mon, prof).toPandas()
    want = ref.analysis_c(*rows)
    assert_frames_close(got, want, keys=["city"], float_cols=["avg_views_gained", "n_pushes"])

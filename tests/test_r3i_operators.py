"""Round-3 tenth-tranche pins: rolling engagement window math and
power-iteration convergence on a rank-1 embedding corpus."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from markt_database_analyzer_spark.catalog import REGISTRY

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)
EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"
_D0 = dt.datetime(2024, 1, 1)


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )
    return str(tmp_path)


def test_rolling_engagement_crafted_windows(spark, tmp_path):
    def ev(i, day, user):
        return (i, _D0 + dt.timedelta(days=day), user, "t", 1.0, "{}")

    # day0: u1; day1: u2; day8: u3  (day8 is outside day1's 7-day window)
    rows = [ev(1, 0, 1), ev(2, 1, 2), ev(3, 8, 3)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {
        r.day.day + (r.day.month - 1) * 31: (r.dau, r.wau, r.mau, r.stickiness)
        for r in REGISTRY["growth_rolling_engagement"].fn(spark, sf).collect()
    }
    # day0 (Jan 1): dau 1, wau 1, mau 1
    assert got[1] == (1, 1, 1, 1.0)
    # day1 (Jan 2): dau 1, trailing-7 {u1, u2} = 2, mau 2 -> stickiness .5
    assert got[2] == (1, 2, 2, 0.5)
    # day8 (Jan 9): u1 (day0) fell out of the 7-day window, u2 (day1)
    # is the 8th day back -> also out; mau still has all three
    assert got[9] == (1, 1, 3, pytest.approx(1 / 3, abs=1e-6))


def test_pca_power_recovers_rank1_direction(spark, tmp_path):
    # rank-1 corpus along d = [3, 1, 0, ...]/sqrt(10): one power step
    # already lands on d exactly, iterations stay there
    d = [3.0, 1.0] + [0.0] * 62
    rows = [(i, [a * x for x in d], 0) for i, a in enumerate([1.0, -2.0, 0.5, 3.0])]
    sf = _write(spark, tmp_path, "embeddings", rows, EMB_SCHEMA)
    out = REGISTRY["embeddings_pca_power_component"].fn(spark, sf).collect()
    assert len(out) == 64
    loadings = [r.loading for r in sorted(out, key=lambda r: r.dim)]
    assert loadings[0] == pytest.approx(3 / math.sqrt(10), abs=1e-6)
    assert loadings[1] == pytest.approx(1 / math.sqrt(10), abs=1e-6)
    assert all(abs(x) < 1e-9 for x in loadings[2:])
    # unit norm
    assert sum(x * x for x in loadings) == pytest.approx(1.0, abs=1e-6)

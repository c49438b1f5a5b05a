"""Round-3 sixth-tranche semantics pins: EWMA known values, growth
accounting on a crafted timeline, RFM quintile properties, and Gini
closed-form cases."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)
ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)

_D0 = dt.datetime(2024, 1, 1)


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )
    return str(tmp_path)


def test_ewma_known_values(spark, tmp_path):
    def ev(i, etype, v):
        return (i, _D0 + dt.timedelta(minutes=i), 1, etype, float(v), "{}")

    rows = [ev(1, "c", 4), ev(2, "c", 2)] + [ev(10 + i, "k", 7) for i in range(20)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    out = {(r.event_type, r.event_id): r.ewma
           for r in REGISTRY["w_ewma_smoothed"].fn(spark, sf).collect()}
    # first row: ewma == value
    assert out[("c", 1)] == 4.0
    # two rows, alpha=.5: (4*0.5 + 2*1) / 1.5
    assert out[("c", 2)] == pytest.approx(4.0 / 1.5, abs=1e-6)
    # constant series stays constant through the 16-row truncation
    assert all(out[("k", 10 + i)] == pytest.approx(7.0, abs=1e-6) for i in range(20))


def test_growth_accounting_crafted(spark, tmp_path):
    def ev(i, day, user):
        return (i, _D0 + dt.timedelta(days=day), user, "t", 1.0, "{}")

    # day0: users 1,2 (both new); day1: users 1,3 (one new); day2: user 3
    rows = [ev(1, 0, 1), ev(2, 0, 2), ev(3, 1, 1), ev(4, 1, 3), ev(5, 2, 3)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = [
        (r.n_new, r.cum_users, r.n_active)
        for r in REGISTRY["growth_cumulative_users"].fn(spark, sf).collect()
    ]
    assert got == [(2, 2, 2), (1, 3, 2), (0, 3, 1)]


def test_rfm_quintiles_and_segment_code(spark):
    rows = REGISTRY["segment_rfm_customers"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.segment == r.r_score * 100 + r.f_score * 10 + r.m_score
    # ntile balance: bucket sizes differ by at most one
    from collections import Counter

    for col in ("r_score", "f_score", "m_score"):
        sizes = Counter(getattr(r, col) for r in rows).values()
        assert max(sizes) - min(sizes) <= 1


def test_gini_closed_form_cases(spark, tmp_path):
    rows = [
        (1, 1, "F", 5.0, _D0, "eq"),
        (2, 1, "F", 5.0, _D0, "eq"),
        (3, 1, "F", 5.0, _D0, "eq"),
        (4, 1, "F", 5.0, _D0, "eq"),
        (5, 1, "F", 0.0, _D0, "con"),
        (6, 1, "F", 0.0, _D0, "con"),
        (7, 1, "F", 0.0, _D0, "con"),
        (8, 1, "F", 10.0, _D0, "con"),
    ]
    sf = _write(spark, tmp_path, "orders", rows, ORDERS_SCHEMA)
    got = {r.priority: (r.n, r.gini)
           for r in REGISTRY["udf_grouped_agg_gini"].fn(spark, sf).collect()}
    assert got["eq"] == (4, 0.0)  # perfect equality
    assert got["con"] == (4, pytest.approx(0.75))  # one-hot: (n-1)/n

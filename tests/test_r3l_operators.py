"""Thirteenth-tranche pins: lateral vs window-top-k equivalence, mode
tiebreaks, distribution-window identities, and HLL-vs-exact bounds."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)
_D0 = dt.datetime(2024, 1, 1)


def test_lateral_matches_window_topk(spark):
    lat = {
        (r.c_custkey, r.o_orderkey)
        for r in REGISTRY["sql_lateral_topk_per_customer"].fn(spark, SF).collect()
    }
    from markt_database_analyzer_spark.operators import top_k_per_group
    from markt_database_analyzer_spark.sources import read_table

    orders = read_table(spark, SF, "orders")
    win = {
        (r.o_custkey, r.o_orderkey)
        for r in top_k_per_group(
            orders, ["o_custkey"], [F.desc("o_totalprice"), F.col("o_orderkey")], 2
        ).collect()
    }
    assert lat == win


def test_mode_tiebreak_and_share(spark, tmp_path):
    def ev(i, user, etype):
        return (i, _D0, user, etype, 1.0, "{}")

    # user 1: A x2, B x2 (tie -> 'A' by value-asc), C x1
    rows = [ev(1, 1, "A"), ev(2, 1, "A"), ev(3, 1, "B"), ev(4, 1, "B"), ev(5, 1, "C")]
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/events.parquet")
    r = REGISTRY["agg_mode_by_user"].fn(spark, str(tmp_path)).collect()[0]
    assert (r.mode_event_type, r.n_mode, r.n_total) == ("A", 2, 5)
    assert r.share == pytest.approx(0.4)


def test_distribution_window_identities(spark):
    rows = REGISTRY["rank_distribution_window"].fn(spark, SF).collect()
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for cust, rs in by_cust.items():
        n = rs[0].group_n
        assert len(rs) == n
        # percent_rank spans [0, 1] (0 for the first row; 1 for the last
        # when n > 1) and cume_dist ends at exactly 1
        assert min(r.pct_rank for r in rs) == 0.0
        assert max(r.cume for r in rs) == 1.0
        if n > 1:
            assert max(r.pct_rank for r in rs) == 1.0


def test_hll_rolling_wau_within_bound(spark):
    rows = REGISTRY["growth_rolling_wau_hll"].fn(spark, SF).collect()
    assert len(rows) > 0
    assert all(r.in_bound for r in rows)
    # trailing-window counts dominate the daily distinct count
    exact = {
        r.day: r.wau
        for r in REGISTRY["growth_rolling_engagement"].fn(spark, SF).collect()
    }
    for r in rows:
        assert r.wau_exact == exact[r.day]

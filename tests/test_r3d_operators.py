"""Round-3 fifth-tranche semantics pins: PageRank mass conservation and
degree ordering, association-rule arithmetic, DQ verdicts, and
rank-median / MAD on crafted series."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
LINEITEM_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
    " l_returnflag string, l_linestatus string, l_shipdate timestamp"
)
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)

_D0 = dt.datetime(2024, 1, 1)


def _order(ok, ck):
    return (ok, ck, "F", 10.0, _D0, "1-URGENT")


def _line(ok, pk, sk):
    return (ok, pk, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _D0)


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )
    return str(tmp_path)


def test_pagerank_mass_and_degree_order(spark, tmp_path):
    # c1 -> {s1, s2}; c2 -> {s1}: s1 has degree 2, s2 degree 1
    _write(spark, tmp_path, "orders", [_order(1, 1), _order(2, 2)], ORDERS_SCHEMA)
    sf = _write(
        spark,
        tmp_path,
        "lineitem",
        [_line(1, 10, 1), _line(1, 11, 2), _line(2, 12, 1)],
        LINEITEM_SCHEMA,
    )
    rows = REGISTRY["graph_pagerank_bipartite"].fn(spark, sf).collect()
    pr = {(r.kind, r.key): r.pr for r in rows}
    assert len(rows) == 4 and all(r.pr > 0 for r in rows)
    # rank mass is conserved up to the per-iteration rounding grid
    assert sum(r.pr for r in rows) == pytest.approx(1.0, abs=1e-6)
    # the higher-degree supplier outranks the lower-degree one
    assert pr[("supplier", 1)] > pr[("supplier", 2)]
    # c1 (degree 2) outranks c2 (degree 1)
    assert pr[("customer", 1)] > pr[("customer", 2)]


def test_assoc_rules_hand_values(spark, tmp_path):
    # parts 100 & 200 co-occur in 5 of 10 orders; 100 appears in all 10,
    # 200 only in those 5 -> conf(100->200)=0.5? (pa<pb so pa=100):
    # support=5/10, confidence=5/10, lift=(5*10)/(10*5)=1.0
    rows_li = []
    for o in range(1, 11):
        rows_li.append(_line(o, 100, 1))
        if o <= 5:
            rows_li.append(_line(o, 200, 1))
    sf = _write(spark, tmp_path, "lineitem", rows_li, LINEITEM_SCHEMA)
    out = REGISTRY["assoc_rules_parts"].fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pa, r.pb, r.co) == (100, 200, 5)
    assert r.support == pytest.approx(0.5)
    assert r.confidence == pytest.approx(0.5)
    assert r.lift == pytest.approx(1.0)


def test_dq_suite_clean_testdata_passes(spark):
    rows = REGISTRY["dq_constraint_suite"].fn(spark, "/root/testdata/sf0.001").collect()
    names = [r.constraint_name for r in rows]
    assert names == sorted(names) and len(names) == 6
    verdicts = {r.constraint_name: r.passed for r in rows}
    assert verdicts["completeness_o_custkey"]
    assert verdicts["ref_integrity_custkey"]
    assert verdicts["row_count_nonzero"]
    assert verdicts["accepted_status_FOP"]


def test_dq_suite_flags_violations(spark, tmp_path):
    # one null custkey, duplicate orderkey, negative price, bad status,
    # and an orphan custkey vs an empty-ish customer dim
    orders = [
        (1, 1, "F", 10.0, _D0, "x"),
        (1, None, "Z", -5.0, _D0, "x"),
    ]
    _write(spark, tmp_path, "orders", orders, ORDERS_SCHEMA)
    sf = _write(
        spark, tmp_path, "customer", [(99, "n", 0, 0.0, "BUILDING")],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    )
    verdicts = {
        r.constraint_name: (r.metric, r.passed)
        for r in REGISTRY["dq_constraint_suite"].fn(spark, sf).collect()
    }
    assert verdicts["completeness_o_custkey"] == (0.5, False)
    assert verdicts["unique_o_orderkey"] == (0.5, False)
    assert verdicts["min_o_totalprice_nonneg"] == (-5.0, False)
    assert verdicts["accepted_status_FOP"] == (1.0, False)
    assert verdicts["ref_integrity_custkey"] == (1.0, False)


def test_rank_median_and_mad_crafted(spark, tmp_path):
    def ev(i, etype, v):
        return (i, _D0, 1, etype, float(v), "{}")

    rows = [ev(i, "odd", v) for i, v in enumerate([1, 2, 3, 4, 5])] + [
        ev(10 + i, "even", v) for i, v in enumerate([1, 2, 3, 4])
    ]
    sf = _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {
        r.event_type: (r.n, r.median, r.mad)
        for r in REGISTRY["stats_mad_by_event_type"].fn(spark, sf).collect()
    }
    # odd n: median 3, deviations [2,1,0,1,2] -> sorted [0,1,1,2,2] -> MAD 1
    assert got["odd"] == (5, 3.0, 1.0)
    # even n: median (2+3)/2 = 2.5, devs [1.5,.5,.5,1.5] -> MAD (0.5+1.5)/2 = 1
    assert got["even"] == (4, 2.5, 1.0)

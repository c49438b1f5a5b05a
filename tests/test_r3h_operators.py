"""Round-3 ninth-tranche pins: balanced-sampling gate arithmetic, CUSUM
on a crafted mean shift, sweep-line concurrency, and Pareto classes."""

from __future__ import annotations

import datetime as dt

import pytest

from markt_database_analyzer_spark.catalog import REGISTRY

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)
ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
LINEITEM_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double, l_tax double,"
    " l_returnflag string, l_linestatus string, l_shipdate timestamp"
)
_D0 = dt.datetime(2024, 1, 1)


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )
    return str(tmp_path)


def test_balanced_sampling_shrinks_majority_only(spark):
    rows = REGISTRY["sample_balanced_classes"].fn(spark, "/root/testdata/sf0.01").collect()
    by_lang = {r.lang: (r.n_before, r.n_after) for r in rows}
    target = min(nb for nb, _ in by_lang.values())
    for lang, (nb, na) in by_lang.items():
        assert na <= nb
        # expected kept ≈ target for every class (binomial, loose bound)
        assert abs(na - target) <= max(10, int(0.35 * target)), (lang, na, target)


def test_cusum_locates_crafted_mean_shift(spark, tmp_path):
    # 20 points at 0, then 20 points at 10: |CUSUM| peaks exactly at the
    # last pre-shift point (index 19)
    def ev(i, v):
        return (i, _D0 + dt.timedelta(minutes=i), 1, "s", float(v), "{}")

    rows = [ev(i, 0.0) for i in range(20)] + [ev(20 + i, 10.0) for i in range(20)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    r = REGISTRY["events_changepoint_cusum"].fn(spark, sf).collect()[0]
    assert r.cp_event_id == 19
    # mean is 5: after 20 points at 0, S = 20 * (0-5) = -100
    assert r.max_dev == pytest.approx(-100.0, abs=1e-6)


def test_open_intervals_sweep_line(spark, tmp_path):
    # order 1 open day0, ships day2 (closes day3); order 2 open day1,
    # ships day1 (closes day2)
    orders = [
        (1, 1, "F", 1.0, _D0, "x"),
        (2, 1, "F", 1.0, _D0 + dt.timedelta(days=1), "x"),
    ]
    lines = [
        (1, 10, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _D0 + dt.timedelta(days=2)),
        (2, 11, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _D0 + dt.timedelta(days=1)),
    ]
    _write(spark, tmp_path, "orders", orders, ORDERS_SCHEMA)
    sf = _write(spark, tmp_path, "lineitem", lines, LINEITEM_SCHEMA)
    got = [
        (r.day.day, r.n_opened, r.n_closed, r.open_count)
        for r in REGISTRY["intervals_open_orders_daily"].fn(spark, sf).collect()
    ]
    # day1: +order1 (open=1); day2: +order2 (open=2); day3: order2 closes
    # (open=1); day4: order1 closes (open=0)
    assert got == [(1, 1, 0, 1), (2, 1, 0, 2), (3, 0, 1, 1), (4, 0, 1, 0)]


def test_pareto_classes_partition_and_order(spark):
    rows = {r.abc: (r.n_parts, r.class_revenue)
            for r in REGISTRY["parts_abc_pareto"].fn(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    total_rev = sum(v for _, v in rows.values())
    # A carries at least its share: cum<=0.8 boundary means A-revenue <= 80%
    assert rows["A"][1] <= 0.8 * total_rev + 1e-6 or rows["A"][0] == 1
    # Pareto shape: the A class has fewer parts per revenue unit than C
    if "C" in rows:
        a_n, a_rev = rows["A"]
        c_n, c_rev = rows["C"]
        assert a_rev / max(a_n, 1) > c_rev / max(c_n, 1)

"""Unit pins for the round-3 twenty-eighth tranche: multi-distinct
reconciliation and LOCF step-fill semantics."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def test_multi_distinct_reconciles(spark):
    rows = REGISTRY["agg_multi_distinct"].fn(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type = collections.defaultdict(list)
    for e in ev:
        by_type[e["event_type"]].append(e)
    got = {r["event_type"]: r for r in rows}
    assert set(got) == set(by_type)
    for et, es in by_type.items():
        r = got[et]
        assert r["n_events"] == len(es)
        assert r["n_users"] == len({e["user_id"] for e in es})
        assert r["n_days"] == len({e["ts"].date() for e in es})
        assert r["n_value_decades"] == len({int(e["value"] // 10) for e in es})
    # the plan uses ONE Expand pass, not a scan per metric
    plan = (
        REGISTRY["agg_multi_distinct"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan


def test_locf_step_semantics(spark):
    rows = REGISTRY["gapfill_locf_hourly"].fn(spark, SF).collect()
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    n_hours = {len(v) for v in by_user.values()}
    assert len(n_hours) == 1, "every user gets the identical hourly spine"
    for uid, rs in by_user.items():
        rs.sort(key=lambda r: r["hour_ts"])
        carried = None
        for r in rs:
            if r["observed"] is not None:
                assert r["was_gap"] is False
                assert r["filled"] == r["observed"]
                carried = r["observed"]
            else:
                assert r["was_gap"] is True
                assert r["filled"] == carried  # None before first obs
    # gaps exist and are filled (the point of the operator)
    gaps = [r for r in rows if r["was_gap"] and r["filled"] is not None]
    assert gaps

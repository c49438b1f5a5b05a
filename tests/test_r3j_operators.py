"""Round-3 eleventh-tranche pins: star denorm vs manual join, daily-KPI
stitching nulls, winsorization bounds, and ER cluster structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def test_star_denormalize_totals(spark):
    from markt_database_analyzer_spark.sources import read_table

    out = REGISTRY["join_star_denormalize"].fn(spark, SF)
    rows = out.collect()
    assert len(rows) > 0
    # region×flag cells partition the joined fact: n sums to the join size
    li_n = (
        read_table(spark, SF, "lineitem")
        .join(read_table(spark, SF, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert sum(r.n for r in rows) == li_n


def test_daily_kpi_stitch_zero_fills(spark):
    out = REGISTRY["pipeline_analytics_daily"].fn(spark, SF).collect()
    days_with_orders_only = [r for r in out if r.n_events == 0]
    for r in days_with_orders_only:
        assert r.avg_value is None and r.n_orders > 0  # null-kept avg
    assert all(r.n_events >= 0 and r.n_orders >= 0 for r in out)
    # orders run to 2001 while events stop earlier -> both kinds exist
    assert any(r.n_orders > 0 for r in out)
    assert any(r.n_events > 0 for r in out)


def test_winsorized_mean_is_bounded_and_tamer(spark):
    rows = REGISTRY["stats_winsorized_mean"].fn(spark, SF).collect()
    for r in rows:
        assert r.lo <= r.hi
        assert r.lo <= r.winsorized_mean <= r.hi
        # clipping can only pull the mean toward the interior
        assert abs(r.winsorized_mean - (r.lo + r.hi) / 2) <= abs(
            max(r.raw_mean, r.hi) - min(r.raw_mean, r.lo)
        )


def test_er_clusters_are_consistent(spark):
    out = REGISTRY["er_fuzzy_canonicalize"].fn(spark, SF).collect()
    by_id = {r.doc_id: r for r in out}
    # every cluster id is a member of its own cluster and is kept
    clusters = {}
    for r in out:
        clusters.setdefault(r.cluster_id, []).append(r)
    for cid, members in clusters.items():
        assert by_id[cid].cluster_id == cid
        assert by_id[cid].keep
        # exactly one survivor per cluster, and it is the min id
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1 and keepers[0].doc_id == min(m.doc_id for m in members)
        # size column agrees with membership
        assert all(m.cluster_size == len(members) for m in members)
    # the fuzzy matcher does find multi-entity clusters on the testdata
    assert any(len(m) > 1 for m in clusters.values())

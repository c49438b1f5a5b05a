"""Unit pins for the round-3 fifteenth tranche: KS / Mann-Whitney rank
statistics on hand-checked samples, ACF / silhouette bounds, weighted
median exactness vs a pandas recomputation, and the mapInArrow surface
vs the native expression twin."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def _rank_frame(spark, a, b):
    rows = [("click", float(x)) for x in a] + [("view", float(x)) for x in b]
    return spark.createDataFrame(rows, ["event_type", "value"])


def _ks_d(spark, a, b):
    df = _rank_frame(spark, a, b)
    pv = df.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("c2"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    run = pv.select(F.sum("c1").over(w).alias("r1"), F.sum("c2").over(w).alias("r2"))
    tot = pv.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    j = run.crossJoin(F.broadcast(tot))
    r = j.agg(
        F.max(F.abs(F.col("r1") * F.col("n2") - F.col("r2") * F.col("n1"))).alias("d"),
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
    ).collect()[0]
    return r["d"] / (r["n1"] * r["n2"])


def test_ks_identical_samples_zero_and_disjoint_one(spark):
    assert _ks_d(spark, [1, 2, 3, 4], [1, 2, 3, 4]) == 0.0
    assert _ks_d(spark, [1, 2, 3], [10, 11, 12]) == 1.0
    # shifted overlap: ECDF gap of 2/4 at value 2
    assert abs(_ks_d(spark, [1, 2, 3, 4], [3, 4, 5, 6]) - 0.5) < 1e-12


def test_mannwhitney_hand_case_with_ties(spark):
    # a=[1,2,3], b=[2,3,4]: midranks 1, 2.5, 4.5 -> R1=8, U1=2, U2=7
    df = _rank_frame(spark, [1, 2, 3], [2, 3, 4])
    pv = df.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("c1"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("c2"),
        F.count(F.lit(1)).alias("c"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    rk = pv.select(
        "c1", "c2", "c", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum_excl")
    )
    s = rk.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cum_excl") + F.col("c") + 1)).alias("two_r1"),
        F.sum(F.col("c") ** 3 - F.col("c")).alias("ties"),
    ).collect()[0]
    two_r1 = s["two_r1"]
    assert two_r1 == 16  # 2*R1
    u1 = (two_r1 - s["n1"] * (s["n1"] + 1)) / 2
    assert u1 == 2.0
    assert s["n1"] * s["n2"] - u1 == 7.0
    assert s["ties"] == (2**3 - 2) * 2  # two tied pairs


def test_mannwhitney_catalog_consistency(spark):
    r = REGISTRY["stats_mannwhitney_u"].fn(spark, SF).collect()[0]
    assert abs((r["u1"] + r["u2"]) - r["n1"] * r["n2"]) < 1e-9
    assert math.isfinite(r["z_stat"])


def test_acf_bounds_and_shape(spark):
    rows = REGISTRY["ts_autocorrelation"].fn(spark, SF).collect()
    assert [r["lag"] for r in rows] == [1, 2, 3, 4, 5, 6]
    for r in rows:
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9


def test_silhouette_bounds_and_coverage(spark):
    rows = REGISTRY["embeddings_silhouette_simplified"].fn(spark, SF).collect()
    assert len(rows) >= 2
    assert sum(r["n_vecs"] for r in rows) > 0
    for r in rows:
        assert -1.0 - 1e-9 <= r["mean_silhouette"] <= 1.0 + 1e-9


def test_weighted_median_matches_pandas(spark):
    got = {
        r["flag"]: r["weighted_median_price"]
        for r in REGISTRY["stats_weighted_median"].fn(spark, SF).collect()
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["w"] = (li["l_quantity"] * 1e6).round().astype("int64")
    for flag, g in li.groupby("l_returnflag"):
        pv = g.groupby("l_extendedprice")["w"].sum().sort_index()
        cum = pv.cumsum()
        tot = pv.sum()
        want = cum.index[(2 * cum >= tot).argmax()]
        assert got[flag] == want, flag


def test_map_in_arrow_equals_native_expressions(spark):
    got = REGISTRY["udf_map_in_arrow"].fn(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    native = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(
            F.length(F.trim("text"))
            - F.length(F.replace(F.trim("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("long")
        .alias("n_tokens_ws"),
    )
    assert got.exceptAll(native).count() == 0
    assert native.exceptAll(got).count() == 0


def test_pivot_dynamic_row_sums_equal_daily_counts(spark):
    wide = REGISTRY["pivot_dynamic_event_types"].fn(spark, SF)
    types = [c for c in wide.columns if c != "day"]
    summed = wide.select(
        "day", sum(F.col(t) for t in types).alias("n")
    )
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .count()
        .withColumnRenamed("count", "n")
    )
    assert summed.exceptAll(daily).count() == 0
    assert daily.exceptAll(summed).count() == 0

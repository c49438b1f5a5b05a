"""Unit pins for the round-3 sixteenth tranche: Kaplan-Meier vs a pure
Python recomputation, bootstrap CI sanity, STL decomposition identity,
boxplot fence consistency, MinHash estimator behavior on crafted docs,
and pipe-syntax equivalence."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY
from markt_database_analyzer_spark.datapipe import dedup as dd

SF = "/root/testdata/sf0.001"


def test_kaplan_meier_matches_pure_python(spark):
    got = {
        r["t_days"]: r
        for r in REGISTRY["events_kaplan_meier"].fn(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    days = ev["ts"].dt.floor("D")
    per_user = days.groupby(ev["user_id"]).agg(["min", "max"])
    max_day = per_user["max"].max()
    t = (per_user["max"] - per_user["min"]).dt.days
    event = (per_user["max"] < max_day).astype(int)
    km = pd.DataFrame({"t": t, "ev": event})
    surv = 1.0
    n_at_risk = len(km)
    expected = {}
    for tt in sorted(km["t"].unique()):
        grp = km[km["t"] == tt]
        d = int(grp["ev"].sum())
        if d > 0:
            if d >= n_at_risk:
                surv = 0.0
            else:
                surv *= 1.0 - d / n_at_risk
            expected[tt] = (n_at_risk, d, len(grp) - d, surv)
        n_at_risk -= len(grp)
    assert set(got) == set(expected)
    for tt, (n_risk, d, c, s) in expected.items():
        r = got[tt]
        assert r["n_risk"] == n_risk
        assert r["d_events"] == d
        assert r["c_censored"] == c
        assert abs(r["survival"] - s) < 1e-6, tt


def test_bootstrap_ci_brackets_the_mean(spark):
    r = REGISTRY["stats_bootstrap_ci"].fn(spark, SF).collect()[0]
    assert r["n_resamples"] == 64
    assert r["ci_lo"] <= r["mean_of_means"] <= r["ci_hi"]
    true_mean = (
        spark.read.parquet(f"{SF}/events.parquet").agg(F.avg("value")).collect()[0][0]
    )
    # half-sample means of a well-behaved distribution: CI must bracket
    # the population mean comfortably at this n
    assert r["ci_lo"] <= true_mean <= r["ci_hi"]


def test_stl_decomposition_identity_and_outlier_rate(spark):
    rows = REGISTRY["ts_stl_residual_outliers"].fn(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # x = trend + seasonal + residual (to presentation rounding)
        assert abs(r["x"] - (r["trend"] + r["seasonal"] + r["residual"])) < 5e-6
    n_out = sum(1 for r in rows if r["is_outlier"])
    # 3-sigma gate: outliers must be a small minority
    assert n_out <= max(1, len(rows) // 10)


def test_boxplot_fences_match_pandas(spark):
    got = {
        r["event_type"]: r
        for r in REGISTRY["stats_boxplot_by_event_type"].fn(spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    for et, g in ev.groupby("event_type"):
        v = g["value"]
        q1, med, q3 = v.quantile([0.25, 0.5, 0.75], interpolation="linear")
        r = got[et]
        assert r["n"] == len(v)
        assert abs(r["q1"] - q1) < 1e-6
        assert abs(r["median"] - med) < 1e-6
        assert abs(r["q3"] - q3) < 1e-6
        lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
        assert r["n_low_outliers"] == int((v < lo).sum())
        assert r["n_high_outliers"] == int((v > hi).sum())


def test_minhash_estimate_identical_docs_and_bounds(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "totally different words nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    sh = dd.shingle_projection(docs, "text", "doc_id", 3)
    cand = dd.minhash_lsh_candidates(docs, "text", "doc_id", 16, 4, shingled=sh)
    sig = dd.km_signatures(sh, 16)
    pairs = (
        cand.join(sig.select(F.col("doc").alias("id_a"), F.col("sig").alias("sig_a")), "id_a")
        .join(sig.select(F.col("doc").alias("id_b"), F.col("sig").alias("sig_b")), "id_b")
        .withColumn(
            "est",
            F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda v: v))
            / F.lit(16.0),
        )
        .collect()
    )
    # identical docs must band together and agree on every component
    assert any(p["id_a"] == 1 and p["id_b"] == 2 and p["est"] == 1.0 for p in pairs)
    for p in pairs:
        assert 0.0 <= p["est"] <= 1.0


def test_minhash_estimate_error_is_sketch_sized(spark):
    rows = REGISTRY["dedup_minhash_jaccard_estimate"].fn(spark, SF).collect()
    for r in rows:
        assert abs(r["abs_err"] - abs(r["est_jaccard"] - r["exact_jaccard"])) < 1e-12
    for r in rows:
        # a banded candidate has >= one fully-agreeing band: est >= rows/k
        assert r["est_jaccard"] >= 4 / 16 - 1e-12
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0


def test_pipe_syntax_equals_classic_sql(spark):
    got = REGISTRY["sql_pipe_syntax_revenue"].fn(spark, SF)
    spark.read.parquet(f"{SF}/lineitem.parquet").createOrReplaceTempView(
        "lineitem_pipe_classic"
    )
    classic = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000.0)
                             AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS revenue
        FROM lineitem_pipe_classic
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    assert got.exceptAll(classic).count() == 0
    assert classic.exceptAll(got).count() == 0

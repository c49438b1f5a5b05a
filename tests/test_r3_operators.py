"""Round-3 operator semantics pins: URL canonicalization edges, entropy
known values, weighted-reservoir bias, Python DataSource partition
planning, gap-fill interpolation on a crafted series."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from markt_database_analyzer_spark.datapipe import text as tx


def test_canonical_url_edges(spark):
    cases = [
        # scheme + www + fragment + tracking params all stripped
        ("https://www.Ex.ORG/a/b?utm_source=x&id=7#frag", "ex.org/a/b?id=7"),
        # default port dropped, trailing slash dropped
        ("http://ex.org:443/path/", "ex.org/path"),
        ("ex.org:80", "ex.org"),
        # non-default port kept, path case preserved
        ("https://ex.org:8080/CaseSensitive", "ex.org:8080/CaseSensitive"),
        # all params are tracking -> no '?' at all
        ("ex.org/x?gclid=1&fbclid=2", "ex.org/x"),
        # bare host
        ("https://www.ex.org", "ex.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(tx.canonical_url("u").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_entropy_known_values(spark):
    df = spark.createDataFrame(
        [("aaaa",), ("abab",), ("abcd",), ("",)], "t string"
    )
    got = [
        r[0] for r in df.select(tx._entropy(tx.char_items("t")).alias("h")).collect()
    ]
    assert got[0] == 0.0                      # single symbol -> 0 bits
    assert abs(got[1] - 1.0) < 1e-9           # two equiprobable -> 1 bit
    assert abs(got[2] - 2.0) < 1e-9           # four equiprobable -> 2 bits
    assert got[3] == 0.0                      # empty -> defined 0


def test_weighted_reservoir_prefers_heavy_docs(spark):
    """A-ES with weight w: P(selected) grows with w. With one document
    1000x heavier than 99 light ones, the heavy one must appear in the
    k=5 sample (P(miss) ~ (1-k*w_frac) -> negligible), and the sample
    must be reproducible."""
    from markt_database_analyzer_spark.catalog import REGISTRY

    sf = "/root/testdata/sf0.001"
    a = REGISTRY["sample_weighted_reservoir"].fn(spark, sf).collect()
    b = REGISTRY["sample_weighted_reservoir"].fn(spark, sf).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]  # deterministic
    # every lang emits exactly 5 rows, ranked 1..5
    by_lang = {}
    for r in a:
        by_lang.setdefault(r["lang"], []).append(r["pos"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_lang.values())


def test_weighted_reservoir_bias_synthetic(spark):
    """Direct bias check on a crafted frame: heavy docs (w=10000) must
    dominate a k=5 sample over light docs (w=1) — the E-S key ordering
    by -ln(u)/w makes this overwhelmingly likely, deterministically."""
    from markt_database_analyzer_spark.datapipe import sampling as smp

    rows = [(i, "x", 10_000 if i < 10 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    u = (smp._gate("doc_id", seed=11) + 1).cast("double") / F.lit(
        float(smp.RESOLUTION + 1)
    )
    key = F.round(-F.log(u), 9) / F.col("n_chars")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    picked = [
        r["doc_id"]
        for r in df.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 5)
        .collect()
    ]
    assert sum(1 for d in picked if d < 10) >= 4  # heavy docs dominate


def test_pysource_partition_planning(spark):
    """The custom source must plan 8 input partitions (8 tasks) and the
    union over stripes must be exactly range(n) — location-independent."""
    from markt_database_analyzer_spark.sources.pysource import (
        register_synthetic_docs,
    )

    register_synthetic_docs(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", "1000")
        .option("partitions", "8")
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    ids = sorted(r["doc_id"] for r in df.collect())
    assert ids == list(range(1000))
    one = df.filter(F.col("doc_id") == 97).first()
    assert one["lang"] == "fr" and one["score"] == 0.0  # 97 % 97 == 0


def test_gapfill_linear_interpolation_crafted(spark):
    """Hand-built hourly series: values at hours 0 and 3, gap at 1-2 ->
    linear interpolation 10, 20, 30, 40; leading/trailing boundary gaps
    stay null."""
    from pyspark.sql import Window

    rows = [
        ("a", "2024-01-01 00:00:00", 10.0),
        ("a", "2024-01-01 03:00:00", 40.0),
    ]
    df = (
        spark.createDataFrame(rows, "event_type string, ts string, value double")
        .withColumn("ts", F.to_timestamp("ts"))
    )
    hourly = df.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_ts")
    ).agg(F.avg("value").alias("avg_value"))
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias(
                "hour_ts"
            ),
        )
    )
    joined = spine.join(hourly, ["event_type", "hour_ts"], "left").withColumn(
        "hl", (F.col("hour_ts").cast("long") / 3600).cast("bigint")
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_h = F.when(F.col("avg_value").isNotNull(), F.col("hl"))
    ctx = (
        joined.withColumn("pv", F.last("avg_value", ignorenulls=True).over(w_prev))
        .withColumn("pt", F.last(known_h, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("avg_value", ignorenulls=True).over(w_next))
        .withColumn("nt", F.first(known_h, ignorenulls=True).over(w_next))
    )
    interp = F.when(F.col("avg_value").isNotNull(), F.col("avg_value")).when(
        F.col("pv").isNotNull() & F.col("nv").isNotNull(),
        F.round(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (F.col("hl") - F.col("pt"))
            / (F.col("nt") - F.col("pt")),
            9,
        ),
    )
    got = [
        r["v"]
        for r in ctx.select(interp.alias("v")).orderBy("hour_ts").collect()
    ]
    assert got == [10.0, 20.0, 30.0, 40.0]


def test_pack_sequences_capacity_and_determinism(spark):
    """Every packed sequence holds exactly capacity/bucket slots (the
    last sequence per bucket may be partial), slots are dense from 0,
    and the assignment is reproducible."""
    from markt_database_analyzer_spark.catalog import REGISTRY

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["pack_sequences_bucketed"].fn(spark, sf).collect()
    assert rows
    per = {}
    for r in rows:
        assert r["n_tokens"] <= r["bucket"] <= 512
        per.setdefault((r["bucket"], r["seq_id"]), []).append(r["slot"])
    for (bucket, _), slots in per.items():
        cap = 512 // bucket
        assert sorted(slots) == list(range(len(slots)))
        assert len(slots) <= cap


def test_cdc_snapshot_diff_op_classes(spark):
    """Every %10==3 key is an INSERT, every %10==0 key a DELETE, every
    surviving %7==0 key an UPDATE with new = old + 100; no unchanged
    rows leak into the changelog."""
    from markt_database_analyzer_spark.catalog import REGISTRY

    rows = REGISTRY["cdc_snapshot_diff"].fn(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        k = r["o_orderkey"]
        if r["op"] == "I":
            assert k % 10 == 3 and r["old_price"] is None
        elif r["op"] == "D":
            assert k % 10 == 0 and r["new_price"] is None
        else:
            assert r["op"] == "U" and k % 7 == 0
            assert abs(r["new_price"] - r["old_price"] - 100.0) < 1e-9


def test_prefix_filter_join_equals_brute_force(spark):
    """The prefix filter must be LOSSLESS: pairs from the filtered join
    equal the brute-force all-pairs Jaccard>=0.9 set on a small frame."""
    from itertools import combinations

    from markt_database_analyzer_spark.catalog import REGISTRY
    from markt_database_analyzer_spark.sources import read_table
    from markt_database_analyzer_spark.datapipe import text as tx

    sf = "/root/testdata/sf0.001"
    got = {
        (r["id_a"], r["id_b"])
        for r in REGISTRY["join_set_similarity_prefix"].fn(spark, sf).collect()
    }
    docs = {
        r["doc_id"]: set(r["ts"])
        for r in read_table(spark, sf, "documents")
        .filter(F.col("doc_id") % 5 == 0)  # the entry's 1/5 sample
        .select("doc_id", F.array_distinct(tx.tokens("text")).alias("ts"))
        .collect()
    }
    want = set()
    for a, b in combinations(sorted(docs), 2):
        inter = len(docs[a] & docs[b])
        uni = len(docs[a] | docs[b])
        if inter * 10 >= 9 * uni:
            want.add((a, b))
    assert got == want


def test_histogram_equi_depth_balanced(spark):
    from markt_database_analyzer_spark.catalog import REGISTRY

    rows = REGISTRY["histogram_equi_depth"].fn(spark, "/root/testdata/sf0.001").collect()
    counts = [r["n"] for r in rows]
    assert len(counts) == 10
    assert max(counts) - min(counts) <= 1          # equal depth
    lows = [r["lo"] for r in rows]
    assert lows == sorted(lows)                    # ordered buckets


def test_regression_recovers_planted_slope(spark):
    """OLS on a planted line y = 3x + 7 (exact doubles) must recover
    slope/intercept to the rounding grid."""
    from pyspark.sql import functions as F
    from markt_database_analyzer_spark.functions import davg, dsum

    df = spark.createDataFrame(
        [(float(i), 3.0 * i + 7.0) for i in range(100)], "x double, y double"
    ).withColumn("event_type", F.lit("k"))
    means = df.groupBy("event_type").agg(
        davg(F.col("x")).alias("xbar"), davg(F.col("y")).alias("ybar")
    )
    dx = F.col("x") - F.col("xbar")
    dy = F.col("y") - F.col("ybar")
    got = (
        df.join(F.broadcast(means), "event_type")
        .groupBy("event_type")
        .agg(dsum(dx * dy).alias("sxy"), dsum(dx * dx).alias("sxx"),
             F.min("xbar").alias("xbar"), F.min("ybar").alias("ybar"))
        .select(
            (F.col("sxy") / F.col("sxx")).alias("slope"),
            (F.col("ybar") - (F.col("sxy") / F.col("sxx")) * F.col("xbar")).alias("b"),
        )
        .first()
    )
    assert abs(got["slope"] - 3.0) < 1e-6 and abs(got["b"] - 7.0) < 1e-4


def test_funnel_monotone(spark):
    from markt_database_analyzer_spark.catalog import REGISTRY

    r = REGISTRY["events_funnel_stages"].fn(spark, "/root/testdata/sf0.001").first()
    assert r["n_users"] >= r["n_view"] >= r["n_view_click"] >= r["n_view_click_purchase"]
    assert 0.0 <= r["full_funnel_rate"] <= 1.0


def test_profile_stats_consistency(spark):
    from markt_database_analyzer_spark.catalog import REGISTRY

    rows = REGISTRY["profile_table_stats"].fn(spark, "/root/testdata/sf0.001").collect()
    assert {r["col_name"] for r in rows} == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    }
    for r in rows:
        assert r["n_nulls"] >= 0 and r["n_distinct"] <= r["n_rows"]
        assert r["min_value"] <= r["max_value"]

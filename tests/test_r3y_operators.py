"""Unit pins for the round-3 twenty-sixth tranche: skyline dominance vs
a brute-force check, Zipf fit vs numpy polyfit, named-window running
sums, freshness lag identities."""

from __future__ import annotations

import collections
import math

import numpy as np

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def test_skyline_matches_bruteforce(spark):
    rows = REGISTRY["parts_skyline_2d"].fn(spark, SF).collect()
    parts = [
        (p["p_partkey"], int(round(p["p_retailprice"] * 100)), p["p_size"])
        for p in spark.read.parquet(f"{SF}/part.parquet").collect()
        if p["p_partkey"] <= 2000
    ]

    def dominated(a):
        return any(
            (b[1] <= a[1] and b[2] >= a[2]) and (b[1] < a[1] or b[2] > a[2])
            for b in parts
        )

    expect = sorted(
        [(k, pc, sz) for (k, pc, sz) in parts if not dominated((k, pc, sz))],
        key=lambda t: (t[1], t[0]),
    )
    got = [(r["p_partkey"], r["price_cents"], r["size"]) for r in rows]
    assert got == expect
    # the front is monotone: price increases, size strictly increases
    szs = [r["size"] for r in rows]
    assert all(a < b for a, b in zip(szs, szs[1:]))


def test_zipf_fit_matches_polyfit(spark):
    r = REGISTRY["text_zipf_fit"].fn(spark, SF).collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    tf = collections.Counter(
        t for d in docs for t in d["text"].lower().strip().split() if t
    )
    assert r["vocab_size"] == len(tf)
    ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(c) for _, c in ranked]
    slope, intercept = np.polyfit(xs, ys, 1)
    # the catalog's quantized OLS sits within numerical noise of polyfit
    assert abs(r["slope"] - slope) < 1e-3
    assert abs(r["intercept"] - intercept) < 1e-2
    assert r["zipf_exponent"] == -r["slope"]
    # a templated synthetic corpus is much flatter than natural language
    assert 0 < r["zipf_exponent"] < 2


def test_named_window_running_sums(spark):
    rows = REGISTRY["sql_named_window"].fn(spark, SF).collect()
    by_cust = collections.defaultdict(list)
    for r in rows:
        by_cust[r["o_custkey"]].append(r)
    for cust, rs in by_cust.items():
        rs.sort(key=lambda r: r["order_seq"])
        assert [r["order_seq"] for r in rs] == list(range(1, len(rs) + 1))
        running = 0
        for r in rs:
            running += r["price_cents"]
            assert r["running_cents"] == running, cust


def test_freshness_lag_identities(spark):
    rows = REGISTRY["dq_freshness_lag"].fn(spark, SF).collect()
    assert len(rows) == 5
    # exactly the freshest source has zero staleness
    zeros = [r for r in rows if r["staleness_min"] == 0.0]
    assert len(zeros) >= 1
    for r in rows:
        assert r["staleness_min"] >= 0
        assert r["violates_sla"] == (r["staleness_min"] > 60.0)
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    n = collections.Counter(e["event_type"] for e in ev)
    for r in rows:
        assert r["n_events"] == n[r["event_type"]]

"""Unit pins for the round-3 fourteenth tranche: C4 line rules, CCNet
terciles, Welch t-test, correlation matrix, triangle counting, epoch
upsampling. Crafted inputs with hand-checked outcomes — the differential
oracle covers the testdata path; these pin the semantics the synthetic
corpus cannot reach (punctuation rules, known correlations, known
triangle counts, exact fractional-copy multiplicities)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY
from markt_database_analyzer_spark.datapipe import text as tx
from markt_database_analyzer_spark.datapipe.clustering import triangle_stats
from markt_database_analyzer_spark.datapipe.sampling import RESOLUTION, _gate

SF = "/root/testdata/sf0.001"


def test_c4_line_keep_rules(spark):
    lines = [
        ("This is a perfectly fine sentence.", True),
        ("Short.", False),  # < 3 words
        ("no terminal punctuation here", False),
        ('He said "stop right there."', True),
        ("Is this a question?", True),
        ("An exclamation happens here!", True),
        ("function f() { return 1; }.", False),  # curly brace
        ("Lorem Ipsum dolor sit amet.", False),  # boilerplate marker
        ("Trailing quote counts as terminal.", True),
    ]
    df = spark.createDataFrame([(i, l) for i, (l, _) in enumerate(lines)], ["i", "l"])
    got = {
        r["i"]: r["keep"]
        for r in df.select("i", tx.c4_line_keep(F.col("l")).alias("keep")).collect()
    }
    for i, (l, want) in enumerate(lines):
        assert got[i] == want, l


def test_c4_catalog_doc_gate_consistent(spark):
    out = REGISTRY["text_c4_line_filters"].fn(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_lines"]
        assert r["keep_doc"] == (r["n_kept"] >= 3)
    # the hash-parity punctuation derivation must yield a real mixture
    kept = sum(r["n_kept"] for r in out)
    total = sum(r["n_lines"] for r in out)
    assert 0 < kept < total


def test_welch_ttest_hand_computed(spark):
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0, 8.0]
    rows = [("click", x) for x in a] + [("view", x) for x in b]
    df = spark.createDataFrame(rows, ["event_type", "value"])

    # direct expected values
    n1, n2 = len(a), len(b)
    m1, m2 = sum(a) / n1, sum(b) / n2
    v1 = sum((x - m1) ** 2 for x in a) / (n1 - 1)
    v2 = sum((x - m2) ** 2 for x in b) / (n2 - 1)
    se = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se)
    dof = se * se / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))

    # run the same aggregation shape on the crafted frame
    cond_a = F.col("event_type") == "click"
    cond_b = F.col("event_type") == "view"
    q = F.round(F.col("value") * 1000000.0).cast("decimal(38,0)")
    s = df.agg(
        F.count(F.when(cond_a, 1)).alias("n1"),
        F.count(F.when(cond_b, 1)).alias("n2"),
        F.sum(F.when(cond_a, q)).cast("double").alias("a1"),
        F.sum(F.when(cond_a, q * q)).cast("double").alias("a2"),
        F.sum(F.when(cond_b, q)).cast("double").alias("b1"),
        F.sum(F.when(cond_b, q * q)).cast("double").alias("b2"),
    ).collect()[0]
    m1g = s["a1"] / s["n1"] / 1e6
    v1g = (s["a2"] - s["a1"] * s["a1"] / s["n1"]) / (s["n1"] - 1) / 1e12
    assert abs(m1g - m1) < 1e-9
    assert abs(v1g - v1) < 1e-6
    v2g = (s["b2"] - s["b1"] * s["b1"] / s["n2"]) / (s["n2"] - 1) / 1e12
    se1g, se2g = v1g / s["n1"], v2g / s["n2"]
    seg = se1g + se2g
    assert abs((m1g - s["b1"] / s["n2"] / 1e6) / math.sqrt(seg) - t) < 1e-6
    dofg = seg * seg / (
        se1g * se1g / (s["n1"] - 1) + se2g * se2g / (s["n2"] - 1)
    )
    assert abs(dofg - dof) < 1e-6
    assert min(n1, n2) - 1 <= dofg <= n1 + n2 - 2


def test_corr_matrix_perfect_and_anti(spark):
    rows = [(float(i), 2.0 * i + 1.0, -3.0 * i) for i in range(1, 20)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])

    def q(v):
        return F.round(F.col(v) * 1000000.0).cast("decimal(38,0)")

    s = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[F.sum(q(v)).cast("double").alias(f"s_{v}") for v in ("x", "y", "z")],
        *[
            F.sum(q(v) * q(w)).cast("double").alias(f"p_{v}_{w}")
            for i, v in enumerate(("x", "y", "z"))
            for w in ("x", "y", "z")[i:]
        ],
    ).collect()[0]

    def corr(v, w):
        num = s["n"] * s[f"p_{v}_{w}"] - s[f"s_{v}"] * s[f"s_{w}"]
        den = math.sqrt(s["n"] * s[f"p_{v}_{v}"] - s[f"s_{v}"] ** 2) * math.sqrt(
            s["n"] * s[f"p_{w}_{w}"] - s[f"s_{w}"] ** 2
        )
        return num / den

    assert abs(corr("x", "y") - 1.0) < 1e-9
    assert abs(corr("x", "z") + 1.0) < 1e-9


def test_triangle_stats_known_graph(spark):
    # K4 minus edge (3,4): triangles (1,2,3) and (1,2,4) -> 2 triangles,
    # 5 edges, 4 nodes, wedges = sum d(d-1)/2 with degs 3,3,2,2 -> 3+3+1+1=8
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)]
    df = spark.createDataFrame(edges, ["u", "v"])
    r = triangle_stats(df).collect()[0]
    assert r["n_nodes"] == 4
    assert r["n_edges"] == 5
    assert r["n_wedges"] == 8
    assert r["n_triangles"] == 2
    assert abs(r["global_clustering"] - 3 * 2 / 8) < 1e-9


def test_triangle_stats_normalizes_direction_and_dupes(spark):
    # same triangle given as mixed directions + duplicates + self-loop
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (1, 3)]
    df = spark.createDataFrame(edges, ["u", "v"])
    r = triangle_stats(df).collect()[0]
    assert r["n_edges"] == 3
    assert r["n_triangles"] == 1
    assert abs(r["global_clustering"] - 1.0) < 1e-9


def test_epoch_upsample_multiplicities_match_formula(spark):
    out = REGISTRY["sample_epoch_upsample"].fn(spark, SF)
    rows = out.collect()
    # multiplicity of each doc == its n_copies, copy_ids are 1..n
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        n = rs[0]["n_copies"]
        assert len(rs) == n
        assert sorted(r["copy_id"] for r in rs) == list(range(1, n + 1))
    # replay the gate formula for one source and check copy counts
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    gate = _gate("doc_id", seed=11, salt="epoch")
    w_ppm = (
        F.lit(250000)
        + (F.substring("source", 4, 10).cast("int") % 7) * F.lit(500000)
    )
    expect = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            (
                F.floor(w_ppm / F.lit(RESOLUTION))
                + F.when(gate < w_ppm % F.lit(RESOLUTION), 1).otherwise(0)
            ).alias("n"),
        ).collect()
    }
    for doc, n in expect.items():
        assert len(by_doc.get(doc, [])) == n


def test_ccnet_buckets_ordered_and_balanced(spark):
    out = REGISTRY["text_ccnet_buckets"].fn(spark, SF).collect()
    assert len(out) > 0
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        sizes = {
            b: sum(1 for r in rs if r["ppl_bucket"] == b)
            for b in ("head", "middle", "tail")
        }
        # ntile(3): bucket sizes differ by at most 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, (lang, sizes)
        heads = [r["avg_neg_logp"] for r in rs if r["ppl_bucket"] == "head"]
        tails = [r["avg_neg_logp"] for r in rs if r["ppl_bucket"] == "tail"]
        if heads and tails:
            assert max(heads) <= min(tails), lang

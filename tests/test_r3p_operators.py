"""Unit pins for the round-3 seventeenth tranche: k-center geometry on a
crafted point set, link-prediction invariants, multimodal packing layout,
RAKE vs a pure-Python recomputation, attribution window semantics."""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY
from markt_database_analyzer_spark.datapipe.similarity import kcenter_select

SF = "/root/testdata/sf0.001"


def test_kcenter_known_geometry(spark):
    pts = [
        (1, [0.0, 0.0]),
        (2, [0.1, 0.0]),
        (3, [10.0, 0.0]),
        (4, [0.0, 10.0]),
        (5, [5.0, 5.0]),
    ]
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    got = kcenter_select(df, "vec_id", "embedding", k=3).collect()
    # seed = min id; ids 3 and 4 tie at dist^2=100 -> min id (3) wins;
    # then 4 (min-dist 100) beats 5 (min-dist 50)
    assert [r["vec_id"] for r in got] == [1, 3, 4]
    assert got[0]["chosen_dq"] == 0
    assert got[1]["chosen_dq"] == 100 * 10**9
    assert got[2]["chosen_dq"] == 100 * 10**9
    assert sum(r["n_assigned"] for r in got) == len(pts)


def test_kcenter_catalog_radius_decreases(spark):
    rows = REGISTRY["sample_kcenter_coreset"].fn(spark, SF).collect()
    assert len(rows) == 8
    assert rows[0]["rank"] == 0
    # selection distances are non-increasing (greedy farthest-first)
    dists = [r["chosen_dq"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(dists, dists[1:]))
    assert sum(r["n_assigned"] for r in rows) == 500


def test_link_prediction_invariants(spark):
    rows = REGISTRY["graph_link_prediction"].fn(spark, SF).collect()
    assert len(rows) <= 20
    # recompute the WEIGHTED edge set (co-purchased in >= 2 orders — the
    # entry's noise threshold) and check predictions are non-edges of it
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    from collections import Counter

    w: Counter = Counter()
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(g["l_partkey"])
        for i, x in enumerate(ps):
            for y in ps[i + 1 :]:
                if x < y:
                    w[(x, y)] += 1
    edges = {p for p, c in w.items() if c >= 2}
    scores = [r["jaccard_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert (r["u"], r["v"]) not in edges
        assert r["common_neighbors"] >= 2
        assert 0.0 < r["jaccard_score"] <= 1.0
        assert r["common_neighbors"] <= min(r["deg_u"], r["deg_v"])


def test_multimodal_pairs_packing_layout(spark):
    rows = REGISTRY["pipeline_multimodal_pairs"].fn(spark, SF).collect()
    assert rows
    by_bucket = defaultdict(list)
    for r in rows:
        assert r["n_tokens"] <= r["bucket"]
        assert 0 <= r["slot"] < 8
        assert r["emb_norm"] > 0
        by_bucket[r["bucket"]].append(r)
    for bucket, rs in by_bucket.items():
        batches = defaultdict(list)
        for r in rs:
            batches[r["batch_id"]].append(r)
        full = [b for b in batches if len(batches[b]) == 8]
        assert len(batches) - len(full) <= 1, bucket  # only the tail partial


def test_rake_matches_pure_python_per_doc(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["text_keyword_rake"].fn(spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for _, row in docs.head(5).iterrows():
        text = row["text"].strip().lower()
        marked = re.sub(r"\b(?:a|the)\b", "|", text)
        phrases = [
            (i, p.strip()) for i, p in enumerate(marked.split("|")) if p.strip()
        ]
        freq, deg = defaultdict(int), defaultdict(int)
        toks_by_phrase = []
        for i, p in phrases:
            toks = [t for t in re.split(r"\s+", p) if t]
            toks_by_phrase.append((i, p, toks))
            for t in toks:
                freq[t] += 1
                deg[t] += len(toks)
        best = None
        for i, p, toks in toks_by_phrase:
            sq = sum(round(deg[t] / freq[t] * 1e9) for t in toks)
            if best is None or sq > best[0]:  # ascending pos: first wins ties
                best = (sq, i, p)
        r = got[row["doc_id"]]
        assert r["top_phrase"] == best[2]
        assert abs(r["rake_score"] - best[0] / 1e9) < 1e-9


def test_attribution_crafted_windows(spark):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    h, d = timedelta(hours=1), timedelta(days=1)
    rows = [
        # u1: view then purchase 1h later -> 'view'
        (1, base, 1, "view", 1.0, None),
        (2, base + h, 1, "purchase", 1.0, None),
        # u2: purchase with no prior -> 'direct'
        (3, base, 2, "purchase", 1.0, None),
        # u3: click 8 days before purchase -> 'direct'
        (4, base, 3, "click", 1.0, None),
        (5, base + 8 * d, 3, "purchase", 1.0, None),
        # u4: click then purchase then ANOTHER purchase (prior purchase is
        # not a touch) -> both credited to 'click' (second within 7d)
        (6, base, 4, "click", 1.0, None),
        (7, base + h, 4, "purchase", 1.0, None),
        (8, base + 2 * h, 4, "purchase", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r["channel"]: r["n_purchases"]
            for r in REGISTRY["events_attribution_last_touch"].fn(spark, tmp).collect()
        }
    assert got == {"view": 1, "direct": 2, "click": 2}

"""Unit pins for the round-3 twenty-fourth tranche: hard-negative label
discipline and ranking vs numpy, funnel-latency ordering invariants,
MoM/YoY growth identities, feature-hashing norm algebra."""

from __future__ import annotations

import collections
import hashlib
import math

import numpy as np

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def test_hard_negatives_vs_numpy(spark):
    rows = REGISTRY["sample_hard_negatives"].fn(spark, SF).collect()
    emb = {
        e["vec_id"]: (int(e["label"]), np.array(e["embedding"], dtype=np.float64))
        for e in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    by_q = collections.defaultdict(list)
    for r in rows:
        by_q[r["q_id"]].append(r)
        # the defining property: negatives never share the anchor label
        assert r["neg_label"] != r["q_label"]
    for q_id, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        ql, qv = emb[q_id]
        scored = []
        for vid, (lb, v) in emb.items():
            if lb == ql:
                continue
            cos = round(
                float(qv @ v) / (math.sqrt(float(qv @ qv)) * math.sqrt(float(v @ v))), 6
            )
            scored.append((-cos, vid))
        scored.sort()
        expect = [vid for _, vid in scored[:3]]
        got = [r["neg_id"] for r in rs]
        # compare at 6 dp tolerance on cosine ordering: exact rank ties
        # are broken by id in both
        for g, e in zip(got, expect):
            if g != e:
                # allowed only when the cosines tie at the grid
                ge = next(-c for c, vid in scored if vid == g)
                ee = next(-c for c, vid in scored if vid == e)
                assert abs(ge - ee) < 1e-5, (q_id, got, expect)


def test_funnel_latency_invariants(spark):
    r = REGISTRY["events_funnel_latency"].fn(spark, SF).collect()[0]
    assert r["n_viewers"] >= r["n_clicked"] >= r["n_purchased"] >= 0
    if r["n_clicked"]:
        assert r["p50_view_to_click_min"] > 0
        assert r["p90_view_to_click_min"] >= r["p50_view_to_click_min"]
    if r["n_purchased"]:
        assert r["p50_click_to_purchase_min"] > 0
        assert r["p90_click_to_purchase_min"] >= r["p50_click_to_purchase_min"]


def test_mom_yoy_identities(spark):
    rows = REGISTRY["growth_mom_yoy"].fn(spark, SF).collect()
    assert rows[0]["mom_pct"] is None  # no previous month
    for prev, cur in zip(rows, rows[1:]):
        if cur["mom_pct"] is not None:
            expect = round((cur["rev_cents"] - prev["rev_cents"]) * 100.0 / prev["rev_cents"], 6)
            assert abs(cur["mom_pct"] - expect) < 1e-9
    # YoY aligns month m with m-12
    if len(rows) > 12:
        for i in range(12, len(rows)):
            if rows[i]["yoy_pct"] is not None:
                expect = round(
                    (rows[i]["rev_cents"] - rows[i - 12]["rev_cents"])
                    * 100.0
                    / rows[i - 12]["rev_cents"],
                    6,
                )
                assert abs(rows[i]["yoy_pct"] - expect) < 1e-9
    # exact cents reconcile with the raw table
    total = sum(r["rev_cents"] for r in rows)
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    assert total == sum(int(round(o["o_totalprice"] * 100)) for o in orders)


def test_feature_hashing_algebra(spark):
    rows = REGISTRY["text_feature_hashing"].fn(spark, SF).collect()
    by_doc = collections.defaultdict(list)
    for r in rows:
        assert 0 <= r["dim"] < 32
        by_doc[r["doc_id"]].append(r)
    docs = {
        d["doc_id"]: d["text"]
        for d in spark.read.parquet(f"{SF}/documents.parquet").collect()
        if d["doc_id"] < 100
    }
    assert set(by_doc) == set(docs)
    for doc_id, rs in list(by_doc.items())[:20]:
        # recompute dims with the portable md5-60bit hash
        toks = [t for t in docs[doc_id].lower().strip().split() if t]
        cnt: collections.Counter = collections.Counter(
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 32 for t in toks
        )
        got = {r["dim"]: r["cnt"] for r in rs}
        assert got == dict(cnt), doc_id
        # L2 normalization: values square-sum to 1
        ss = sum(r["l2_value"] ** 2 for r in rs)
        assert abs(ss - 1.0) < 1e-6

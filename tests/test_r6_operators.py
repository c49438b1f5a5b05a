"""Round-6 entries: ANN recall@k and distinct-n-gram diversity, pinned
against plain-Python recomputation at sf0.001."""

from __future__ import annotations

from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_ann_recall_matches_topk_overlap(spark):
    """recall@10 must equal the overlap of the two registry top-k
    entries' own outputs, computed in Python."""
    brute = REGISTRY["similarity_bruteforce_topk"].fn(spark, SF_DIR).collect()
    ivf = REGISTRY["similarity_ivf_topk"].fn(spark, SF_DIR).collect()
    got = {
        r["query_id"]: (r["n_hits"], r["recall"])
        for r in REGISTRY["eval_ann_recall_at_k"].fn(spark, SF_DIR).collect()
    }
    b_sets, i_sets = {}, {}
    for r in brute:
        b_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in ivf:
        i_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(b_sets)
    for q, bs in b_sets.items():
        hits = len(bs & i_sets.get(q, set()))
        assert got[q] == (hits, round(hits / 10.0, 9)), q
        assert 0 <= got[q][1] <= 1.0


def test_distinct_ngram_diversity_matches_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    per_lang: dict = {}
    for r in docs:
        toks = [t for t in r["text"].strip().lower().split() if t]
        tris = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        lang = r["lang"]
        tot, dis = per_lang.get(lang, (0, set()))
        per_lang[lang] = (tot + len(tris), dis | set(tris))
    got = {
        r["lang"]: (r["total_trigrams"], r["distinct_trigrams"], r["distinct_ratio"])
        for r in REGISTRY["text_distinct_ngram_diversity"].fn(spark, SF_DIR).collect()
    }
    # only langs with at least one >=3-token doc appear
    expect = {
        lang: (tot, len(dis), round(len(dis) / tot, 9))
        for lang, (tot, dis) in per_lang.items()
        if tot > 0
    }
    assert got == expect
    for tot, dis, ratio in got.values():
        assert 0 < dis <= tot and 0 < ratio <= 1.0


def test_cdc_apply_reconstructs_new_snapshot(spark):
    """apply(diff(a, b), a) == b — the defining MERGE property, checked
    bit-for-bit against an independently built snap_b."""
    out = REGISTRY["cdc_apply_changes"].fn(spark, SF_DIR).collect()
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    snap_b = (
        orders.filter(F.col("o_orderkey") % 10 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 100.0)
            .otherwise(F.col("o_totalprice"))
            .alias("price"),
        )
        .orderBy("o_orderkey")
        .collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in snap_b]


def test_containment_dominates_jaccard_on_shared_candidates(spark):
    """For every pair both entries emit, max(containment) >= jaccard
    (containment uses the smaller denominator), and containment of a
    doc in itself-superset logic stays within [0, 1]."""
    cont = {
        (r["id_a"], r["id_b"]): (r["contain_a"], r["contain_b"])
        for r in REGISTRY["dedup_minhash_containment"].fn(spark, SF_DIR).collect()
    }
    jac = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in REGISTRY["dedup_minhash_lsh"].fn(spark, SF_DIR).collect()
    }
    assert cont, "containment entry emitted nothing at sf0.001"
    for pair, (ca, cb) in cont.items():
        assert 0.0 <= ca <= 1.0 and 0.0 <= cb <= 1.0
        if pair in jac:
            assert max(ca, cb) >= jac[pair] - 1e-9, pair
    # every Jaccard>=0.5 pair is necessarily containment>=0.5 (same
    # candidates, containment >= jaccard pointwise)
    assert set(jac) <= set(cont)


def test_truncate_recall_bounds_and_self_consistency(spark):
    rows = REGISTRY["embeddings_truncate_recall"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["dims"] == 16
        assert 0 <= r["n_hits"] <= 10
        assert abs(r["recall"] - r["n_hits"] / 10.0) < 1e-9

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

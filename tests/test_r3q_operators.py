"""Unit pins for the round-3 eighteenth tranche: Naive Bayes decision
math on a crafted corpus, Benford share algebra, ROC/AUC invariants
(including the exact rank-statistic identity vs Mann-Whitney), quantile
normalization's distribution alignment, isotonic monotonicity + pool
means, and collaborative-filtering cosine bounds."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ NB ---

def test_naive_bayes_posterior_math(spark):
    """Pin the classifier's decision math itself: recompute the add-1
    multinomial posterior for every held-out doc in pure Python (same
    9 dp log rounding, same micro-quantized sum) and check the argmax +
    score agree. (The synthetic corpus shares one vocabulary across
    langs, so ACCURACY is near-chance by construction — the correctness
    claim is the estimator, not the dataset's learnability.)"""
    rows = REGISTRY["classify_naive_bayes_langid"].fn(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()

    def toks(text):
        return [t for t in text.lower().strip().split() if t]

    train = [d for d in docs if d["doc_id"] % 5 != 0]
    test = [d for d in docs if d["doc_id"] % 5 == 0]
    assert len(rows) == len(test)

    from collections import Counter

    counts: Counter = Counter()
    totals: Counter = Counter()
    vocab = set()
    lang_docs: Counter = Counter()
    for d in train:
        lang_docs[d["lang"]] += 1
        for t in toks(d["text"]):
            counts[(d["lang"], t)] += 1
            totals[d["lang"]] += 1
            vocab.add(t)
    v = len(vocab)
    dtot = sum(lang_docs.values())
    langs = sorted(lang_docs)
    priors = {l: round(math.log(lang_docs[l] / dtot), 9) for l in langs}

    got = {r["doc_id"]: r for r in rows}
    for d in test:
        best = None
        for lang in langs:
            micro = 0
            for t in toks(d["text"]):
                ll = round(
                    math.log((counts[(lang, t)] + 1) / (totals[lang] + v)), 9
                )
                micro += int(round(ll * 1_000_000))
            score = priors[lang] + micro / 1_000_000
            key = (-score, lang)
            if best is None or key < best[0]:
                best = (key, lang, score)
        r = got[d["doc_id"]]
        assert r["predicted"] == best[1], (d["doc_id"], r["predicted"], best[1])
        assert abs(r["score"] - round(best[2], 6)) < 1e-6
        assert r["actual"] == d["lang"]
        assert r["correct"] == (r["predicted"] == r["actual"])
        assert r["score"] < 0 and math.isfinite(r["score"])


# ------------------------------------------------------------- Benford ---

def test_benford_shares_and_chi2(spark):
    rows = REGISTRY["stats_benford_digits"].fn(spark, SF).collect()
    assert [r["digit"] for r in rows] == sorted({r["digit"] for r in rows})
    assert all(1 <= r["digit"] <= 9 for r in rows)
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-6
    # Benford expectation sums to 1 over digits 1..9 by construction
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-6
    # chi2_total equals the (quantized) sum of the per-digit terms
    assert all(
        abs(r["chi2_total"] - sum(x["chi2_term"] for x in rows)) < 1e-5
        for r in rows
    )


# ----------------------------------------------------------------- ROC ---

def test_roc_curve_invariants_and_auc_identity(spark):
    rows = REGISTRY["eval_roc_auc"].fn(spark, SF).collect()
    # curve is monotone in both axes when walked from high threshold down
    tprs = [r["tpr"] for r in rows]
    fprs = [r["fpr"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(tprs, tprs[1:]))
    assert all(a <= b + 1e-12 for a, b in zip(fprs, fprs[1:]))
    assert abs(tprs[-1] - 1.0) < 1e-9 and abs(fprs[-1] - 1.0) < 1e-9
    auc = rows[0]["auc"]
    assert all(abs(r["auc"] - auc) < 1e-12 for r in rows)
    assert 0.0 <= auc <= 1.0
    # AUC == P(score_pos > score_neg) + 0.5 P(tie): recompute exactly
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    import collections

    def score(text, lang):
        toks = [t for t in text.lower().strip().split() if t]
        stop = sum(1 for t in toks if t in ("the", "a", "of", "and", "is"))
        return round(stop / len(toks), 9)

    pos = [score(d["text"], d["lang"]) for d in docs if d["lang"] == "en"]
    neg = [score(d["text"], d["lang"]) for d in docs if d["lang"] != "en"]
    nc = collections.Counter(neg)
    num = 0.0
    sneg = sorted(neg)
    import bisect

    for p in pos:
        num += bisect.bisect_left(sneg, p) + 0.5 * nc[p]
    assert abs(auc - num / (len(pos) * len(neg))) < 1e-6


# -------------------------------------------------- quantile normalize ---

def test_quantile_normalize_alignment(spark):
    df = REGISTRY["stats_quantile_normalize"].fn(spark, SF)
    rows = df.collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    allv = sorted(e["value"] for e in ev)
    lo, hi = allv[0], allv[-1]
    # mapped values live inside the pooled range
    assert all(lo - 1e-6 <= r["qnorm"] <= hi + 1e-6 for r in rows)
    # within each group, the map preserves order (monotone in rank)
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["value"], r["event_id"], r["qnorm"]))
    for t, vals in by_type.items():
        vals.sort()
        qs = [q for _, _, q in vals]
        assert all(a <= b + 1e-12 for a, b in zip(qs, qs[1:])), t
        # group extremes hit the pooled extremes (rank 1 -> pooled min,
        # rank n_g -> pooled max)
        assert abs(qs[0] - round(lo, 6)) < 1e-4
        assert abs(qs[-1] - round(hi, 6)) < 1e-4


# ----------------------------------------------------------------- PAV ---

def test_isotonic_monotone_and_mean_preserving(spark):
    rows = REGISTRY["iso_regression_pav"].fn(spark, SF).collect()
    assert len(rows) == 24
    isos = [r["iso"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(isos, isos[1:])), "must be non-decreasing"
    # the weighted mean of the fit equals the weighted mean of the data
    # (PAV replaces pools by their weighted mean — total mass invariant)
    wsum_fit = sum(r["iso"] * r["n"] for r in rows)
    wsum_raw = sum(r["y_mean"] * r["n"] for r in rows)
    assert abs(wsum_fit - wsum_raw) / abs(wsum_raw) < 1e-6
    # the fit is a majorant-minorant sandwich: within [min(y), max(y)]
    ys = [r["y_mean"] for r in rows]
    assert min(ys) - 1e-9 <= min(isos) and max(isos) <= max(ys) + 1e-9


# ------------------------------------------------------------------ CF ---

def test_cf_cosine_bounds_and_support(spark):
    rows = REGISTRY["cf_item_item_cosine"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 50
    assert all(0.0 < r["cosine"] <= 1.0 + 1e-12 for r in rows)
    assert all(r["co"] >= 3 for r in rows)
    assert all(r["pa"] < r["pb"] for r in rows)
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)
    # spot-check one cosine against a direct recount
    r0 = rows[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_partkey").distinct()
    baskets = {}
    for row in li.collect():
        baskets.setdefault(row["l_partkey"], set()).add(row["l_orderkey"])
    co = len(baskets[r0["pa"]] & baskets[r0["pb"]])
    assert co == r0["co"]
    expect = round(co / math.sqrt(len(baskets[r0["pa"]]) * len(baskets[r0["pb"]])), 9)
    assert abs(expect - r0["cosine"]) < 1e-9

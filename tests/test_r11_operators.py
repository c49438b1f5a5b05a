"""Round-11 operator pins: crafted-input replays for the new entries,
exercising edges the sf testdata may not hit (Apriori pruning actually
dropping infrequent parts; triple counts implying sub-pair frequency).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from markt_database_analyzer_spark.catalog import REGISTRY


def _run_both(spark, name, sf_dir, tables):
    got = REGISTRY[name].fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    want = con.execute(REGISTRY[name].oracle).df()
    con.close()
    return got, want


def _assert_equal(got, want):
    cols = sorted(got.columns)
    assert cols == sorted(want.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)


def _write_baskets(tmp_path, baskets):
    rows, i = [], 0
    for o, parts in baskets.items():
        for p in parts:
            rows.append({"l_orderkey": o, "l_partkey": p, "l_suppkey": 1,
                         "l_linenumber": i % 7 + 1, "l_quantity": 1.0,
                         "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0})
            i += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "lineitem.parquet", index=False)


def test_basket_triples_crafted_counts(spark, tmp_path):
    # (10,20,30) co-occurs in orders 1,2 (count 2 = min); (10,20,40) only
    # in order 3 (count 1, pruned); part 50 appears once so the Apriori
    # part-prune drops it before the cubic join; order 4's duplicate 10
    # dedups before counting.
    baskets = {
        1: [10, 20, 30],
        2: [30, 10, 20],
        3: [10, 20, 40],
        4: [10, 10, 50],
    }
    _write_baskets(tmp_path, baskets)
    got, want = _run_both(spark, "finance_basket_triples", str(tmp_path), ["lineitem"])
    _assert_equal(got, want)
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["part_a"], r["part_b"], r["part_c"], r["n_all"]) == (10, 20, 30, 2)
    # (10,20) is in all three first baskets -> n_ab = 3, conf = 2/3
    assert r["n_ab"] == 3
    assert r["support"] == 0.5  # 2 of 4 orders
    assert r["conf_ab_to_c"] == round(2 / 3, 9)


def test_basket_triples_empty_when_no_triple_repeats(spark, tmp_path):
    # every triple unique -> empty result, schema intact (the sf0.1 bench
    # shape: 0 qualifying triples is a VALID output, not an error)
    baskets = {1: [1, 2, 3], 2: [4, 5, 6], 3: [1, 2, 7]}
    _write_baskets(tmp_path, baskets)
    got, want = _run_both(spark, "finance_basket_triples", str(tmp_path), ["lineitem"])
    _assert_equal(got, want)
    assert len(got) == 0
    assert list(got.columns) == [
        "part_a", "part_b", "part_c", "n_all", "n_ab", "support", "conf_ab_to_c",
    ]


def test_basket_triples_min_count_implies_subpair_frequent(spark, tmp_path):
    # a triple at min count must always find its (a,b) pair row: pair
    # support >= triple support by containment. Crafted so the pair
    # (1,2) count (4) exceeds the triple (1,2,3) count (2).
    baskets = {
        1: [1, 2, 3],
        2: [1, 2, 3],
        3: [1, 2],
        4: [1, 2],
    }
    _write_baskets(tmp_path, baskets)
    got, want = _run_both(spark, "finance_basket_triples", str(tmp_path), ["lineitem"])
    _assert_equal(got, want)
    r = got.iloc[0]
    assert (r["n_all"], r["n_ab"]) == (2, 4)
    assert r["conf_ab_to_c"] == 0.5


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        {"doc_id": range(1, len(texts) + 1), "text": texts,
         "lang": ["en"] * len(texts), "source": ["s"] * len(texts),
         "quality": [1.0] * len(texts)}
    ).to_parquet(tmp_path / "documents.parquet", index=False)


def test_chrf_identical_pair_is_one(spark, tmp_path):
    # one pair of identical docs: every clipped count equals the total,
    # all precisions/recalls are 1, chrF = 1 exactly
    _write_docs(tmp_path, ["abcab cd", "ab cabcd"])  # same chars once whitespace drops
    got, want = _run_both(spark, "eval_chrf_adjacent_pairs", str(tmp_path), ["documents"])
    _assert_equal(got, want)
    r = got.iloc[0]
    assert r["n_pairs"] == 1
    assert r["f1"] == 1.0  # unigram multiset identical
    assert r["chrf"] == round((r["f1"] + r["f2"] + r["f3"]) / 3, 9)


def test_chrf_disjoint_pair_is_zero(spark, tmp_path):
    _write_docs(tmp_path, ["aaaa", "bbbb"])
    got, want = _run_both(spark, "eval_chrf_adjacent_pairs", str(tmp_path), ["documents"])
    _assert_equal(got, want)
    r = got.iloc[0]
    assert (r["f1"], r["f2"], r["f3"], r["chrf"]) == (0.0, 0.0, 0.0, 0.0)


def test_chrf_short_doc_empty_gram_orders(spark, tmp_path):
    # a 2-char candidate has no 3-grams: tc3 = 0 must pin f3 to 0.0 on
    # both engines, not divide by zero
    _write_docs(tmp_path, ["ab", "ab"])
    got, want = _run_both(spark, "eval_chrf_adjacent_pairs", str(tmp_path), ["documents"])
    _assert_equal(got, want)
    r = got.iloc[0]
    assert r["f1"] == 1.0 and r["f2"] == 1.0 and r["f3"] == 0.0


def _write_docs_full(tmp_path, rows):
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)


def test_krippendorff_perfect_agreement_is_one(spark, tmp_path):
    # every rater says 1 on every unit: D_obs = 0 and t0 = 0, so the
    # degenerate-domain guard pins alpha to exactly 1.0 on both engines
    text = "the a of and is " * 20  # stopword ratio 1.0, length >= 200
    _write_docs_full(tmp_path, [
        {"doc_id": i, "text": text, "lang": "en", "source": "s", "quality": 1.0}
        for i in (1, 2, 3, 4)
    ])
    got, want = _run_both(spark, "eval_krippendorff_alpha", str(tmp_path), ["documents"])
    _assert_equal(got, want)
    assert got.iloc[0]["alpha"] == 1.0


def test_krippendorff_hand_computed_with_missing(spark, tmp_path):
    # unit 1 (id=1): r1=1 (en), r2=0 (no stopwords), r3=0 (short) -> (n0,n1,m)=(2,1,3)
    # unit 2 (id=5): r3 MISSING (id%5==0), r1=1, r2=0          -> (1,1,2)
    # unit 3 (id=2): r1=0 (de), r2=0, r3=1 (long)               -> (2,1,3)
    long_plain = "wort " * 50          # 250 chars, no stopwords
    _write_docs_full(tmp_path, [
        {"doc_id": 1, "text": "kurz text", "lang": "en", "source": "s", "quality": 1.0},
        {"doc_id": 5, "text": "kurz text", "lang": "en", "source": "s", "quality": 1.0},
        {"doc_id": 2, "text": long_plain, "lang": "de", "source": "s", "quality": 1.0},
    ])
    got, want = _run_both(spark, "eval_krippendorff_alpha", str(tmp_path), ["documents"])
    _assert_equal(got, want)
    r = got.iloc[0]
    # n = 3 + 2 + 3 = 8, t1 = 1+1+1 = 3, t0 = 5
    assert (r["n_units"], r["n"], r["t0"], r["t1"]) == (3, 8, 5, 3)
    do = (2 * 2 * 1 / 2 + 2 * 1 * 1 / 1 + 2 * 2 * 1 / 2) / 8
    de = 2 * 5 * 3 / (8 * 7)
    assert r["d_obs"] == round(do, 9)
    assert r["d_exp"] == round(de, 9)
    assert r["alpha"] == round(1 - do / de, 9)


def test_token_f1_identical_and_disjoint_pairs(spark, tmp_path):
    # 3 docs -> 2 pairs: (1,2) identical (f1=1), (2,3) disjoint (f1=0);
    # macro mean = 0.5 exactly
    _write_docs(tmp_path, ["alpha beta beta", "beta alpha beta", "gamma delta"])
    got, want = _run_both(spark, "eval_token_f1_adjacent_pairs", str(tmp_path), ["documents"])
    _assert_equal(got, want)
    r = got.iloc[0]
    assert r["n_pairs"] == 2
    assert r["mean_f1"] == 0.5
    assert r["mean_precision"] == 0.5 and r["mean_recall"] == 0.5


def test_token_f1_multiset_clipping(spark, tmp_path):
    # candidate has 'a' x3, reference 'a' x1 -> clip m=1 (plus no other
    # overlap): p=1/3, r=1/2, f1=2*(1/3)*(1/2)/(5/6)=0.4
    _write_docs(tmp_path, ["a a a", "a b"])
    got, want = _run_both(spark, "eval_token_f1_adjacent_pairs", str(tmp_path), ["documents"])
    _assert_equal(got, want)
    r = got.iloc[0]
    # davg quantizes to the micro-unit grid before averaging, so the
    # mean of a single 1/3 lands at exactly 0.333333
    assert r["mean_precision"] == 0.333333
    assert r["mean_recall"] == 0.5
    assert r["mean_f1"] == 0.4

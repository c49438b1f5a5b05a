"""Round-10 operator pins: python replays on crafted inputs, exercising
edges the sf testdata may not hit (absent digits needing the zero-fill
spine; exact cents-string digit extraction around powers of ten).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

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


def _benford_replay(prices: list[float]) -> pd.DataFrame:
    counts = {d: 0 for d in range(1, 10)}
    for p in prices:
        if p > 0:
            counts[int(str(round(p * 100))[0])] += 1
    nt = sum(counts.values())
    rows = []
    for d in range(1, 10):
        share = round(counts[d] / nt, 9)
        exp = round(math.log10(1.0 + 1.0 / d), 9)
        rows.append((d, counts[d], share, exp, round(abs(share - exp), 9)))
    mad_u = sum(round(r[4] * 1e9) for r in rows)
    chi_u = sum(round(round(nt * (r[2] - r[3]) ** 2 / r[3], 9) * 1e6) for r in rows)
    mad = round((mad_u / 1e9) / 9.0, 9)
    chi2 = round(chi_u / 1e6, 6)
    return pd.DataFrame(
        [(d, n, s, e, a, mad, chi2) for d, n, s, e, a in rows],
        columns=["digit", "n", "share", "benford_expected", "abs_dev", "mad", "chi2"],
    )


def test_benford_crafted_with_absent_digits(spark, tmp_path):
    # prices chosen so digits 7/8/9 never appear (spine must zero-fill)
    # and several land exactly on powers of ten (1000.00 -> digit 1,
    # which float log10 extraction gets wrong when log10(1000) rounds
    # to 2.9999999999999996)
    prices = (
        [1000.00, 10.00, 1.00, 19.99, 100.00] * 4
        + [25.50, 2.00, 250.00] * 3
        + [33.33, 3.99] * 2
        + [4.44, 45.00, 5.55, 599.99, 6.25, 60.06]
    )
    rows = [
        {"o_orderkey": i, "o_custkey": 1 + i % 5, "o_totalprice": p,
         "o_orderdate": "1995-01-01", "o_orderpriority": "1-URGENT"}
        for i, p in enumerate(prices)
    ]
    df = pd.DataFrame(rows)
    df["o_orderdate"] = pd.to_datetime(df["o_orderdate"])
    df.to_parquet(tmp_path / "orders.parquet", index=False)

    got, want = _run_both(
        spark, "finance_benford_first_digit", str(tmp_path), ["orders"]
    )
    _assert_equal(got, want)

    replay = _benford_replay(prices)
    _assert_equal(got, replay)
    by_digit = got.set_index("digit")
    assert (by_digit.loc[[7, 8, 9], "n"] == 0).all()
    assert by_digit.loc[1, "n"] == 20  # the five digit-1 prices x 4

def test_benford_digit_extraction_never_uses_float_log(spark, tmp_path):
    # a single order at 1000.00: digit must be 1 with share 1.0
    df = pd.DataFrame(
        [{"o_orderkey": 1, "o_custkey": 1, "o_totalprice": 1000.00,
          "o_orderdate": pd.Timestamp("1995-01-01"),
          "o_orderpriority": "1-URGENT"}]
    )
    df.to_parquet(tmp_path / "orders.parquet", index=False)
    got = REGISTRY["finance_benford_first_digit"].fn(spark, str(tmp_path)).toPandas()
    row = got.set_index("digit").loc[1]
    assert row["n"] == 1 and row["share"] == 1.0


def test_basket_rules_crafted_pair_counts(spark, tmp_path):
    # orders: {1:(10,20),2:(10,20),3:(10,20),4:(10,30),5:(20,30),6:(10,)}
    rows = []
    baskets = {1: [10, 20], 2: [10, 20], 3: [10, 20, 20], 4: [10, 30],
               5: [20, 30], 6: [10]}
    i = 0
    for o, parts in baskets.items():
        for p in parts:
            rows.append({"l_orderkey": o, "l_partkey": p, "l_suppkey": 1,
                         "l_linenumber": i % 7 + 1, "l_quantity": 1.0,
                         "l_extendedprice": 1.0, "l_discount": 0.0, "l_tax": 0.0})
            i += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "lineitem.parquet", index=False)
    got, want = _run_both(
        spark, "finance_basket_association_rules", str(tmp_path), ["lineitem"]
    )
    _assert_equal(got, want)
    # only (10,20) co-occurs >= 3 times (order 3's duplicate 20 dedups)
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["part_a"], r["part_b"], r["n_both"]) == (10, 20, 3)
    assert r["n_a"] == 5 and r["n_b"] == 4  # basket counts, deduped
    assert r["support"] == 0.5  # 3 of 6 orders
    assert r["lift"] == round(3 * 6 / (5 * 4), 9)


def test_mutual_information_crafted_exact(spark, tmp_path):
    # 2x2 contingency: (en,web)=30 (en,api)=10 (de,web)=10 (de,api)=30
    rows = []
    for lang, source, n in [("en", "web", 30), ("en", "api", 10),
                            ("de", "web", 10), ("de", "api", 30)]:
        for i in range(n):
            rows.append({"doc_id": len(rows), "text": "x", "lang": lang,
                         "source": source, "n_chars": 1})
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    got, want = _run_both(
        spark, "stats_mutual_information", str(tmp_path), ["documents"]
    )
    _assert_equal(got, want)
    # replay on the nano grid
    N = 80
    cells = [(30, 40, 40), (10, 40, 40), (10, 40, 40), (30, 40, 40)]
    mi_u = sum(round(round((c / N) * math.log(c * N / (cx * cy)), 9) * 1e9)
               for c, cx, cy in cells)
    h_u = sum(round(round(-(40 / N) * math.log(40 / N), 9) * 1e9) for _ in range(2))
    r = got.iloc[0]
    assert r["n"] == 80 and r["n_cells"] == 4
    assert r["mi_nats"] == pytest.approx(mi_u / 1e9, abs=1e-12)
    assert r["h_lang"] == pytest.approx(h_u / 1e9, abs=1e-12)
    assert r["nmi"] == pytest.approx(
        round((mi_u / 1e9) / math.sqrt((h_u / 1e9) ** 2), 9), abs=1e-12
    )


def test_cliffs_delta_crafted_brute_force(spark, tmp_path):
    # group A (urgent): [10, 20, 20, 50]; group B: [15, 20, 40]
    va = [10.0, 20.0, 20.0, 50.0]
    vb = [15.0, 20.0, 40.0]
    rows = [
        {"o_orderkey": i, "o_custkey": 1, "o_totalprice": v,
         "o_orderdate": pd.Timestamp("1995-01-01"),
         "o_orderpriority": "1-URGENT"} for i, v in enumerate(va)
    ] + [
        {"o_orderkey": 100 + i, "o_custkey": 1, "o_totalprice": v,
         "o_orderdate": pd.Timestamp("1995-01-01"),
         "o_orderpriority": "3-MEDIUM"} for i, v in enumerate(vb)
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "orders.parquet", index=False)
    got, want = _run_both(spark, "stats_cliffs_delta", str(tmp_path), ["orders"])
    _assert_equal(got, want)
    gt = sum(1 for x in va for y in vb if x > y)
    lt = sum(1 for x in va for y in vb if x < y)
    r = got.iloc[0]
    assert r["n_a"] == 4 and r["n_b"] == 3
    assert r["cliffs_delta"] == round((gt - lt) / (4 * 3), 9)
    # U from midranks must equal #(x>y) + 0.5 #(x=y)
    eq = sum(1 for x in va for y in vb if x == y)
    assert r["u_a"] == gt + 0.5 * eq


def test_wasserstein_crafted_exact_emd(spark, tmp_path):
    import datetime as dt
    # view values all in bin 0 (0..9); purchase all in bin 2 (20..29):
    # CDFs differ by 1.0 on bins 0 and 1 -> W1 = 2 * 10 = 20
    rows = []
    for i in range(5):
        rows.append({"event_id": i, "ts": dt.datetime(2024, 1, 1), "user_id": 1,
                     "event_type": "view", "value": 3.0 + i, "props": "{}"})
    for i in range(7):
        rows.append({"event_id": 100 + i, "ts": dt.datetime(2024, 1, 1),
                     "user_id": 1, "event_type": "purchase",
                     "value": 23.0 + 0.5 * i, "props": "{}"})
    # a decoy type that must be filtered out
    rows.append({"event_id": 999, "ts": dt.datetime(2024, 1, 1), "user_id": 1,
                 "event_type": "click", "value": 500.0, "props": "{}"})
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    got, want = _run_both(spark, "stats_wasserstein_binned", str(tmp_path), ["events"])
    _assert_equal(got, want)
    r = got.iloc[0]
    assert (r["n_a"], r["n_b"], r["n_bins"]) == (5, 7, 3)
    assert r["w1"] == 20.0


def test_page_hinkley_level_shift_alarms(spark, tmp_path):
    import datetime as dt
    rows = []
    eid = 0
    # 20 quiet days of 5 events, then 10 days of 50 events
    for d in range(30):
        n = 5 if d < 20 else 50
        for _ in range(n):
            rows.append({"event_id": eid, "ts": dt.datetime(2024, 1, 1) +
                         dt.timedelta(days=d), "user_id": 1,
                         "event_type": "view", "value": 1.0, "props": "{}"})
            eid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    got, want = _run_both(spark, "events_page_hinkley", str(tmp_path), ["events"])
    # normalize the DATE column (Spark -> datetime.date objects, DuckDB ->
    # datetime64) the way check_oracle's object-str normalization does
    got = got.assign(d=got["d"].astype(str))
    want = want.assign(d=pd.to_datetime(want["d"]).dt.date.astype(str))
    _assert_equal(got, want)
    assert not got.iloc[:20]["alarm"].any()   # quiet regime: no alarm
    assert got.iloc[-1]["alarm"]              # after the shift: alarmed
    assert got["ph"].iloc[-1] > got["ph"].iloc[19]


def test_mmd_shift_crafted_mean_gap(spark, tmp_path):
    import numpy as np
    # group 0 at +1 in dim 0, group 1 at -1: mmd2 = 4 in dim 0 only
    rows = []
    for i in range(6):
        grp = i % 2
        vec = [0.0] * 8
        vec[0] = 1.0 if grp == 0 else -1.0
        rows.append({"vec_id": i, "embedding": np.array(vec, dtype=np.float32),
                     "label": grp})
    pd.DataFrame(rows).to_parquet(tmp_path / "embeddings.parquet", index=False)
    got, want = _run_both(
        spark, "eval_embedding_mmd_shift", str(tmp_path), ["embeddings"]
    )
    _assert_equal(got, want)
    r = got.iloc[0]
    assert (r["n_a"], r["n_b"], r["dim"]) == (3, 3, 8)
    assert r["mmd2_linear"] == 4.0 and r["mmd_linear"] == 2.0


def test_cochran_q_crafted_exact(spark, tmp_path):
    import datetime as dt
    # 4 users x 5 types; user0 does all, user1 does click+view,
    # user2 does view only, user3 does purchase+signup
    did = {
        0: ["click", "error", "purchase", "signup", "view"],
        1: ["click", "view"],
        2: ["view"],
        3: ["purchase", "signup"],
    }
    rows = []
    eid = 0
    for u, types in did.items():
        for t in types:
            rows.append({"event_id": eid, "ts": dt.datetime(2024, 1, 1),
                         "user_id": u, "event_type": t, "value": 1.0,
                         "props": "{}"})
            eid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    got, want = _run_both(spark, "stats_cochran_q", str(tmp_path), ["events"])
    _assert_equal(got, want)
    # closed-form replay
    k = 5
    cols = {"click": 2, "error": 1, "purchase": 2, "signup": 2, "view": 3}
    ri = [5, 2, 1, 2]
    grand = sum(ri)
    q = (k - 1) * (k * sum(c * c for c in cols.values()) - grand * grand) / (
        k * grand - sum(r * r for r in ri)
    )
    r = got.iloc[0]
    assert r["n_users"] == 4 and r["grand"] == 10 and r["k"] == 5
    assert r["cochran_q"] == round(q, 9)


def test_cochran_q_degenerate_denominator_null(spark, tmp_path):
    import datetime as dt
    # every user performs ALL types: R_i = k for all -> kG = sum R^2
    rows = []
    eid = 0
    for u in range(3):
        for t in ["click", "error", "purchase", "signup", "view"]:
            rows.append({"event_id": eid, "ts": dt.datetime(2024, 1, 1),
                         "user_id": u, "event_type": t, "value": 1.0,
                         "props": "{}"})
            eid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    got, want = _run_both(spark, "stats_cochran_q", str(tmp_path), ["events"])
    _assert_equal(got, want)
    assert got["cochran_q"].isna().all()


def test_atkinson_equal_balances_zero_inequality(spark, tmp_path):
    rows = [
        {"c_custkey": i, "c_nationkey": 0, "c_acctbal": 500.0,
         "c_mktsegment": "A"} for i in range(10)
    ]
    # non-positive balances are excluded, not ln(-x) errors
    rows.append({"c_custkey": 99, "c_nationkey": 0, "c_acctbal": -10.0,
                 "c_mktsegment": "A"})
    pd.DataFrame(rows).to_parquet(tmp_path / "customer.parquet", index=False)
    got, want = _run_both(spark, "stats_atkinson_index", str(tmp_path), ["customer"])
    _assert_equal(got, want)
    r = got.iloc[0]
    assert r["n"] == 10
    assert abs(r["atkinson_eps_half"]) < 1e-6  # equal incomes: A = 0
    assert abs(r["atkinson_eps_one"]) < 1e-6


def test_unigram_kl_crafted_exact(spark, tmp_path):
    # en corpus: "a a b"; de corpus: "a c c c" -> union vocab {a, b, c}
    rows = [
        {"doc_id": 1, "text": "a a b", "lang": "en", "source": "s", "n_chars": 5},
        {"doc_id": 2, "text": "a c c c", "lang": "de", "source": "s", "n_chars": 7},
        # other langs must be excluded entirely
        {"doc_id": 3, "text": "zz zz", "lang": "fr", "source": "s", "n_chars": 5},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    got, want = _run_both(
        spark, "text_unigram_kl_divergence", str(tmp_path), ["documents"]
    )
    _assert_equal(got, want)
    r = got.iloc[0]
    assert (r["n_tokens_en"], r["n_tokens_de"], r["vocab_union"]) == (3, 4, 3)
    # nano-grid replay with alpha = 0.5 over V = 3
    a, v = 0.5, 3
    c1, c2 = {"a": 2, "b": 1, "c": 0}, {"a": 1, "b": 0, "c": 3}
    kl_u = js_u = 0
    for w in c1:
        p = (c1[w] + a) / (3 + a * v)
        q = (c2[w] + a) / (4 + a * v)
        kl_u += round(round(p * math.log(p / q), 9) * 1e9)
        m2 = p + q
        js_u += round(
            round(0.5 * p * math.log(2 * p / m2) + 0.5 * q * math.log(2 * q / m2), 9)
            * 1e9
        )
    assert r["kl_en_de"] == round(kl_u / 1e9, 9)
    assert r["js_divergence"] == round(js_u / 1e9, 9)
    assert 0.0 < r["js_divergence"] < math.log(2)


def test_bleu_identical_pair_is_one_and_disjoint_is_zero(spark, tmp_path):
    mk = lambda i, text: {"doc_id": i, "text": text, "lang": "en",
                          "source": "s", "n_chars": len(text)}
    # pair (1, 2): identical texts -> p1 = p2 = 1, BP = 1, BLEU = 1
    rows = [mk(1, "the cat sat"), mk(2, "the cat sat")]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    got, want = _run_both(spark, "eval_bleu_adjacent_pairs", str(tmp_path), ["documents"])
    _assert_equal(got, want)
    assert got.iloc[0]["bleu2"] == 1.0 and got.iloc[0]["n_pairs"] == 1

    # disjoint texts -> zero overlap -> BLEU exactly 0.0
    rows = [mk(1, "aa bb cc"), mk(2, "dd ee ff")]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    got2, want2 = _run_both(spark, "eval_bleu_adjacent_pairs", str(tmp_path), ["documents"])
    _assert_equal(got2, want2)
    assert got2.iloc[0]["bleu2"] == 0.0


def test_bleu_clipping_and_brevity_penalty(spark, tmp_path):
    mk = lambda i, text: {"doc_id": i, "text": text, "lang": "en",
                          "source": "s", "n_chars": len(text)}
    # candidate "the the the" vs reference "the cat": clipped unigram
    # count = min(3, 1) = 1 of 3 -> p1 = 1/3; no bigram overlap -> bleu 0;
    # cand_len 3 > ref_len 2 -> BP would be 1
    rows = [mk(1, "the the the"), mk(2, "the cat")]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    got, want = _run_both(spark, "eval_bleu_adjacent_pairs", str(tmp_path), ["documents"])
    _assert_equal(got, want)
    r = got.iloc[0]
    assert r["p1"] == round(1 / 3, 9) and r["p2"] == 0.0 and r["bleu2"] == 0.0
    # single-token docs: bigram lists must be EMPTY, not a reversed
    # sequence artifact (the Spark sequence(1, 0) guard)
    rows = [mk(1, "hello"), mk(2, "hello")]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    got2, want2 = _run_both(spark, "eval_bleu_adjacent_pairs", str(tmp_path), ["documents"])
    _assert_equal(got2, want2)
    assert got2.iloc[0]["p1"] == 1.0 and got2.iloc[0]["bleu2"] == 0.0

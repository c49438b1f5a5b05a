"""Pin tests for the nine round-9 catalog entries: python replays of
the exact semantics on sf0.001 plus invariant checks. The driver-level
differential (tools/check_oracle.py and the per-round CORRECTNESS run)
remains the value gate; these pins catch semantic drift locally."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from markt_database_analyzer_spark.catalog import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def _phi(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-1.5976 * z - 0.07056 * z**3))


def test_mood_median_matches_python_replay(spark):
    rows = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    vals = sorted(round(r["o_totalprice"] * 100) for r in rows)
    med = vals[(len(vals) + 1) // 2 - 1]  # exact lower median
    cells = defaultdict(lambda: [0, 0])
    for r in rows:
        v = round(r["o_totalprice"] * 100)
        cells[r["o_orderpriority"]][0 if v > med else 1] += 1
    ta = sum(a for a, _ in cells.values())
    tb = sum(b for _, b in cells.values())
    n = ta + tb
    chi2 = 0.0
    for a, b in cells.values():
        ng = a + b
        ea, eb = ng * ta / n, ng * tb / n
        chi2 += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    out = REGISTRY["stats_mood_median_test"].fn(spark, SF_DIR).collect()[0]
    assert out["n"] == n and out["dof"] == len(cells) - 1
    assert out["grand_median"] == pytest.approx(med / 100.0)
    assert out["chi2"] == pytest.approx(chi2, abs=1e-4)


def test_sprt_matches_python_replay(spark):
    from markt_database_analyzer_spark.catalog_stats import (
        _SPRT_A9,
        _SPRT_B9,
        _SPRT_L0_9,
        _SPRT_L1_9,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "event_type"
    ).collect()
    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        d = r["ts"].date()
        daily[d][0] += 1
        daily[d][1] += r["event_type"] == "purchase"
    s9, first_up, first_dn = 0, None, None
    for d in sorted(daily):
        n_t, x_t = daily[d]
        s9 += x_t * _SPRT_L1_9 + (n_t - x_t) * _SPRT_L0_9
        if s9 >= _SPRT_A9 and first_up is None:
            first_up = d
        if s9 <= _SPRT_B9 and first_dn is None:
            first_dn = d
    if first_up is not None and (first_dn is None or first_up <= first_dn):
        decision = "accept_h1"
    elif first_dn is not None:
        decision = "accept_h0"
    else:
        decision = "continue"
    out = REGISTRY["stats_sprt_sequential"].fn(spark, SF_DIR).collect()[0]
    assert out["n_days"] == len(daily)
    assert out["decision"] == decision
    assert out["llr_final"] == pytest.approx(s9 / 1e9, abs=1e-8)


def test_granger_matches_python_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "event_type"
    ).collect()
    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        d = r["ts"].date()
        daily[d][0] += r["event_type"] == "view"
        daily[d][1] += r["event_type"] == "purchase"
    days = sorted(daily)
    y = [daily[d][1] for d in days][1:]
    x = [daily[d][0] for d in days][:-1]
    z = [daily[d][1] for d in days][:-1]
    n = len(y)

    def corr(a, b):
        sa, sb = sum(a), sum(b)
        return (n * sum(u * v for u, v in zip(a, b)) - sa * sb) / math.sqrt(
            (n * sum(u * u for u in a) - sa * sa) * (n * sum(v * v for v in b) - sb * sb)
        )

    ryx, ryz, rxz = corr(y, x), corr(y, z), corr(x, z)
    rp = (ryx - ryz * rxz) / math.sqrt((1 - ryz**2) * (1 - rxz**2))
    f = rp * rp * (n - 3) / (1 - rp * rp)
    out = REGISTRY["ts_granger_causality"].fn(spark, SF_DIR).collect()[0]
    assert out["n"] == n
    assert out["r_partial"] == pytest.approx(rp, abs=1e-8)
    assert out["f_stat"] == pytest.approx(f, abs=1e-6)
    assert out["p_approx"] == pytest.approx(2 * (1 - _phi(abs(math.copysign(math.sqrt(f), rp)))), abs=1e-5)


def test_t_closeness_matches_python_replay(spark):
    rows = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_nationkey", "c_acctbal", "c_mktsegment"
    ).collect()
    cells = defaultdict(Counter)
    glob: Counter = Counter()
    for r in rows:
        band = round(r["c_acctbal"] * 100) // 100_000
        cells[(r["c_nationkey"], band)][r["c_mktsegment"]] += 1
        glob[r["c_mktsegment"]] += 1
    n = sum(glob.values())
    max_t, above_c, above_rows = 0.0, 0, 0
    for cnt in cells.values():
        k = sum(cnt.values())
        num = sum(abs(cnt.get(s, 0) * n - glob[s] * k) for s in glob)
        t = num / (2 * k * n)
        max_t = max(max_t, t)
        if num * 5 > 2 * k * n:  # exact t > 0.2 gate
            above_c += 1
            above_rows += k
    out = REGISTRY["privacy_t_closeness"].fn(spark, SF_DIR).collect()[0]
    assert out["n_classes"] == len(cells) and out["n_rows"] == n
    assert out["max_t"] == pytest.approx(max_t, abs=1e-9)
    assert out["classes_above_t"] == above_c
    assert out["rows_above_t"] == above_rows
    assert 0.0 <= out["max_t"] <= 1.0


def test_ece_bounds_and_manual_two_bin_case(spark, tmp_path):
    import pandas as pd

    # crafted corpus: bin 0 (score 0) all negatives, high bin mixed
    rows = []
    for i in range(8):
        rows.append({"doc_id": f"a{i}", "lang": "de", "text": "wort " * 5})
    for i in range(4):
        # 3 of 5 tokens are stopwords -> s9 = 0.6e9 -> bin 6
        rows.append({"doc_id": f"b{i}", "lang": "en" if i < 3 else "de",
                     "text": "the a of wort wort"})
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet", index=False)
    out = REGISTRY["eval_expected_calibration_error"].fn(spark, str(tmp_path)).collect()[0]
    # bin0: |0 - 0| = 0; bin6: |3e9 - 4*0.6e9| = 0.6e9 -> ece = 0.6e9/(12e9)
    assert out["n_docs"] == 12 and out["n_bins_nonempty"] == 2
    assert out["ece"] == pytest.approx(0.05)
    assert out["mce"] == pytest.approx(0.15)  # 0.6e9/(4*1e9)


def test_kendalls_w_bounds_and_identical_rankers_hit_one(spark, tmp_path):
    import pandas as pd

    # all three rankers produce the same order -> W = 1 exactly
    rows = [
        {
            "p_partkey": i,
            "p_retailprice": 1000.0 - i,  # rank i+1 descending
            "p_size": 500 - i,
            "p_name": "n" + "x" * (200 - i),  # length strictly decreasing
        }
        for i in range(60)
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "part.parquet", index=False)
    out = REGISTRY["eval_kendalls_w"].fn(spark, str(tmp_path)).collect()[0]
    assert out["n"] == 60 and out["m_rankers"] == 3
    assert out["kendalls_w"] == pytest.approx(1.0, abs=1e-9)
    # real data: bounded in [0, 1]
    real = REGISTRY["eval_kendalls_w"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= real["kendalls_w"] <= 1.0


def test_msttr_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "lang", "text"
    ).collect()
    seg = 50
    per_lang = defaultdict(lambda: [0, 0])  # [segments, sum_types]
    for r in docs:
        toks = [t for t in r["text"].strip().lower().split() if t]
        for c in range(len(toks) // seg):
            chunk = toks[c * seg : (c + 1) * seg]
            per_lang[r["lang"]][0] += 1
            per_lang[r["lang"]][1] += len(set(chunk))
    out = {
        r["lang"]: r
        for r in REGISTRY["text_msttr_lexical_diversity"].fn(spark, SF_DIR).collect()
    }
    assert set(out) == {k for k, v in per_lang.items() if v[0] > 0}
    for lang, (n_seg, s_types) in per_lang.items():
        if n_seg == 0:
            continue
        assert out[lang]["n_segments"] == n_seg
        assert out[lang]["sum_types"] == s_types
        assert out[lang]["msttr"] == pytest.approx(s_types / (seg * n_seg), abs=1e-9)
        assert 0.0 < out[lang]["msttr"] <= 1.0


def test_knn_classify_matches_python_vote_replay(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "label", "embedding"
    ).collect()
    labels = {r["label"] for r in emb}
    out = REGISTRY["ml_knn_classify_embeddings"].fn(spark, SF_DIR).collect()
    assert len(out) == len(emb)  # every vector classified
    preds = {r["vec_id"]: r for r in out}
    truth = {r["vec_id"]: r["label"] for r in emb}
    # exact python replay of anchors -> cosine(round 9) -> top-5 -> vote
    by_label = defaultdict(list)
    for r in sorted(emb, key=lambda r: r["vec_id"]):
        by_label[r["label"]].append(r)
    anchors = [a for lbl in by_label for a in by_label[lbl][:3]]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return round(dot / (na * nb), 9)

    for r in sorted(emb, key=lambda rr: rr["vec_id"])[:40]:
        scored = sorted(
            (
                (-cos([float(v) for v in r["embedding"]], [float(v) for v in a["embedding"]]), a["vec_id"], a["label"])
                for a in anchors
                if a["vec_id"] != r["vec_id"]
            )
        )[:5]
        votes = Counter(lbl for _, _, lbl in scored)
        want = min(votes, key=lambda l: (-votes[l], l))
        got = preds[r["vec_id"]]
        assert got["predicted"] == want, r["vec_id"]
        assert got["true_label"] == truth[r["vec_id"]]
        assert got["correct"] == (want == truth[r["vec_id"]])
        assert got["predicted"] in labels


def test_evt_pot_gpd_fit_matches_python_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select("ts", "value").collect()
    hourly = defaultdict(int)
    for r in ev:
        hourly[r["ts"].replace(minute=0, second=0, microsecond=0)] += round(
            r["value"] * 100
        )
    xs = [hourly[h] for h in sorted(hourly)]
    losses = sorted(
        xs[i - 1] - xs[i] for i in range(1, len(xs)) if xs[i - 1] - xs[i] > 0
    )
    # exact equi-depth boundary 9 of 10: smallest value whose cumulative
    # count reaches ceil(9 * n / 10)
    target = -(-9 * len(losses) // 10)
    u = losses[target - 1]
    y = [v - u for v in losses if v > u]
    nu = len(y)
    m = sum(y) / nu
    var = (nu * sum(v * v for v in y) - sum(y) ** 2) / (nu * (nu - 1))
    xi = 0.5 * (1 - m * m / var)
    beta = 0.5 * m * (1 + m * m / var)
    out = REGISTRY["finance_evt_pot_tail"].fn(spark, SF_DIR).collect()[0]
    assert out["n_loss"] == len(losses) and out["n_exceed"] == nu
    assert out["threshold_u"] == pytest.approx(u / 100.0)
    assert out["xi"] == pytest.approx(xi, abs=1e-6)
    assert out["beta"] == pytest.approx(beta / 100.0, abs=1e-4)
    # the extrapolated 99% VaR must sit beyond the threshold
    assert out["var_99"] > out["threshold_u"]


def test_fisher_exact_matches_quantized_replay_and_exact_fractions(spark):
    sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").select(
        "s_acctbal", "s_nationkey"
    ).collect()
    n = len(sup)
    r1 = sum(r["s_acctbal"] > 5000.0 for r in sup)
    c1 = sum(r["s_nationkey"] < 12 for r in sup)
    a_obs = sum(r["s_acctbal"] > 5000.0 and r["s_nationkey"] < 12 for r in sup)
    # replay the nano-quantized algorithm exactly
    lf = [0] * (n + 1)
    for i in range(1, n + 1):
        lf[i] = lf[i - 1] + round(math.log(i) * 1e9)
    c9 = lf[r1] + lf[n - r1] + lf[c1] + lf[n - c1] - lf[n]
    ks = range(max(0, r1 + c1 - n), min(r1, c1) + 1)
    logp = {k: c9 - lf[k] - lf[r1 - k] - lf[c1 - k] - lf[n - r1 - c1 + k] for k in ks}
    p = sum(round(math.exp(lp / 1e9) * 1e12) for k, lp in logp.items() if lp <= logp[a_obs]) / 1e12
    out = REGISTRY["stats_fisher_exact_2x2"].fn(spark, SF_DIR).collect()[0]
    assert (out["n"], out["r1"], out["c1"], out["a_obs"]) == (n, r1, c1, a_obs)
    assert out["p_two_sided"] == pytest.approx(round(p, 9), abs=1e-9)
    # independent exact-arithmetic sanity: hypergeometric via Fractions
    from fractions import Fraction
    from math import comb

    denom = comb(n, c1)
    pk = {k: Fraction(comb(r1, k) * comb(n - r1, c1 - k), denom) for k in ks}
    p_exact = float(sum(v for k, v in pk.items() if v <= pk[a_obs]))
    assert out["p_two_sided"] == pytest.approx(p_exact, abs=1e-5)
    assert 0.0 <= out["p_two_sided"] <= 1.0 + 1e-9


def test_qwk_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "n_chars", "text"
    ).collect()
    cells = Counter()
    for r in docs:
        toks = [t for t in r["text"].strip().lower().split() if t]
        if not toks:
            continue
        s9 = round(sum(t in ("the", "a", "of", "and", "is") for t in toks) / len(toks) * 1e9)
        ra = (s9 >= 1e8) + (s9 >= 2e8) + (s9 >= 3e8)
        rb = (r["n_chars"] >= 200) + (r["n_chars"] >= 400) + (r["n_chars"] >= 800)
        cells[(ra, rb)] += 1
    n = sum(cells.values())
    rt = Counter()
    ct = Counter()
    for (i, j), o in cells.items():
        rt[i] += o
        ct[j] += o
    wo = sum((i - j) ** 2 * o for (i, j), o in cells.items())
    wrc = sum((i - j) ** 2 * rt[i] * ct[j] for i in rt for j in ct)
    out = REGISTRY["eval_cohens_kappa_weighted"].fn(spark, SF_DIR).collect()[0]
    assert out["n"] == n
    assert out["qwk"] == pytest.approx(1 - n * wo / wrc, abs=1e-8)
    assert out["qwk"] <= 1.0


def test_attribution_linear_matches_python_replay(spark):
    import datetime

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type"
    ).collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    credit9 = Counter()
    touches = Counter()
    purchased = defaultdict(set)
    day = datetime.timedelta(hours=24)
    for rows in by_user.values():
        purchases = [r for r in rows if r["event_type"] == "purchase"]
        tts = [r for r in rows if r["event_type"] in ("view", "click")]
        for p in purchases:
            win = [t for t in tts if p["ts"] - day <= t["ts"] < p["ts"]]
            if not win:
                continue
            per = round(1e9 / len(win))
            for t in win:
                credit9[t["event_type"]] += per
                touches[t["event_type"]] += 1
                purchased[t["event_type"]].add(p["event_id"])
    out = {r["event_type"]: r for r in REGISTRY["events_attribution_linear"].fn(spark, SF_DIR).collect()}
    assert set(out) == set(touches)
    for et in touches:
        assert out[et]["n_touches"] == touches[et]
        assert out[et]["n_purchases_touched"] == len(purchased[et])
        assert out[et]["credit"] == pytest.approx(credit9[et] / 1e9, abs=1e-9)


def test_hits_matches_python_replay(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    ).collect()
    cust_of = {r["o_orderkey"]: r["o_custkey"] for r in orders}
    edges = {(cust_of[r["l_orderkey"]], r["l_suppkey"]) for r in li if r["l_orderkey"] in cust_of}

    def nsum(vals):
        return sum(round(v * 1e9) for v in vals) / 1e9

    h = {u: 1.0 for u, _ in edges}
    a = {}
    for _ in range(3):
        ar = defaultdict(list)
        for u, v in edges:
            ar[v].append(h[u])
        ar = {v: nsum(vs) for v, vs in ar.items()}
        am = max(ar.values())
        a = {v: round(x / am, 9) for v, x in ar.items()}
        hr = defaultdict(list)
        for u, v in edges:
            hr[u].append(a[v])
        hr = {u: nsum(vs) for u, vs in hr.items()}
        hm = max(hr.values())
        h = {u: round(x / hm, 9) for u, x in hr.items()}
    top_h = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_a = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    out = REGISTRY["graph_hits_scores"].fn(spark, SF_DIR).collect()
    got_h = [(r["key"], r["score"]) for r in out if r["kind"] == "hub"]
    got_a = [(r["key"], r["score"]) for r in out if r["kind"] == "authority"]
    assert got_h == [(k, pytest.approx(s, abs=1e-9)) for k, s in top_h]
    assert got_a == [(k, pytest.approx(s, abs=1e-9)) for k, s in top_a]


def test_cmh_matches_python_replay(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_nationkey", "c_acctbal", "c_mktsegment"
    ).collect()
    nat = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    strata = defaultdict(lambda: [0, 0, 0, 0])  # a, r1, c1, n
    for r in cust:
        st = nat[r["c_nationkey"]]
        ex = r["c_acctbal"] > 5000.0
        ou = r["c_mktsegment"] == "AUTOMOBILE"
        s = strata[st]
        s[0] += ex and ou
        s[1] += ex
        s[2] += ou
        s[3] += 1

    def q6(x):
        return round(x * 1e6) / 1e6

    num = sum(q6(a - r1 * c1 / n) for a, r1, c1, n in strata.values())
    var = sum(
        q6(r1 * (n - r1) * c1 * (n - c1) / (n * n * (n - 1))) for a, r1, c1, n in strata.values()
    )
    adn = sum(q6(a * (n - r1 - c1 + a) / n) for a, r1, c1, n in strata.values())
    bcn = sum(q6((r1 - a) * (c1 - a) / n) for a, r1, c1, n in strata.values())
    out = REGISTRY["stats_cmh_test"].fn(spark, SF_DIR).collect()[0]
    assert out["n_strata"] == len(strata)
    assert out["sum_a"] == sum(s[0] for s in strata.values())
    assert out["cmh_chi2"] == pytest.approx(num**2 / var, abs=1e-6)
    assert out["or_mh"] == pytest.approx(adn / bcn, abs=1e-5)


def test_ipf_raking_matches_python_replay_and_margins(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_nationkey", "c_mktsegment"
    ).collect()
    nat = {
        r["n_nationkey"]: r["n_regionkey"]
        for r in spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()
    }
    reg = {
        r["r_regionkey"]: r["r_name"]
        for r in spark.read.parquet(f"{SF_DIR}/region.parquet").collect()
    }
    w = Counter()
    for r in cust:
        w[(reg[nat[r["c_nationkey"]]], r["c_mktsegment"])] += 1
    w = {k: float(v) for k, v in w.items()}
    ri = Counter()
    for (i, _), v in w.items():
        ri[i] += v
    n = sum(w.values())
    cj = n / len({j for _, j in w})

    def nsum(vals):
        return sum(round(v * 1e9) for v in vals) / 1e9

    for _ in range(3):
        rs = defaultdict(list)
        for (i, j), v in w.items():
            rs[i].append(v)
        rsum = {i: nsum(vs) for i, vs in rs.items()}
        w = {(i, j): round(v * ri[i] / rsum[i], 9) for (i, j), v in w.items()}
        cs = defaultdict(list)
        for (i, j), v in w.items():
            cs[j].append(v)
        csum = {j: nsum(vs) for j, vs in cs.items()}
        w = {(i, j): round(v * cj / csum[j], 9) for (i, j), v in w.items()}
    out = REGISTRY["sample_ipf_raking"].fn(spark, SF_DIR).collect()
    got = {(r["region"], r["segment"]): r["raked_w"] for r in out}
    assert set(got) == set(w)
    for k in w:
        assert got[k] == pytest.approx(round(w[k], 6), abs=1e-9), k
    # after 3 rounds the segment margins sit near the uniform target
    seg = defaultdict(float)
    for (i, j), v in got.items():
        seg[j] += v
    for j, s in seg.items():
        assert s == pytest.approx(cj, rel=0.02), j


def test_logrank_matches_python_replay(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", "ts", "event_type"
    ).collect()
    users = defaultdict(lambda: [None, None, 0])
    for r in ev:
        d = r["ts"].date()
        u = users[r["user_id"]]
        u[0] = d if u[0] is None or d < u[0] else u[0]
        u[1] = d if u[1] is None or d > u[1] else u[1]
        u[2] |= r["event_type"] == "purchase"
    mx = max(u[1] for u in users.values())
    pt = defaultdict(lambda: [0, 0, 0, 0])  # tot, tot1, d, d1
    for first, last, g1 in users.values():
        t = (last - first).days
        evt = last < mx
        s = pt[t]
        s[0] += 1
        s[1] += g1
        s[2] += evt
        s[3] += evt and g1

    def q6(x):
        return round(x * 1e6) / 1e6

    n = n1 = 0
    omd = v = e1 = o1 = 0.0
    for t in sorted(pt, reverse=True):
        tot, tot1, dd, d1 = pt[t]
        n += tot
        n1 += tot1
        if dd > 0:
            o1 += d1
            e1 += q6(dd * n1 / n)
            omd += q6(d1 - dd * n1 / n)
            if n >= 2:
                v += q6(dd * (n1 / n) * (1 - n1 / n) * (n - dd) / (n - 1))
    out = REGISTRY["events_logrank_test"].fn(spark, SF_DIR).collect()[0]
    assert out["n_users_1"] == sum(u[2] for u in users.values())
    assert out["n_users_0"] == len(users) - out["n_users_1"]
    assert out["observed_1"] == o1
    assert out["expected_1"] == pytest.approx(e1, abs=1e-5)
    if v > 0:
        assert out["logrank_chi2"] == pytest.approx(omd * omd / v, abs=1e-6)
    else:
        # degenerate sf: one group empty -> zero pooled variance -> NULL
        assert out["logrank_chi2"] is None


def test_auc_hanley_ci_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "lang", "text"
    ).collect()
    pts = []
    for r in docs:
        toks = [t for t in r["text"].strip().lower().split() if t]
        if not toks:
            continue
        s = round(sum(t in ("the", "a", "of", "and", "is") for t in toks) / len(toks), 9)
        pts.append((s, r["lang"] == "en"))
    by_score = defaultdict(lambda: [0, 0])
    for s, lab in pts:
        by_score[s][0] += lab
        by_score[s][1] += not lab
    tp = fp = 0
    s2 = 0
    for s in sorted(by_score, reverse=True):
        dtp, dfp = by_score[s]
        s2 += dfp * (2 * tp + dtp)
        tp += dtp
        fp += dfp
    pos, neg = tp, fp
    auc = s2 / (2 * pos * neg)
    q1 = auc / (2 - auc)
    q2 = 2 * auc * auc / (1 + auc)
    se = math.sqrt(
        (auc * (1 - auc) + (pos - 1) * (q1 - auc * auc) + (neg - 1) * (q2 - auc * auc))
        / (pos * neg)
    )
    out = REGISTRY["eval_auc_hanley_ci"].fn(spark, SF_DIR).collect()[0]
    assert (out["pos"], out["neg"]) == (pos, neg)
    assert out["auc"] == pytest.approx(auc, abs=1e-9)
    assert out["se"] == pytest.approx(se, abs=1e-9)
    assert out["ci95_lo"] == pytest.approx(max(0.0, auc - 1.96 * se), abs=1e-6)
    assert out["ci95_hi"] == pytest.approx(min(1.0, auc + 1.96 * se), abs=1e-6)
    assert 0.0 <= out["ci95_lo"] <= out["auc"] <= out["ci95_hi"] <= 1.0

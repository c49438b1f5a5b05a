"""Unit pins for the round-3 nineteenth tranche: MIME magic-number
dispatch, information-gain algebra, grid-density cluster structure vs a
pure-Python union-find, VWAP/OHLC bar semantics, and PSI drift identities."""

from __future__ import annotations

import collections
import math

from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def test_mime_sniff_modulo_dispatch(spark):
    rows = REGISTRY["multimodal_mime_sniff"].fn(spark, SF).collect()
    expect = {
        0: "image/png",
        1: "image/jpeg",
        2: "audio/wav",
        3: "image/gif",
        4: "application/octet-stream",
    }
    docs = {
        d["doc_id"]: len(d["text"].encode())
        for d in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    hdr_len = {0: 8, 1: 4, 2: 12, 3: 6, 4: 0}
    for r in rows:
        sel = r["doc_id"] % 5
        assert r["mime"] == expect[sel], (r["doc_id"], r["mime"])
        assert r["n_bytes"] == docs[r["doc_id"]] + hdr_len[sel]


def test_info_gain_bounds_and_pure_python(spark):
    rows = REGISTRY["text_info_gain"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    igs = [r["info_gain"] for r in rows]
    assert igs == sorted(igs, reverse=True)
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    n = len(docs)
    lang_tot = collections.Counter(d["lang"] for d in docs)
    # Spark's round() is HALF_UP; Python's is HALF_EVEN — replicate
    from decimal import ROUND_HALF_UP, Decimal

    def rup(x, dp):
        return float(Decimal(repr(x)).quantize(Decimal(f"1e-{dp}"), ROUND_HALF_UP))

    h0 = (
        -sum(
            int(rup(rup(p * math.log(p), 9) * 1e6, 0))
            for p in ((c / n) for c in lang_tot.values())
        )
        / 1e6
    )
    # IG can never exceed H(lang); it is nonnegative up to quantization
    assert all(-1e-5 <= ig <= h0 + 1e-9 for ig in igs)
    # recompute the top token's IG exactly (same rounding grid)
    top = rows[0]
    pres = collections.Counter()
    for d in docs:
        toks = set(t for t in d["text"].lower().strip().split() if t)
        if top["tok"] in toks:
            pres[d["lang"]] += 1
    n1 = sum(pres.values())
    assert n1 == top["df"]

    def h_of(counts, tot):
        micro = 0
        for c in counts:
            p = c / tot
            if p > 0:
                micro += int(rup(rup(p * math.log(p), 9) * 1e6, 0))
        return -(micro / 1e6)

    hp = h_of([pres[l] for l in lang_tot], n1)
    ha = h_of([lang_tot[l] - pres[l] for l in lang_tot], n - n1)
    ig = rup(h0 - (n1 / n) * hp - (1 - n1 / n) * ha, 9)
    assert abs(ig - top["info_gain"]) < 1e-8


def test_grid_density_matches_union_find(spark):
    rows = REGISTRY["cluster_grid_density"].fn(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    eps_m, minpts = 40_000, 3
    cells = collections.Counter(
        (
            math.floor(round(float(e["embedding"][0]) * 1e6) / eps_m),
            math.floor(round(float(e["embedding"][1]) * 1e6) / eps_m),
        )
        for e in emb
    )
    dense = {c for c, cnt in cells.items() if cnt >= minpts}
    parent = {c: c for c in dense}

    def find(c):
        while parent[c] != c:
            parent[c] = parent[parent[c]]
            c = parent[c]
        return c

    for cx, cy in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in dense:
                    parent[find((cx, cy))] = find(nb)
    comps = collections.Counter(find(c) for c in dense)
    got_clusters = [r for r in rows if r["cluster_id"] != -1]
    assert len(got_clusters) == len(comps)
    assert sorted(r["n_cells"] for r in got_clusters) == sorted(comps.values())
    covered = sum(cells[c] for c in dense)
    assert sum(r["n_pts"] for r in got_clusters) == covered
    noise = [r for r in rows if r["cluster_id"] == -1]
    assert len(noise) == 1 and noise[0]["n_pts"] == len(emb) - covered


def test_vwap_bar_semantics(spark):
    rows = REGISTRY["finance_vwap_monthly"].fn(spark, SF).collect()
    assert rows, "bars exist"
    for r in rows[:50]:
        assert r["low"] <= r["vwap"] <= r["high"] + 1e-9
        assert r["low"] <= r["twap"] <= r["high"] + 1e-9
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
    # recompute one bar exactly
    li = [
        x
        for x in spark.read.parquet(f"{SF}/lineitem.parquet").collect()
        if x["l_partkey"] == rows[0]["l_partkey"]
        and str(x["l_shipdate"])[:7] == str(rows[0]["month"])[:7]
    ]
    assert len(li) == rows[0]["n_trades"]
    pq = sum(int(round(x["l_extendedprice"] * x["l_quantity"] * 1e6)) for x in li)
    qs = sum(int(round(x["l_quantity"] * 1e6)) for x in li)
    assert abs(rows[0]["vwap"] - round(pq / qs, 9)) < 1e-9
    first = min(li, key=lambda x: (str(x["l_shipdate"]), x["l_orderkey"], x["l_linenumber"]))
    assert rows[0]["open"] == first["l_extendedprice"]


def test_psi_drift_identities(spark):
    rows = REGISTRY["dq_psi_drift"].fn(spark, SF).collect()
    by_feat = collections.defaultdict(list)
    for r in rows:
        by_feat[r["feature"]].append(r)
    assert set(by_feat) == {"o_totalprice", "o_orderpriority"}
    for feat, rs in by_feat.items():
        # smoothed shares sum to 1 per snapshot
        assert abs(sum(r["share_a"] for r in rs) - 1.0) < 1e-6, feat
        assert abs(sum(r["share_b"] for r in rs) - 1.0) < 1e-6, feat
        # per-feature PSI equals the quantized term sum, and PSI >= 0
        psi = rs[0]["psi"]
        assert all(abs(r["psi"] - psi) < 1e-12 for r in rs)
        term_sum = sum(int(round(r["psi_term"] * 1e6)) for r in rs) / 1e6
        assert abs(psi - term_sum) < 1e-9
        assert psi >= -1e-9, feat
    # the numeric feature has exactly 10 decile buckets
    assert len(by_feat["o_totalprice"]) == 10

"""Unit pins for the round-3 twenty-third tranche: k-core peeling vs a
pure-Python peel, time-weighted average vs direct integration, Theil-Sen
vs statistics.median of pairwise slopes."""

from __future__ import annotations

import collections
import statistics
from decimal import ROUND_HALF_UP, Decimal

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def _rup(x, dp=9):
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{dp}"), ROUND_HALF_UP))


def _copurchase_edges(spark, min_w=2):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).collect()
    orders = collections.defaultdict(list)
    for x in li:
        orders[x["l_orderkey"]].append(x["l_partkey"])
    w: collections.Counter = collections.Counter()
    for ps in orders.values():
        ps = sorted(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                if a < b:
                    w[(a, b)] += 1
    return {p for p, c in w.items() if c >= min_w}


def test_kcore_matches_pure_python_peel(spark):
    rows = REGISTRY["graph_kcore"].fn(spark, SF).collect()
    assert len(rows) == 8
    edges = _copurchase_edges(spark)
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    history = []
    for _ in range(8):
        deg = {u: sum(1 for v in adj[u] if v in alive) for u in alive}
        new_alive = {u for u in alive if deg[u] >= 3}
        history.append((len(alive) - len(new_alive), len(new_alive)))
        alive = new_alive
    for r, (rm, left) in zip(rows, history):
        assert (r["n_removed"], r["n_remaining"]) == (rm, left), r["round"]
    # monotone convergence: removals hit 0 and stay 0
    removed = [r["n_removed"] for r in rows]
    first_zero = next((i for i, x in enumerate(removed) if x == 0), len(removed))
    assert all(x == 0 for x in removed[first_zero:])


def test_twa_matches_direct_integration(spark):
    rows = REGISTRY["ts_time_weighted_avg"].fn(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    series = collections.defaultdict(list)
    for e in ev:
        if e["user_id"] <= 200:
            vm = int(_rup(e["value"] * 1e6, 0))
            series[e["user_id"]].append((int(e["ts"].timestamp() * 1e6), vm, e["value"]))
    got = {r["user_id"]: r for r in rows}
    checked = 0
    for uid, pts in series.items():
        if len(pts) < 2:
            assert uid not in got
            continue
        pts.sort(key=lambda p: (p[0], p[1]))
        num = sum(vm * (pts[i + 1][0] - t) for i, (t, vm, _) in enumerate(pts[:-1]))
        dur = pts[-1][0] - pts[0][0]
        r = got[uid]
        assert r["n_events"] == len(pts)
        assert abs(r["twa"] - _rup(num / dur / 1e6)) < 1e-9, uid
        checked += 1
    assert checked == len(rows)
    # arithmetic mean differs from TWA somewhere (the point of the op)
    assert any(abs(r["twa"] - r["arith_avg"]) > 1e-9 for r in rows)


def test_theilsen_matches_median_of_slopes(spark):
    rows = REGISTRY["stats_theilsen_slope"].fn(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = collections.defaultdict(lambda: collections.defaultdict(list))
    for e in ev:
        d = (e["ts"].date() - __import__("datetime").date(2024, 1, 1)).days
        daily[e["event_type"]][d].append(e["value"])
    got = {r["event_type"]: r for r in rows}
    for et, days in daily.items():
        ys = {}
        for d, vs in days.items():
            micro = sum(int(_rup(v * 1e6, 0)) for v in vs)
            ys[d] = _rup(micro / len(vs) / 1e6)
        ds = sorted(ys)
        slopes = sorted(
            _rup((ys[b] - ys[a]) / (b - a)) for i, a in enumerate(ds) for b in ds[i + 1 :]
        )
        r = got[et]
        assert r["n_pairs"] == len(slopes)
        assert abs(r["theilsen_slope"] - slopes[(len(slopes) + 1) // 2 - 1]) < 1e-12
        # robust estimate is finite and modest (daily means are bounded)
        assert abs(r["theilsen_slope"]) < 100
        # sanity vs statistics.median on the same slope multiset (lower
        # median == statistics.median for odd n)
        if len(slopes) % 2 == 1:
            assert abs(r["theilsen_slope"] - statistics.median(slopes)) < 1e-12

"""Unit pin for the round-3 twenty-first tranche: BFS distances vs a
pure-Python breadth-first search over the same co-purchase graph."""

from __future__ import annotations

import collections

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def test_bfs_matches_pure_python(spark):
    rows = REGISTRY["graph_bfs_distance"].fn(spark, SF).collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    ).collect()
    orders = collections.defaultdict(set)
    nodes = set()
    for x in li:
        orders[x["l_orderkey"]].add(x["l_partkey"])
        nodes.add(x["l_partkey"])
    adj = collections.defaultdict(set)
    for basket in orders.values():
        bs = sorted(basket)
        for i, u in enumerate(bs):
            for v in bs[i + 1 :]:
                adj[u].add(v)
                adj[v].add(u)
    seeds = [n for n in nodes if n <= 5]
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    d = 0
    while frontier and d < 6:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    hist = collections.Counter(dist.values())
    got = {r["dist"]: r["n_nodes"] for r in rows}
    for k, v in hist.items():
        assert got[k] == v, (k, got.get(k), v)
    assert got[-1] == len(nodes) - len(dist)
    assert sum(got.values()) == len(nodes)

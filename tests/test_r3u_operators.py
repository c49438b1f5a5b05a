"""Unit pins for the round-3 twenty-second tranche: Holt recursion vs a
pure-Python replay, HOF vector stats vs numpy, null-safe join vs manual
pair counting."""

from __future__ import annotations

import collections
import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def _rup(x, dp=9):
    return float(Decimal(repr(x)).quantize(Decimal(f"1e-{dp}"), ROUND_HALF_UP))


def test_holt_matches_pure_python(spark):
    rows = REGISTRY["ts_holt_forecast"].fn(spark, SF).collect()
    assert len(rows) == 7
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_day = collections.defaultdict(list)
    for e in ev:
        by_day[e["ts"].date()].append(e["value"])
    days = sorted(by_day)
    ys = []
    for d in days:
        vs = by_day[d]
        micro = sum(int(_rup(v * 1e6, 0)) for v in vs)
        ys.append(_rup(micro / len(vs) / 1e6))
    l, t = ys[0], 0.0
    for y in ys[1:]:
        lnew = _rup(0.5 * y + 0.5 * _rup(l + t))
        t = _rup(0.15 * (y - l) + 0.85 * t)
        l = lnew
    assert rows[0]["n_days"] == len(days)
    assert abs(rows[0]["level"] - l) < 1e-9
    assert abs(rows[0]["trend"] - t) < 1e-9
    for r in rows:
        assert abs(r["forecast"] - _rup(l + r["h"] * t)) < 1e-9
    # forecasts follow the fitted linear trend
    fs = [r["forecast"] for r in sorted(rows, key=lambda r: r["h"])]
    diffs = {round(b - a, 6) for a, b in zip(fs, fs[1:])}
    assert len(diffs) == 1  # constant step = trend


def test_hof_vector_stats_vs_numpy(spark):
    rows = REGISTRY["array_hof_vector_stats"].fn(spark, SF).collect()
    emb = {
        e["vec_id"]: np.array(e["embedding"], dtype=np.float64)
        for e in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        if e["vec_id"] < 100
    }
    assert len(rows) == len(emb)
    for r in rows[:20]:
        v = emb[r["vec_id"]]
        assert abs(r["norm"] - math.sqrt(float((v * v).sum()))) < 1e-6
        assert abs(r["mean"] - float(v.mean())) < 1e-6
        assert r["max_val"] == float(v.max())
        assert r["argmax_idx"] == int(v.argmax()) + 1  # 1-indexed
        # softmax of the max logit: 1 / sum exp(x - max)
        s = float(np.exp(v - v.max()).sum())
        assert abs(r["softmax_top1"] - 1.0 / s) < 1e-5
        assert abs(r["dot_reversed"] - float((v * v[::-1]).sum())) < 1e-6
        assert 0 < r["softmax_top1"] <= 1.0


def test_null_safe_join_counts(spark):
    rows = REGISTRY["join_null_safe"].fn(spark, SF).collect()
    ev = [
        e
        for e in spark.read.parquet(f"{SF}/events.parquet").collect()
        if e["user_id"] <= 50
    ]

    def key(e):
        return None if e["value"] < 5 else int(math.floor(e["value"])) % 7

    a = collections.Counter(key(e) for e in ev if e["event_id"] % 2 == 0)
    b = collections.Counter(key(e) for e in ev if e["event_id"] % 2 == 1)
    got = {r["key_group"]: r for r in rows}
    for k in set(a) | set(b):
        kg = -1 if k is None else k
        expect_pairs = a[k] * b[k]
        if expect_pairs == 0:
            assert kg not in got or got[kg]["n_pairs"] == 0
        else:
            assert got[kg]["n_pairs"] == expect_pairs, (kg, got.get(kg))
            assert got[kg]["n_left"] == a[k]
    # the NULL group must actually match (the point of <=>)
    if a[None] and b[None]:
        assert got[-1]["n_pairs"] == a[None] * b[None]

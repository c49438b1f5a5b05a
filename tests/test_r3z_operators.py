"""Unit pins for the round-3 twenty-seventh tranche: point-in-time
attribution vs a pure-Python replay, peak detection invariants."""

from __future__ import annotations

import collections

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def test_point_in_time_matches_pure_python(spark):
    rows = REGISTRY["join_point_in_time"].fn(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
    okey = {o["o_orderkey"]: o for o in orders}
    states = collections.defaultdict(list)
    for o in orders:
        states[o["o_custkey"]].append(
            (o["o_orderdate"], o["o_orderkey"], o["o_orderpriority"])
        )
    for v in states.values():
        v.sort()
    agg = collections.defaultdict(lambda: [0, 0])
    for x in li:
        o = okey[x["l_orderkey"]]
        cust, t = o["o_custkey"], x["l_shipdate"]
        prio = None
        for vf, seq, p in states[cust]:
            if vf <= t:
                prio = p  # sorted asc: the last matching (vf, seq) wins
            else:
                break
        # Spark's round() is HALF_UP; Python's is HALF_EVEN
        from decimal import ROUND_HALF_UP, Decimal

        rev = int(
            Decimal(repr(x["l_extendedprice"] * (1 - x["l_discount"]) * 100)).quantize(
                Decimal("1"), ROUND_HALF_UP
            )
        )
        agg[prio][0] += 1
        agg[prio][1] += rev
    got = {r["priority"]: (r["n_items"], r["rev_cents"]) for r in rows}
    assert got == {k: tuple(v) for k, v in agg.items()}
    # no-leakage sanity: every fact found a state (ship after order)
    assert None not in got or got[None][0] == agg[None][0]


def test_peak_detection_invariants(spark):
    rows = REGISTRY["ts_peak_detection"].fn(spark, SF).collect()
    assert rows, "some peaks exist"
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    hourly = collections.defaultdict(list)
    for e in ev:
        hourly[e["ts"].replace(minute=0, second=0, microsecond=0)].append(e["value"])
    ys = {}
    for h, vs in hourly.items():
        micro = sum(int(round(v * 1e6)) for v in vs)
        ys[h] = round(micro / len(vs) / 1e6, 9)
    hs = sorted(ys)
    import statistics

    got_hours = {r["hour_ts"] for r in rows}
    for r in rows:
        h = r["hour_ts"]
        i = hs.index(h)
        assert 0 < i < len(hs) - 1, "endpoints excluded"
        assert ys[h] > ys[hs[i - 1]] and ys[h] > ys[hs[i + 1]]
        assert r["above_p75"] >= -1e-12
    # completeness: every strict local max above p75 is reported
    yvals = sorted(ys.values())
    # exact quantile_cont(0.75) linear interpolation
    idx = 0.75 * (len(yvals) - 1)
    lo = int(idx)
    p75 = yvals[lo] + (yvals[lo + 1] - yvals[lo]) * (idx - lo) if lo + 1 < len(yvals) else yvals[lo]
    for i in range(1, len(hs) - 1):
        h = hs[i]
        if ys[h] > ys[hs[i - 1]] and ys[h] > ys[hs[i + 1]] and ys[h] >= round(p75, 9):
            assert h in got_hours, h

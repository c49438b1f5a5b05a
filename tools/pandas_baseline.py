"""Single-node pandas baseline for the four flagship analyses.

The reference (analyse.py) is a pandas script; the project's bar is
"match-or-beat the reference's single-node throughput at the same data
scale". This tool reimplements the four catalog analysis analogs
(`a_lifetime_rate_curve`, `b1_events_per_slot`, `b2_initial_rate_by_month`,
`c_gain_by_nation`) in pandas, in TWO fidelities:

- **loop**: the reference's actual shape — B2 and C iterate Python-level
  over per-entity groups (analyse.py:249-281, 445-478). This is what the
  reference would really cost at this scale.
- **vectorized**: best-case idiomatic pandas (groupby idxmin/idxmax),
  i.e. a generous upper bound on single-node pandas performance.

Prints one JSON line: {"sf": ..., "pandas_loop": {...}, "pandas_vectorized":
{...}, "rows": {...}}. Compare with the same four entries in BENCH_r*.json.

Usage: python tools/pandas_baseline.py [sf_dir] [--skip-loop]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.1"
SKIP_LOOP = "--skip-loop" in sys.argv


def t(name, fn, out_times, out_rows):
    t0 = time.time()
    res = fn()
    out_times[name] = round(time.time() - t0, 3)
    out_rows[name] = len(res)
    return res


def load(name):
    return pd.read_parquet(os.path.join(SF_DIR, f"{name}.parquet"))


def analysis_a(ev):
    df = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort").copy()
    first_ts = df.groupby("user_id")["ts"].transform("min")
    df["age_min"] = (df["ts"] - first_ts).dt.total_seconds() / 60.0
    d = df.groupby("user_id")[["value", "age_min"]].diff()
    df["dv"], df["dt"] = d["value"], d["age_min"]
    r = df.dropna(subset=["dv", "dt"])
    r = r[r["dt"] > 0].copy()
    r["rate"] = (r["dv"] * 60.0 / r["dt"]).clip(lower=0)
    r["mid_age"] = r["age_min"] - r["dt"] / 2
    r = r[(r["mid_age"] >= 0) & (r["mid_age"] <= 1440)].copy()
    r["bin"] = (np.maximum(np.ceil(r["mid_age"] / 5.0), 1) - 0.5) * 5.0
    agg = r.groupby("bin")["rate"].mean()
    spine = pd.Index((np.arange(288) + 0.5) * 5.0, name="bin")
    curve = agg.reindex(spine)
    return pd.DataFrame(
        {"rate": curve, "smoothed": curve.rolling(5, center=True, min_periods=1).mean()}
    ).reset_index()


def analysis_b1(ev):
    mod = ev["ts"].dt.hour * 60 + ev["ts"].dt.minute
    b = (mod // 10) * 10
    labels = b.map(lambda x: f"{x // 60:02d}:{x % 60:02d}")
    counts = labels.value_counts()
    spine = [f"{(x * 10) // 60:02d}:{(x * 10) % 60:02d}" for x in range(144)]
    return counts.reindex(spine, fill_value=0).reset_index()


def _b2_frame(li, orders):
    m = li.merge(orders[["o_orderkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
    m["age_days"] = (m["l_shipdate"] - m["o_orderdate"]).dt.days.astype(float)
    m["posting_month"] = m["o_orderdate"].dt.month
    return m[m["age_days"] <= 119]


def _b2_finish(per):
    per = per[(per["n"] >= 2) & (per["last_age"] > per["first_age"])].copy()
    per["rate"] = ((per["last_v"] - per["first_v"]) / (per["last_age"] - per["first_age"])).clip(lower=0)
    monthly = per.groupby("month")["rate"].mean().reindex(range(1, 13), fill_value=0.0).fillna(0.0)
    return pd.DataFrame(
        {"avg_rate": monthly, "smoothed": monthly.rolling(3, center=True, min_periods=1).mean()}
    ).reset_index()


def b2_loop(m):
    # the reference's per-group Python loop (analyse.py:249-281)
    rows = []
    for key, g in m.groupby("l_orderkey"):
        if len(g) < 2 or g["age_days"].nunique() <= 1:
            continue
        g = g.sort_values(["age_days", "l_linenumber", "l_extendedprice"], kind="mergesort")
        rows.append(
            (
                g["l_extendedprice"].iloc[0],
                g["l_extendedprice"].iloc[-1],
                g["age_days"].iloc[0],
                g["age_days"].iloc[-1],
                len(g),
                g["posting_month"].iloc[0],
            )
        )
    per = pd.DataFrame(rows, columns=["first_v", "last_v", "first_age", "last_age", "n", "month"])
    return _b2_finish(per)


def b2_vectorized(m):
    s = m.sort_values(["l_orderkey", "age_days", "l_linenumber", "l_extendedprice"], kind="mergesort")
    g = s.groupby("l_orderkey")
    per = pd.DataFrame(
        {
            "first_v": g["l_extendedprice"].first(),
            "last_v": g["l_extendedprice"].last(),
            "first_age": g["age_days"].min(),
            "last_age": g["age_days"].max(),
            "n": g.size(),
            "month": g["posting_month"].min(),
        }
    )
    return _b2_finish(per)


def _c_frame(li, orders, cust, nation, min_customers=50):
    m = (
        li.merge(orders[["o_orderkey", "o_custkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
        .merge(nation[["n_nationkey", "n_name"]], left_on="c_nationkey", right_on="n_nationkey")
    )
    m["age_days"] = (m["l_shipdate"] - m["o_orderdate"]).dt.days.astype(float)
    counts = cust.groupby("c_nationkey").size()
    keep = counts[counts >= min_customers].index
    return m[m["c_nationkey"].isin(keep)]


def _c_finish(per):
    per = per.dropna(subset=["first_age", "last_age"])
    per = per[per["last_age"] > per["first_age"]].copy()
    per["gain"] = (per["last_v"] - per["first_v"]).clip(lower=0)
    out = per.groupby("nation")["gain"].agg(["mean", "size"]).reset_index()
    return out.sort_values(["mean", "nation"], ascending=[False, True], kind="mergesort")


def c_loop(m):
    # the reference's per-group loop with windowed picks (analyse.py:445-478)
    rows = []
    for key, g in m.groupby("l_orderkey"):
        g = g.sort_values(["age_days", "l_linenumber", "l_extendedprice"], kind="mergesort")
        early = g[g["age_days"] <= 40]
        late = g[g["age_days"] <= 400]
        if early.empty or late.empty:
            continue
        rows.append(
            (
                early["l_extendedprice"].iloc[0],
                late["l_extendedprice"].iloc[-1],
                early["age_days"].iloc[0],
                late["age_days"].iloc[-1],
                g["n_name"].iloc[0],
            )
        )
    per = pd.DataFrame(rows, columns=["first_v", "last_v", "first_age", "last_age", "nation"])
    return _c_finish(per)


def c_vectorized(m):
    s = m.sort_values(["l_orderkey", "age_days", "l_linenumber", "l_extendedprice"], kind="mergesort")
    early = s[s["age_days"] <= 40].groupby("l_orderkey").agg(
        first_v=("l_extendedprice", "first"), first_age=("age_days", "min")
    )
    late = s[s["age_days"] <= 400].groupby("l_orderkey").agg(
        last_v=("l_extendedprice", "last"), last_age=("age_days", "max")
    )
    names = s.groupby("l_orderkey")["n_name"].min().rename("nation")
    per = early.join(late, how="inner").join(names)
    return _c_finish(per)


def main():
    ev = load("events")
    li, orders = load("lineitem"), load("orders")
    cust, nation = load("customer"), load("nation")
    times_v, rows_v = {}, {}
    t("a_lifetime_rate_curve", lambda: analysis_a(ev), times_v, rows_v)
    t("b1_events_per_slot", lambda: analysis_b1(ev), times_v, rows_v)
    mb2 = _b2_frame(li, orders)
    mc = _c_frame(li, orders, cust, nation)
    t("b2_initial_rate_by_month", lambda: b2_vectorized(mb2), times_v, rows_v)
    t("c_gain_by_nation", lambda: c_vectorized(mc), times_v, rows_v)

    times_l, rows_l = {}, {}
    if not SKIP_LOOP:
        times_l["a_lifetime_rate_curve"] = times_v["a_lifetime_rate_curve"]  # A is vectorized in the reference
        times_l["b1_events_per_slot"] = times_v["b1_events_per_slot"]
        t("b2_initial_rate_by_month", lambda: b2_loop(mb2), times_l, rows_l)
        t("c_gain_by_nation", lambda: c_loop(mc), times_l, rows_l)

    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "pandas_vectorized_sec": times_v,
                "pandas_loop_sec": times_l,
                "rows": rows_v,
            }
        )
    )


if __name__ == "__main__":
    main()

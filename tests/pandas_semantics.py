"""Pandas re-execution of the reference's semantics, used ONLY as a test
oracle for the parity pin-tests.

This is an independent, compact reimplementation of the behaviors documented
in SURVEY.md §2/§3 (with analyse.py file:line citations there) — not a copy
of the reference script. It exists so the Spark plans can be compared
row-for-row against genuine pandas semantics (pd.cut edges, rolling
min_periods, stable-sort tie-breaking, coerce-then-drop) on the shared
fixture rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

KEY = ["ad_unique_id", "push_counter"]


def qmean(s: pd.Series) -> float:
    """The engine's davg semantics: mean over values quantized to integer
    micro-units (HALF_UP for non-negatives via floor(x*1e6+0.5))."""
    if len(s) == 0 or s.isna().all():
        return np.nan
    v = s.dropna()
    return float(np.floor(v * 1e6 + 0.5).sum() / len(v) / 1e6)


def _monitor_frame(rows) -> pd.DataFrame:
    df = pd.DataFrame(
        rows, columns=["id", "ad_unique_id", "push_counter", "track_time", "ad_age_in_minutes", "views"]
    )
    return df


def _profiles_frame(rows) -> pd.DataFrame:
    return pd.DataFrame(
        rows, columns=["ad_unique_id", "push_counter", "age", "profile_url", "posting_time", "city"]
    )


def _clean_monitor_numeric(mon: pd.DataFrame) -> pd.DataFrame:
    mon = mon.copy()
    mon["ad_age_num"] = pd.to_numeric(mon["ad_age_in_minutes"], errors="coerce")
    mon["views_num"] = pd.to_numeric(mon["views"], errors="coerce")
    return mon.dropna(subset=["ad_age_num", "views_num"])


def analysis_a(monitor_rows, profile_rows, bin_size=5, smoothing_window=5) -> pd.DataFrame:
    """Lifetime view-rate curve: (category, age_group, bin, rate, smoothed_rate)."""
    mon = _clean_monitor_numeric(_monitor_frame(monitor_rows))
    prof = _profiles_frame(profile_rows)

    df = mon.merge(prof[KEY + ["age", "profile_url"]], on=KEY, how="inner")
    df = df[df["age"].notnull() & (df["age"] != "")]
    df["age_numeric"] = pd.to_numeric(df["age"], errors="coerce")
    df = df[df["age_numeric"].notnull()]
    conds = [
        df["age_numeric"].between(18, 19),
        df["age_numeric"].between(20, 25),
        df["age_numeric"] >= 26,
    ]
    df["age_group"] = np.select(conds, ["18-19", "20-25", "26+"], default=None)
    df = df[df["age_group"].notnull()]
    url = df["profile_url"].str.lower()
    df["category"] = np.select(
        [url.str.contains("sexbilder-sexvideos", na=False), url.str.contains("sexchat", na=False)],
        ["sexbilder-sexvideos", "sexchat"],
        default="other",
    )
    df = df[df["category"].isin(["sexbilder-sexvideos", "sexchat"])]

    out = []
    bins = np.arange(0, 1440 + bin_size, bin_size)
    centers = (bins[:-1] + bins[1:]) / 2
    for (cat, grp), sub in df.groupby(["category", "age_group"]):
        sub = sub.sort_values(KEY + ["ad_age_num", "id"]).copy()
        g = sub.groupby(KEY)
        sub["dv"] = g["views_num"].diff()
        sub["dt"] = g["ad_age_num"].diff()
        sub = sub.dropna(subset=["dv", "dt"])
        sub = sub[sub["dt"] > 0]
        sub["rate"] = (sub["dv"] * 60 / sub["dt"]).clip(lower=0)
        sub["mid_age"] = sub["ad_age_num"] - sub["dt"] / 2
        sub["bin"] = pd.cut(sub["mid_age"], bins=bins, labels=centers, include_lowest=True)
        binned = sub.groupby("bin", observed=False)["rate"].agg(qmean).reset_index()
        binned["bin"] = binned["bin"].astype(float)
        binned = binned.sort_values("bin")
        binned["smoothed_rate"] = (
            binned["rate"].rolling(window=smoothing_window, center=True, min_periods=1).mean()
        )
        binned["category"], binned["age_group"] = cat, grp
        out.append(binned)
    res = pd.concat(out, ignore_index=True)
    res["time_hours"] = res["bin"] / 60.0
    return res[["category", "age_group", "bin", "rate", "smoothed_rate", "time_hours"]].sort_values(
        ["category", "age_group", "bin"]
    )


def analysis_b1(profile_rows, bin_minutes=10) -> pd.DataFrame:
    prof = _profiles_frame(profile_rows)
    prof["posting_ts"] = pd.to_datetime(prof["posting_time"], errors="coerce")
    prof = prof.dropna(subset=["posting_ts", "ad_unique_id", "push_counter"])
    pushes = prof.sort_values(KEY + ["posting_ts"]).drop_duplicates(subset=KEY)
    mod = pushes["posting_ts"].dt.hour * 60 + pushes["posting_ts"].dt.minute
    n_bins = (24 * 60) // bin_minutes
    edges = np.linspace(0, n_bins * bin_minutes, n_bins + 1)
    labels = [f"{int(b // 60):02d}:{int(b % 60):02d}" for b in edges[:-1]]
    binned = pd.cut(mod, bins=edges, labels=labels, right=False, include_lowest=True)
    counts = binned.groupby(binned, observed=False).size().reindex(labels, fill_value=0)
    return pd.DataFrame({"time_bin": labels, "n_pushes": counts.values})


def analysis_b2(monitor_rows, profile_rows, max_age=119, smoothing_window=3) -> pd.DataFrame:
    mon = _monitor_frame(monitor_rows)
    mon["track_ts"] = pd.to_datetime(mon["track_time"], errors="coerce")
    mon = mon.dropna(subset=["track_ts"])
    mon = _clean_monitor_numeric(mon)
    prof = _profiles_frame(profile_rows)
    prof["posting_ts"] = pd.to_datetime(prof["posting_time"], errors="coerce")
    prof = prof.dropna(subset=["posting_ts", "ad_unique_id", "push_counter"])
    prof = prof.sort_values(KEY + ["posting_ts"]).drop_duplicates(subset=KEY)

    merged = mon.merge(prof[KEY + ["posting_ts"]], on=KEY, how="inner")
    initial = merged[merged["ad_age_num"] <= max_age]

    recs = []
    for _, grp in initial.groupby(KEY):
        grp = grp.sort_values(["ad_age_num", "id"])
        if len(grp) >= 2 and grp["ad_age_num"].nunique() > 1:
            first, last = grp.iloc[0], grp.iloc[-1]
            dt = last["ad_age_num"] - first["ad_age_num"]
            if dt > 0:
                rate = max(0.0, (last["views_num"] - first["views_num"]) / dt * 60)
                recs.append({"posting_hour": first["posting_ts"].hour, "rate": rate})
    rates = pd.DataFrame(recs)
    hourly = rates.groupby("posting_hour")["rate"].agg(qmean).reindex(range(24), fill_value=0)
    smoothed = hourly.rolling(window=smoothing_window, center=True, min_periods=1).mean()
    return pd.DataFrame(
        {"posting_hour": range(24), "avg_rate": hourly.values, "smoothed_rate": smoothed.values}
    )


def analysis_c(monitor_rows, profile_rows, min_ads=10, initial_max=40, analysis_max=400) -> pd.DataFrame:
    mon = _clean_monitor_numeric(_monitor_frame(monitor_rows))
    mon = mon.dropna(subset=["ad_unique_id", "push_counter"])
    prof = _profiles_frame(profile_rows)
    prof["city"] = prof["city"].str.strip()
    prof = prof.replace("", np.nan).dropna(subset=["ad_unique_id", "push_counter", "city"])
    prof_u = prof.sort_values(KEY + ["city"]).drop_duplicates(subset=KEY)

    merged = mon.merge(prof_u[KEY + ["city"]], on=KEY, how="inner")
    city_counts = prof_u["city"].value_counts()
    keep = city_counts[city_counts >= min_ads].index
    merged = merged[merged["city"].isin(keep)]

    recs = []
    for name, grp in merged.groupby(KEY):
        grp = grp.sort_values(["ad_age_num", "id"])
        early = grp[grp["ad_age_num"] <= initial_max]
        if early.empty:
            continue
        first = early.iloc[0]
        late = grp[grp["ad_age_num"] <= analysis_max]
        last = late.iloc[-1]
        if last["ad_age_num"] <= first["ad_age_num"]:
            continue
        recs.append(
            {"city": first["city"], "gained": max(0.0, last["views_num"] - first["views_num"])}
        )
    gained = pd.DataFrame(recs)
    agg = gained.groupby("city")["gained"].agg([qmean, "size"]).reset_index()
    agg.columns = ["city", "avg_views_gained", "n_pushes"]
    return agg.sort_values(["avg_views_gained", "city"], ascending=[False, True]).reset_index(drop=True)

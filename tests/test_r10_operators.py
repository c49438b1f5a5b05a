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

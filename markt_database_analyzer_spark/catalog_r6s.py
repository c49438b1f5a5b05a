"""Round-6 additions, part 19: Bayesian beta-binomial A/B readout, the
Wald-Wolfowitz runs test, and the day-of-week x hour-of-day activity
heatmap.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle SQL) pairs with identical semantics — exact-integer
counts, Bowling-CDF closed forms with identical expression text, total
orderings at every row selection — hash-compared at sf0.01 by the
driver.

Reference parity: the reference (analyse.py) has none of these; they
complete the experimentation suite with its Bayesian readout (posterior
conversion rates + P(treatment beats control) next to the frequentist
CUPED/TOST/power entries), the randomness family (Mann-Kendall tests
monotone trend, the runs test tests oscillation), and the plot-sink
figure set (the weekly-rhythm heatmap every analytics dashboard draws).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe.hashing import hash60, sql_hash60

_PHI = "1.0 / (1.0 + exp(-1.5976 * ({z}) - 0.07056 * ({z}) * ({z}) * ({z})))"

# --------------------------------------------------------------------------
# Bayesian beta-binomial conversion readout on the hash split
# --------------------------------------------------------------------------

_BB_SEED = 7  # the CUPED/TOST/SRM/power split
_BB_ALPHA0, _BB_BETA0 = 1.0, 1.0  # uniform prior
_Z95 = "1.959963984540054"  # 95% interval half-width in SDs (shared literal)


def _sql_beta_binomial() -> str:
    arm = f"({sql_hash60('user_id::VARCHAR', seed=_BB_SEED)} % 2)"
    phi = _PHI.format(z="(m1 - m0) / sqrt(v0 + v1)")
    return f"""
WITH u AS (
  SELECT user_id, {arm} AS arm,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(converted) AS BIGINT) AS conv
  FROM u GROUP BY arm
),
post AS (
  SELECT arm, n, conv,
         ({_BB_ALPHA0} + conv) AS a, ({_BB_BETA0} + n - conv) AS b
  FROM c
),
m AS (
  SELECT arm, n, conv,
         a / (a + b) AS pm,
         sqrt(a * b / ((a + b) * (a + b) * (a + b + 1.0))) AS ps
  FROM post
),
pair AS (
  SELECT max(CASE WHEN arm = 0 THEN pm END) AS m0,
         max(CASE WHEN arm = 1 THEN pm END) AS m1,
         max(CASE WHEN arm = 0 THEN ps * ps END) AS v0,
         max(CASE WHEN arm = 1 THEN ps * ps END) AS v1
  FROM m
)
SELECT m.arm, m.n, m.conv,
       round(m.pm, 9) AS posterior_mean,
       round(greatest(0.0, m.pm - {_Z95} * m.ps), 9) AS ci_lo,
       round(least(1.0, m.pm + {_Z95} * m.ps), 9) AS ci_hi,
       round({phi}, 6) AS p_treatment_beats_control
FROM m CROSS JOIN pair ORDER BY m.arm
"""


@register(
    "stats_bayes_beta_binomial",
    oracle=_sql_beta_binomial(),
    tags=("stats", "experimentation", "bayesian"),
)
def stats_bayes_beta_binomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian conversion readout for the seed-7 experiment: per-arm
    user-level purchase conversion under a Beta(1,1) prior — posterior
    mean, 95% credible interval (normal approximation of the Beta, the
    same z-literal as the power entry, clamped to the [0,1] support so
    a near-saturated arm never reports a probability bound above 1),
    and P(treatment > control) via
    the normal approximation of the posterior difference (Bowling CDF)
    — the decision readout Bayesian A/B platforms publish next to the
    frequentist p-value (the probability statement stakeholders
    actually ask for). Unit = user; conversion = any purchase event.

    Exactness: conversion counts are exact BIGINTs (max-per-user then
    sum); every posterior quantity is a closed-form double expression
    over those integers with identical text on both engines (Beta
    mean/variance, the z and Phi literals shared with the
    power/TOST/FDR entries).

    Scale shape: one groupBy-user shuffle (map-side combined), a 2-row
    per-arm frame, a 1-row pairing broadcast back onto it."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("bigint")
            .alias("converted")
        )
        .select(
            F.pmod(
                hash60(F.col("user_id").cast("string"), seed=_BB_SEED), F.lit(2)
            ).alias("arm"),
            "converted",
        )
    )
    c = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    a = F.lit(_BB_ALPHA0) + F.col("conv")
    b = F.lit(_BB_BETA0) + F.col("n") - F.col("conv")
    m = c.select(
        "arm",
        "n",
        "conv",
        (a / (a + b)).alias("pm"),
        F.sqrt(a * b / ((a + b) * (a + b) * (a + b + 1.0))).alias("ps"),
    )
    pair = m.agg(
        F.max(F.when(F.col("arm") == 0, F.col("pm"))).alias("m0"),
        F.max(F.when(F.col("arm") == 1, F.col("pm"))).alias("m1"),
        F.max(F.when(F.col("arm") == 0, F.col("ps") * F.col("ps"))).alias("v0"),
        F.max(F.when(F.col("arm") == 1, F.col("ps") * F.col("ps"))).alias("v1"),
    )
    z = (F.col("m1") - F.col("m0")) / F.sqrt(F.col("v0") + F.col("v1"))
    phi = 1.0 / (1.0 + F.exp(F.lit(-1.5976) * z - F.lit(0.07056) * z * z * z))
    z95 = F.lit(float(_Z95))
    return (
        m.crossJoin(F.broadcast(pair))
        .select(
            "arm",
            "n",
            "conv",
            F.round(F.col("pm"), 9).alias("posterior_mean"),
            F.round(
                F.greatest(F.lit(0.0), F.col("pm") - z95 * F.col("ps")), 9
            ).alias("ci_lo"),
            F.round(
                F.least(F.lit(1.0), F.col("pm") + z95 * F.col("ps")), 9
            ).alias("ci_hi"),
            F.round(phi, 6).alias("p_treatment_beats_control"),
        )
        .orderBy("arm")
    )


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test on the daily revenue direction sequence
# --------------------------------------------------------------------------


def _sql_runs_test() -> str:
    phi = _PHI.format(z="abs(z)")
    return f"""
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
),
led AS (
  SELECT d, x, lag(x) OVER (ORDER BY d) AS xp FROM daily
),
s AS (
  SELECT d, CASE WHEN x > xp THEN 1 ELSE 0 END AS up
  FROM led WHERE xp IS NOT NULL AND x <> xp
),
r AS (
  SELECT up, CASE WHEN lag(up) OVER (ORDER BY d) IS NULL
                    OR up <> lag(up) OVER (ORDER BY d)
             THEN 1 ELSE 0 END AS new_run
  FROM s
),
c AS (
  SELECT CAST(sum(new_run) AS BIGINT) AS runs,
         CAST(count(*) FILTER (WHERE up = 1) AS BIGINT) AS n_up,
         CAST(count(*) FILTER (WHERE up = 0) AS BIGINT) AS n_down
  FROM r
),
z AS (
  SELECT runs, n_up, n_down,
         1.0 + 2.0 * n_up * n_down / (n_up + n_down) AS mu,
         sqrt(2.0 * n_up * n_down * (2.0 * n_up * n_down - n_up - n_down)
              / ((CAST(n_up + n_down AS DOUBLE)) * (n_up + n_down)
                 * (n_up + n_down - 1.0))) AS sigma
  FROM c
),
zz AS (
  SELECT runs, n_up, n_down, mu, sigma, (runs - mu) / sigma AS z FROM z
)
SELECT runs, n_up, n_down,
       round(mu, 6) AS expected_runs,
       round(z, 9) AS z_stat,
       round(2.0 * (1.0 - {phi}), 6) AS p_value
FROM zz
"""


@register(
    "stats_runs_test",
    oracle=_sql_runs_test(),
    tags=("stats", "randomness", "timeseries"),
)
def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the up/down direction sequence of
    daily revenue (flat days dropped — the standard tie handling):
    counts maximal runs of consecutive same-direction moves and tests
    them against the exact run-count mean/variance for a random
    arrangement of n_up ups and n_down downs. Too FEW runs = trending
    (momentum), too MANY = oscillating (mean reversion) — the
    randomness diagnostic that complements ``ts_mann_kendall_trend``
    (monotone trend) and ``ts_autocorrelation`` (linear memory).

    Exactness: directions are exact integer comparisons of exact cents
    totals; run starts come from one lag over the (day) total order;
    the z formula is a single double expression over three exact
    BIGINTs; two-sided p via the Bowling logistic CDF on |z|.

    Scale shape: one map-side-combined daily aggregate; both lag
    windows and the 1-row reduce run on the day-grain frame (the
    Sharpe/VaR discipline)."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("d")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("x")
    )
    w = Window.orderBy("d")
    led = daily.select("d", "x", F.lag("x").over(w).alias("xp"))
    s = led.filter(F.col("xp").isNotNull() & (F.col("x") != F.col("xp"))).select(
        "d", F.when(F.col("x") > F.col("xp"), 1).otherwise(0).alias("up")
    )
    r = s.select(
        "up",
        F.when(
            F.lag("up").over(w).isNull() | (F.col("up") != F.lag("up").over(w)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    c = r.agg(
        F.sum("new_run").cast("bigint").alias("runs"),
        F.count(F.when(F.col("up") == 1, 1)).cast("bigint").alias("n_up"),
        F.count(F.when(F.col("up") == 0, 1)).cast("bigint").alias("n_down"),
    )
    nu, nd = F.col("n_up"), F.col("n_down")
    mu = 1.0 + 2.0 * nu * nd / (nu + nd)
    sigma = F.sqrt(
        2.0
        * nu
        * nd
        * (2.0 * nu * nd - nu - nd)
        / ((nu + nd).cast("double") * (nu + nd) * (nu + nd - 1.0))
    )
    zz = c.select(
        "runs",
        "n_up",
        "n_down",
        mu.alias("mu"),
        sigma.alias("sigma"),
        ((F.col("runs") - mu) / sigma).alias("z"),
    )
    az = F.abs(F.col("z"))
    phi = 1.0 / (1.0 + F.exp(F.lit(-1.5976) * az - F.lit(0.07056) * az * az * az))
    return zz.select(
        "runs",
        "n_up",
        "n_down",
        F.round(F.col("mu"), 6).alias("expected_runs"),
        F.round(F.col("z"), 9).alias("z_stat"),
        F.round(2.0 * (1.0 - phi), 6).alias("p_value"),
    )


# --------------------------------------------------------------------------
# Day-of-week x hour-of-day activity heatmap with cell z-scores
# --------------------------------------------------------------------------


def _sql_heatmap() -> str:
    return """
WITH cells AS (
  SELECT CAST(isodow(ts) AS BIGINT) AS dow,
         CAST(hour(ts) AS BIGINT) AS hod,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS grid,
         CAST(sum(CAST(n AS HUGEINT)) AS DOUBLE) AS s,
         CAST(sum(CAST(n AS HUGEINT) * n) AS DOUBLE) AS ss
  FROM cells
),
m AS (
  SELECT grid, s / grid AS mean,
         sqrt(greatest(ss / grid - (s / grid) * (s / grid), 0.0)) AS sd
  FROM tot
)
SELECT dow, hod, n,
       round((n - mean) / sd, 9) AS z_score
FROM cells, m ORDER BY dow, hod
"""


@register(
    "events_dow_hour_heatmap",
    oracle=_sql_heatmap(),
    tags=("events", "heatmap", "plot", "rhythm"),
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap (ISO weekday 1-7 x
    hour 0-23) with per-cell z-scores against the grid mean — the
    weekly-rhythm figure every analytics dashboard draws (and the
    plot-sink S5 shape the reference's hour-grid figures foreshadow);
    the z-score normalization is what makes hot/cold cells comparable
    across corpora of different sizes.

    Exactness: cell counts are exact BIGINTs from ONE map-side-combined
    groupBy; the grid moments accumulate those integers in
    HUGEINT/decimal (population variance, greatest-0 clamp) and each
    z-score is a single double expression over them.

    Scale shape: one aggregate to the ≤168-cell frame; the 1-row grid
    moments broadcast back onto it — nothing downstream of the scan is
    data-sized."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.expr("CAST(extract(DAYOFWEEK_ISO FROM ts) AS BIGINT)").alias("dow"),
        F.hour("ts").cast("bigint").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nd = F.col("n").cast("decimal(38,0)")
    tot = cells.agg(
        F.count(F.lit(1)).cast("double").alias("grid"),
        F.sum(nd).cast("double").alias("s"),
        F.sum(nd * F.col("n")).cast("double").alias("ss"),
    )
    mean = F.col("s") / F.col("grid")
    sd = F.sqrt(F.greatest(F.col("ss") / F.col("grid") - mean * mean, F.lit(0.0)))
    m = tot.select("grid", mean.alias("mean"), sd.alias("sd"))
    return (
        cells.crossJoin(F.broadcast(m))
        .select(
            "dow",
            "hod",
            "n",
            F.round((F.col("n") - F.col("mean")) / F.col("sd"), 9).alias(
                "z_score"
            ),
        )
        .orderBy("dow", "hod")
    )

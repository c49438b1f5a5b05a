"""Round-7 catalog entries, part 1: the lift/gains decile table on the
equi-depth-cuts scale path — closing the last documented laptop-form
plan (``eval_lift_gains_deciles``'s global ``ntile``, VERDICT r6 item 5).

Reference parity: the reference (reference/analyse.py) has no ranking-
evaluation operators; this family exists for the engine's own curation
analytics, graded as first-class alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import SQL_DAVG, _t, register
from .datapipe import text as tx
from .functions import davg
from .operators.equidepth import (
    bucket_by_cuts,
    equi_depth_cut_points,
    sql_cuts_ctes,
)

# Bowling et al.'s logistic approximation of the standard normal CDF —
# the same literal every stats entry in the catalog shares, so p-values
# are identical closed-form expressions on both engines.
_PHI = "1.0 / (1.0 + exp(-1.5976 * ({z}) - 0.07056 * ({z}) * ({z}) * ({z})))"

# --------------------------------------------------------------------------
# Decile lift / cumulative gains via exact percentile cuts (scale path)
# --------------------------------------------------------------------------

_LIFT_STOPWORDS = "('the', 'a', 'of', 'and', 'is')"


def _sql_lift_cuts() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
         CAST(round(len(list_filter({toks}, t -> t IN {_LIFT_STOPWORDS}))
                      / CAST(len({toks}) AS DOUBLE) * 1e9)
              AS BIGINT) AS s9
  FROM documents
  WHERE len({toks}) > 0
),
{sql_cuts_ctes("scored", "s9", 10)},
cl AS (SELECT coalesce(list(c ORDER BY b), []) AS cs FROM cuts),
dec AS (
  SELECT label,
         CAST(11 - (1 + len(list_filter(cl.cs, x -> s9 > x))) AS BIGINT)
           AS decile
  FROM scored, cl
),
agg AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS pos
  FROM dec GROUP BY 1
)
SELECT decile, n, pos,
       round((pos / CAST(n AS DOUBLE))
             / (CAST(sum(pos) OVER () AS DOUBLE) / sum(n) OVER ()), 9) AS lift,
       round(CAST(sum(pos) OVER (ORDER BY decile) AS DOUBLE)
             / sum(pos) OVER (), 9) AS cum_gain,
       round((CAST(sum(pos) OVER (ORDER BY decile) AS DOUBLE)
              / sum(n) OVER (ORDER BY decile))
             / (CAST(sum(pos) OVER () AS DOUBLE) / sum(n) OVER ()), 9) AS cum_lift
FROM agg ORDER BY decile
"""


@register(
    "eval_lift_gains_deciles_cuts",
    oracle=_sql_lift_cuts(),
    tags=("eval", "ranking", "lift", "gains", "equidepth", "scale"),
)
def eval_lift_gains_deciles_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative gains on the EXACT-PERCENTILE-CUTS scale
    path — the 100 TB form of ``eval_lift_gains_deciles`` (which keeps
    the standard ``ntile(10)`` total order as the oracle-parity pin and
    was the last documented laptop-form plan in the catalog). Decile
    boundaries are exact order statistics of the score via the
    distributed prefix sum (operators/equidepth.py — no task ever sees
    the whole table, no un-partitioned Window anywhere in the plan);
    assignment is the map-only ``1 + sum(s > cut)`` flipped so decile 1
    holds the HIGHEST scores (the targeting convention). Ties sit in one
    decile wholesale — the warehouse equi-depth contract — so decile
    counts are equal only up to tie mass (vs ntile's forced-equal split
    of ties), which is exactly the semantics a campaign cut at "top 10%
    by score" actually applies.

    Cumulative gains WITHOUT a window (and without a constant-key join,
    which Catalyst constant-folds into a nested loop): the per-decile
    frame (≤10 rows, eagerly checkpointed) explodes each row to
    ``sequence(decile, 10)`` cover keys and re-aggregates — cumulative-
    through-d sums as one tiny map-side-combined shuffle; grand totals
    replicate the same way over ``sequence(1, 10)`` so both stitch back
    as KEYED broadcast hash joins on the decile. Scores quantize to
    BIGINT nano-ratios before the cut derivation so the domain groupBy
    is exact integer equality on both engines."""
    docs = _t(spark, sf_dir, "documents")
    # zero-token guard (ADVICE r8): an empty-token document would make
    # the stopword ratio 0/0 — NULL in Spark, raise/NaN in DuckDB — so
    # both programs exclude it identically before scoring.
    base = docs.select("lang", tx.tokens("text").alias("toks")).filter(
        F.size("toks") > 0
    )
    stop = F.filter(F.col("toks"), lambda t: t.isin("the", "a", "of", "and", "is"))
    scored = base.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
        F.round(F.size(stop) / F.size("toks").cast("double") * 1e9, 0)
        .cast("bigint")
        .alias("s9"),
    ).localCheckpoint(eager=True)  # feeds the cut derivation AND assignment
    cuts = equi_depth_cut_points(scored, F.col("s9"), 10)
    dec = scored.select(
        "label",
        (F.lit(11) - bucket_by_cuts(F.col("s9"), cuts)).alias("decile"),
    )
    agg = (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("pos"),
        )
        .localCheckpoint(eager=True)  # ≤10 rows; feeds cover AND the join
    )
    cums = (
        agg.select(
            F.explode(F.sequence(F.col("decile"), F.lit(10))).alias("dc"),
            "n",
            "pos",
        )
        .groupBy("dc")
        .agg(
            F.sum("n").cast("bigint").alias("cum_n"),
            F.sum("pos").cast("bigint").alias("cum_pos"),
        )
    )
    tots = (
        agg.select(
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("dt"),
            "n",
            "pos",
        )
        .groupBy("dt")
        .agg(
            F.sum("n").cast("bigint").alias("tot_n"),
            F.sum("pos").cast("bigint").alias("tot_pos"),
        )
    )
    base_rate = F.col("tot_pos").cast("double") / F.col("tot_n")
    return (
        agg.join(F.broadcast(cums), agg["decile"] == cums["dc"])
        .join(F.broadcast(tots), agg["decile"] == tots["dt"])
        .select(
            "decile",
            "n",
            "pos",
            F.round(
                (F.col("pos") / F.col("n").cast("double")) / base_rate, 9
            ).alias("lift"),
            F.round(
                F.col("cum_pos").cast("double") / F.col("tot_pos"), 9
            ).alias("cum_gain"),
            F.round(
                (F.col("cum_pos").cast("double") / F.col("cum_n")) / base_rate, 9
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )


# --------------------------------------------------------------------------
# Grubbs outlier test on the daily revenue series
# --------------------------------------------------------------------------


def _sql_grubbs() -> str:
    return """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
  FROM daily
),
m AS (
  SELECT n, sx / n AS mean,
         sqrt((sxx - n * (sx / n) * (sx / n)) / (n - 1)) AS sd
  FROM s
)
SELECT m.n,
       round(m.mean, 6) AS mean_cents,
       round(m.sd, 6) AS sd_cents,
       round(abs(daily.x - m.mean) / m.sd, 9) AS g_stat,
       daily.d AS outlier_day,
       daily.x AS outlier_cents
FROM daily CROSS JOIN m
ORDER BY abs(daily.x - m.mean) DESC, daily.d
LIMIT 1
"""


@register(
    "stats_grubbs_test",
    oracle=_sql_grubbs(),
    tags=("stats", "outlier", "grubbs"),
)
def stats_grubbs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs (maximum normed residual) outlier statistic on the daily
    revenue series: G = max |x - x̄| / s over days, plus the flagged day
    and its value — the single-outlier screen run before alerting on a
    revenue dip/spike. Daily sums are exact BIGINT cents; moments come
    from DECIMAL(38,0)-exact Σx/Σx² (overflow-safe at any volume) and
    G is the identical double expression on both engines. The argmax
    orders on the RAW deviation (then day) before the 9-dp rounding
    projection — the stats_lognormal_fit_ks discipline.

    Scale shape: one map-side-combined day groupBy (the frame is
    days-sized forever after), a 1-row moment broadcast back onto it
    (scalar idiom), and a TakeOrdered(1). No window anywhere."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("d")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("x")
    )
    xd = F.col("x").cast("decimal(38,0)")
    s = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(xd * F.col("x")).cast("double").alias("sxx"),
    )
    m = s.select(
        "n",
        (F.col("sx") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("sxx") - F.col("n") * (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n")))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    return (
        daily.crossJoin(F.broadcast(m))
        .orderBy(F.desc(F.abs(F.col("x") - F.col("mean"))), "d")
        .limit(1)
        .select(
            "n",
            F.round("mean", 6).alias("mean_cents"),
            F.round("sd", 6).alias("sd_cents"),
            F.round(F.abs(F.col("x") - F.col("mean")) / F.col("sd"), 9).alias(
                "g_stat"
            ),
            F.col("d").alias("outlier_day"),
            F.col("x").alias("outlier_cents"),
        )
    )


# --------------------------------------------------------------------------
# Ljung-Box portmanteau autocorrelation test on the hourly value series
# --------------------------------------------------------------------------

_LB_MAX_LAG = 6


def _sql_ljung_box() -> str:
    leads = ", ".join(
        f"lead(x, {k}) OVER (ORDER BY h) AS x{k}" for k in range(1, _LB_MAX_LAG + 1)
    )
    nums = ",\n    ".join(
        f"CAST(sum(CAST(round((x - xbar) * (x{k} - xbar) * 1e9) AS BIGINT)) AS BIGINT)"
        f" AS num{k}"
        for k in range(1, _LB_MAX_LAG + 1)
    )
    qsum = " + ".join(
        f"(CAST(num{k} AS DOUBLE) / denom) * (CAST(num{k} AS DOUBLE) / denom)"
        f" / (nn - {k})"
        for k in range(1, _LB_MAX_LAG + 1)
    )
    df = float(_LB_MAX_LAG)
    wh_z = (
        f"(cbrt(q / {df}) - (1.0 - 2.0 / (9.0 * {df})))"
        f" / sqrt(2.0 / (9.0 * {df}))"
    )
    phi = _PHI.format(z="z")
    davg_x = SQL_DAVG.format(x="value")
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, {davg_x} AS x
  FROM events GROUP BY 1
),
m AS (SELECT {SQL_DAVG.format(x='x')} AS xbar, CAST(count(*) AS BIGINT) AS nn
      FROM hourly),
led AS (
  SELECT x, xbar, nn, {leads}
  FROM hourly, m
),
s AS (
  SELECT max(nn) AS nn,
    CAST(sum(CAST(round((x - xbar) * (x - xbar) * 1e9) AS BIGINT)) AS BIGINT) AS denom,
    {nums}
  FROM led
),
q AS (
  SELECT nn, CAST({_LB_MAX_LAG} AS BIGINT) AS df,
         nn * (nn + 2.0) * ({qsum}) AS q
  FROM s
),
z AS (SELECT nn, df, q, {wh_z} AS z FROM q)
SELECT nn AS n, df, round(q, 9) AS q_stat,
       round(1.0 - ({phi}), 6) AS p_value
FROM z
"""


@register(
    "stats_ljung_box",
    oracle=_sql_ljung_box(),
    tags=("stats", "timeseries", "ljung-box"),
)
def stats_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (lags 1..6) on the hourly mean-value
    series: Q = n(n+2) Σ r_k²/(n-k) with the p-value via the
    Wilson-Hilferty cube-root normal approximation of χ²(6) and the
    catalog's shared Bowling Φ — 'is this series white noise, or is the
    ACF telling the truth?', the readout published next to
    ``ts_autocorrelation``'s coefficients. Same construction as that
    entry: the series is an hourly aggregate FIRST (the ordered lead
    window runs over series cardinality, never raw events), each
    autocovariance term quantizes to a nano-grid integer, and every
    downstream number is a closed-form double expression over those
    integers, identical text on both engines.

    Scale shape: one map-side-combined hour groupBy, the 1-row series
    mean broadcast (scalar idiom), one bounded window sort producing
    all six leads, one 1-row reduce."""
    hourly = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(davg("value").alias("x"))
    )
    from pyspark.sql import Window

    m = hourly.agg(
        davg("x").alias("xbar"), F.count(F.lit(1)).cast("bigint").alias("nn")
    )
    w = Window.orderBy("h")
    led = hourly.crossJoin(F.broadcast(m)).select(
        "x",
        "xbar",
        "nn",
        *[F.lead("x", k).over(w).alias(f"x{k}") for k in range(1, _LB_MAX_LAG + 1)],
    )

    def qprod(a, b):
        return F.sum(
            F.round((a - F.col("xbar")) * (b - F.col("xbar")) * 1e9).cast("bigint")
        )

    s = led.agg(
        F.max("nn").alias("nn"),
        qprod(F.col("x"), F.col("x")).alias("denom"),
        *[
            qprod(F.col("x"), F.col(f"x{k}")).alias(f"num{k}")
            for k in range(1, _LB_MAX_LAG + 1)
        ],
    )
    qsum = None
    for k in range(1, _LB_MAX_LAG + 1):
        rk = F.col(f"num{k}").cast("double") / F.col("denom")
        term = rk * rk / (F.col("nn") - F.lit(k))
        qsum = term if qsum is None else qsum + term
    dfl = float(_LB_MAX_LAG)
    q = s.select(
        "nn",
        F.lit(_LB_MAX_LAG).cast("bigint").alias("df"),
        (F.col("nn") * (F.col("nn") + F.lit(2.0)) * qsum).alias("q"),
    )
    z = (F.cbrt(F.col("q") / F.lit(dfl)) - (F.lit(1.0) - F.lit(2.0) / (9.0 * dfl))) / F.sqrt(
        F.lit(2.0 / (9.0 * dfl))
    )
    phi = 1.0 / (1.0 + F.exp(F.lit(-1.5976) * z - F.lit(0.07056) * z * z * z))
    return q.select(
        F.col("nn").alias("n"),
        "df",
        F.round("q", 9).alias("q_stat"),
        F.round(F.lit(1.0) - phi, 6).alias("p_value"),
    )


# --------------------------------------------------------------------------
# CAPM-style beta/alpha of each event-type engagement series vs market
# --------------------------------------------------------------------------

# micro-quantized mean of a ~1e-2-magnitude log return: nano grid
_SQL_DAVG9 = (
    "(CAST(SUM(CAST(round(({x}) * 1000000000.0) AS HUGEINT)) AS DOUBLE)"
    " / COUNT({x}) / 1000000000.0)"
)


def _sql_beta_capm() -> str:
    davg_x = SQL_DAVG.format(x="value")
    return f"""
WITH ht AS (
  SELECT event_type, date_trunc('hour', ts) AS h, {davg_x} AS xt
  FROM events GROUP BY 1, 2
),
hm AS (
  SELECT date_trunc('hour', ts) AS h, {davg_x} AS xm
  FROM events GROUP BY 1
),
rt AS (
  SELECT event_type, h,
         ln(xt) - ln(lag(xt) OVER (PARTITION BY event_type ORDER BY h)) AS ri
  FROM ht
),
rm AS (
  SELECT h, ln(xm) - ln(lag(xm) OVER (ORDER BY h)) AS rmkt
  FROM hm
),
j AS (
  SELECT rt.event_type, rt.ri, rm.rmkt
  FROM rt JOIN rm ON rt.h = rm.h
  WHERE rt.ri IS NOT NULL AND rm.rmkt IS NOT NULL
),
mu AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         {_SQL_DAVG9.format(x='ri')} AS mi,
         {_SQL_DAVG9.format(x='rmkt')} AS mm
  FROM j GROUP BY 1
),
s AS (
  SELECT j.event_type, max(mu.n) AS n, max(mu.mi) AS mi, max(mu.mm) AS mm,
         CAST(sum(CAST(round((j.ri - mu.mi) * (j.rmkt - mu.mm) * 1e9)
                       AS BIGINT)) AS BIGINT) AS s_im,
         CAST(sum(CAST(round((j.rmkt - mu.mm) * (j.rmkt - mu.mm) * 1e9)
                       AS BIGINT)) AS BIGINT) AS s_mm
  FROM j JOIN mu ON j.event_type = mu.event_type
  GROUP BY 1
)
SELECT event_type, n AS n_hours,
       round(CAST(s_im AS DOUBLE) / s_mm, 6) AS beta,
       round(mi - (CAST(s_im AS DOUBLE) / s_mm) * mm, 9) AS alpha
FROM s ORDER BY event_type
"""


@register(
    "finance_beta_capm",
    oracle=_sql_beta_capm(),
    tags=("finance", "beta", "regression", "timeseries"),
)
def finance_beta_capm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPM-style beta and alpha of each event-type's hourly engagement
    series against the all-types 'market' series: hourly mean value per
    type, log returns hour-over-hour, then beta_i = cov(r_i, r_m) /
    var(r_m) and alpha_i = r̄_i − beta_i·r̄_m over the type's matched
    hours — the systematic-vs-idiosyncratic decomposition a portfolio
    (or a product-analytics 'which segment just amplifies the site-wide
    trend?') readout runs. Log returns sidestep level scale; means are
    nano-quantized and every centered product quantizes to a nano-grid
    integer before summing (the ACF discipline), so covariances are
    exact integer ratios on both engines.

    Scale shape: two map-side-combined hour groupBys (the frames are
    series-sized forever after); the market series joins by hour (both
    sides bounded by the horizon); per-type means broadcast back onto
    the matched frame (5 rows). The per-type lag window partitions by
    type; the market lag runs over the bounded hourly series — the
    ts_autocorrelation precedent."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "value")
    ht = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(davg("value").alias("xt"))
    hm = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        davg("value").alias("xm")
    )
    wt = Window.partitionBy("event_type").orderBy("h")
    wm = Window.orderBy("h")
    rt = ht.select(
        "event_type",
        "h",
        (F.ln("xt") - F.ln(F.lag("xt").over(wt))).alias("ri"),
    )
    rm = hm.select("h", (F.ln("xm") - F.ln(F.lag("xm").over(wm))).alias("rmkt"))
    j = (
        rt.join(rm, "h")
        .where(F.col("ri").isNotNull() & F.col("rmkt").isNotNull())
        .select("event_type", "ri", "rmkt")
    )

    def davg9(c):
        return (
            F.sum(F.round(c * 1e9).cast("decimal(38,0)")).cast("double")
            / F.count(c)
            / 1e9
        )

    mu = j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        davg9(F.col("ri")).alias("mi"),
        davg9(F.col("rmkt")).alias("mm"),
    )
    s = (
        j.join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("mi").alias("mi"),
            F.max("mm").alias("mm"),
            F.sum(
                F.round((F.col("ri") - F.col("mi")) * (F.col("rmkt") - F.col("mm")) * 1e9)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("s_im"),
            F.sum(
                F.round((F.col("rmkt") - F.col("mm")) * (F.col("rmkt") - F.col("mm")) * 1e9)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("s_mm"),
        )
    )
    beta = F.col("s_im").cast("double") / F.col("s_mm")
    return s.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.round(beta, 6).alias("beta"),
        F.round(F.col("mi") - beta * F.col("mm"), 9).alias("alpha"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph
# --------------------------------------------------------------------------

_ASSORT_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT x AS node FROM e UNION ALL SELECT y AS node FROM e)
  GROUP BY node
),
de AS (
  SELECT dx.deg AS du, dy.deg AS dv
  FROM e JOIN deg dx ON dx.node = e.x JOIN deg dy ON dy.node = e.y
),
sym AS (
  SELECT du AS a, dv AS b FROM de
  UNION ALL
  SELECT dv AS a, du AS b FROM de
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS m2,
         CAST(sum(CAST(a AS HUGEINT)) AS DOUBLE) AS sa,
         CAST(sum(CAST(a AS HUGEINT) * a) AS DOUBLE) AS saa,
         CAST(sum(CAST(a AS HUGEINT) * b) AS DOUBLE) AS sab
  FROM sym
)
SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
       round((m2 * sab - sa * sa)
             / (m2 * saa - sa * sa), 9) AS assortativity
FROM s
"""


@register(
    "graph_degree_assortativity",
    oracle=_ASSORT_SQL,
    tags=("graph", "assortativity"),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph (parts sharing an
    order, the edge set every graph entry uses): the Pearson correlation
    of endpoint degrees over the symmetrized edge list — 'do hub parts
    co-occur with hubs (assortative, r>0) or with leaves (dis-
    assortative, r<0)?', the one-number mixing summary published next to
    the clustering coefficient. Degrees are exact integers, so every
    moment is an exact DECIMAL(38,0) integer sum (overflow-safe at any
    edge count) and r is one closed-form double expression over six
    integers — identical on both engines, no quantization needed. On the
    symmetrized list the two endpoint marginals coincide, so the usual
    four-moment formula collapses to three sums.

    Scale shape: the edge self-join shuffles on orderkey (bounded per-
    order fanout); degrees are one map-side-combined groupBy; the two
    degree lookups are equi-joins on node id; the rest is a 1-row
    reduce. No window, no driver state beyond the single output row."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    e = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y"))
        .distinct()
        # the edge set feeds the degree build AND both lookup joins —
        # without the pin the per-order self-join re-runs three times
        # (measured 34.5 s -> ~8 s at sf0.1)
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .localCheckpoint(eager=True)  # reused by both endpoint joins
    )
    de = (
        e.join(deg.withColumnRenamed("node", "x").withColumnRenamed("deg", "du"), "x")
        .join(deg.withColumnRenamed("node", "y").withColumnRenamed("deg", "dv"), "y")
        .select("du", "dv")
    )
    sym = de.select(F.col("du").alias("a"), F.col("dv").alias("b")).unionAll(
        de.select(F.col("dv").alias("a"), F.col("du").alias("b"))
    )
    ad = F.col("a").cast("decimal(38,0)")
    s = sym.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),
        F.sum(ad).cast("double").alias("sa"),
        F.sum(ad * F.col("a")).cast("double").alias("saa"),
        F.sum(ad * F.col("b")).cast("double").alias("sab"),
    )
    return s.select(
        (F.col("m2") / 2).cast("bigint").alias("n_edges"),
        F.round(
            (F.col("m2") * F.col("sab") - F.col("sa") * F.col("sa"))
            / (F.col("m2") * F.col("saa") - F.col("sa") * F.col("sa")),
            9,
        ).alias("assortativity"),
    )


# --------------------------------------------------------------------------
# l-diversity audit (the k-anonymity sibling: sensitive-value diversity)
# --------------------------------------------------------------------------

_LDIV_L = 3  # distinct-l disclosure threshold
_LDIV_BAND = 100_000  # acctbal band width in cents (matches the k-anon audit)


def _sql_ldiversity() -> str:
    return f"""
WITH qid AS (
  SELECT c_nationkey,
         CAST(floor(CAST(round(c_acctbal * 100.0) AS BIGINT)
                    / {_LDIV_BAND}.0) AS BIGINT) AS bal_band,
         c_mktsegment AS sensitive
  FROM customer
),
cell AS (
  SELECT c_nationkey, bal_band, sensitive, CAST(count(*) AS BIGINT) AS c
  FROM qid GROUP BY 1, 2, 3
),
cls_k AS (
  SELECT c_nationkey, bal_band, CAST(sum(c) AS BIGINT) AS k
  FROM cell GROUP BY 1, 2
),
cls AS (
  SELECT cell.c_nationkey, cell.bal_band,
         CAST(max(k) AS BIGINT) AS k,
         CAST(count(*) AS BIGINT) AS distinct_l,
         CAST(sum(CAST(round(-(c / CAST(k AS DOUBLE))
                             * ln(c / CAST(k AS DOUBLE)) * 1e9)
                       AS BIGINT)) AS BIGINT) AS h9
  FROM cell JOIN cls_k USING (c_nationkey, bal_band)
  GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_rows,
       CAST(min(distinct_l) AS BIGINT) AS min_distinct_l,
       CAST(count(*) FILTER (WHERE distinct_l < {_LDIV_L}) AS BIGINT)
         AS classes_below_l,
       CAST(sum(k) FILTER (WHERE distinct_l < {_LDIV_L}) AS BIGINT)
         AS rows_below_l,
       round(coalesce(sum(k) FILTER (WHERE distinct_l < {_LDIV_L}), 0)
             / CAST(sum(k) AS DOUBLE), 9) AS at_risk_fraction,
       round(exp(CAST(min(h9) AS DOUBLE) / 1e9), 9) AS min_entropy_l
FROM cls
"""


@register(
    "privacy_l_diversity",
    oracle=_sql_ldiversity(),
    tags=("privacy", "l-diversity", "data-quality"),
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the customer table: equivalence classes
    under the quasi-identifier (nation, 1000-unit balance band), with
    market segment as the SENSITIVE attribute — distinct-l (classes
    where every member shares one segment leak it outright even at
    k≥5) and entropy-l (exp of the class's sensitive-value entropy, the
    Machanavajjhala refinement that catches 99%-skewed classes the
    distinct count misses). The audit a release pipeline runs AFTER
    ``privacy_k_anonymity_audit``: k bounds re-identification,
    l bounds attribute disclosure.

    Exactness: cell and class counts are exact BIGINTs; each class
    entropy term −(c/k)·ln(c/k) is an identical closed-form expression
    over exact integer ratios on both engines AND quantizes to the
    bigint nano-grid BEFORE the per-class sum (the catalog's standard
    discipline — a raw double Σ is summation-order sensitive), so the
    class entropies are exact integers; min/exp at the end are
    order-free.

    Scale shape: two map-side-combined groupBys (cells, then classes —
    both bounded by attribute-domain products, never the table), then
    a 1-row combine. No joins, no windows on the Spark side."""
    c = _t(spark, sf_dir, "customer")
    qid = c.select(
        "c_nationkey",
        F.floor(
            F.round(F.col("c_acctbal") * 100.0).cast("bigint") / float(_LDIV_BAND)
        )
        .cast("bigint")
        .alias("bal_band"),
        F.col("c_mktsegment").alias("sensitive"),
    )
    cell = qid.groupBy("c_nationkey", "bal_band", "sensitive").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # k must be ON the cell rows before the entropy terms form (the
    # algebraic rewrite H = ln k − (1/k)Σ c·ln c is exact in real
    # arithmetic but not bit-identical in floats), so both engines
    # compute class totals first and join them back onto the cells.
    ktot = cell.groupBy("c_nationkey", "bal_band").agg(
        F.sum("c").cast("bigint").alias("k")
    )
    p = F.col("c") / F.col("k").cast("double")
    # each −p·ln p term quantizes to the bigint nano-grid BEFORE the sum
    # (ADVICE r8): a raw double sum is summation-order sensitive, and
    # this was the one r7 float reduction skipping the catalog's
    # nano-grid discipline.
    cls = (
        cell.join(ktot, ["c_nationkey", "bal_band"])
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.max("k").alias("k"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_l"),
            F.sum(F.round(-p * F.ln(p) * 1e9, 0).cast("bigint"))
            .cast("bigint")
            .alias("h9"),
        )
    )
    below = F.col("distinct_l") < _LDIV_L
    return cls.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("k").cast("bigint").alias("n_rows"),
        F.min("distinct_l").cast("bigint").alias("min_distinct_l"),
        F.count(F.when(below, 1)).cast("bigint").alias("classes_below_l"),
        F.sum(F.when(below, F.col("k"))).cast("bigint").alias("rows_below_l"),
        F.round(
            F.coalesce(F.sum(F.when(below, F.col("k"))), F.lit(0))
            / F.sum("k").cast("double"),
            9,
        ).alias("at_risk_fraction"),
        F.round(F.exp(F.min("h9").cast("double") / 1e9), 9).alias("min_entropy_l"),
    )


# --------------------------------------------------------------------------
# Differentially-private released counts (deterministic Laplace mechanism)
# --------------------------------------------------------------------------

_DP_EPS = 1.0  # privacy budget; sensitivity 1 for a per-entity count
_DP_SEED = 23
_TWO60 = 1152921504606846976.0  # 2^60, the hash60 range


def _sql_dp_laplace() -> str:
    from .datapipe.hashing import sql_hash60

    u = f"(({sql_hash60('n_name', seed=_DP_SEED)} + 0.5) / {_TWO60})"
    return f"""
WITH c AS (
  SELECT n.n_name, CAST(count(*) AS BIGINT) AS true_count
  FROM customer JOIN nation n ON c_nationkey = n.n_nationkey
  GROUP BY 1
),
noise AS (
  SELECT n_name, true_count, {u} AS u
  FROM c
)
SELECT n_name, true_count,
       round(true_count
             - (1.0 / {_DP_EPS}) * (CASE WHEN u >= 0.5 THEN 1.0 ELSE -1.0 END)
               * ln(1.0 - 2.0 * abs(u - 0.5)), 6) AS noisy_count,
       round((1.0 / {_DP_EPS}), 6) AS laplace_scale
FROM noise ORDER BY n_name
"""


@register(
    "privacy_dp_laplace_counts",
    oracle=_sql_dp_laplace(),
    tags=("privacy", "differential-privacy", "laplace"),
)
def privacy_dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism released counts: customers per nation with
    Laplace(1/ε) noise at ε=1 (sensitivity 1 for a per-entity count) —
    the ε-DP release primitive, with the noise draw DERANDOMIZED the
    way every sampling entry in this catalog is (RNG-free md5 gates):
    u = (hash60(key)+0.5)/2^60 is a uniform in (0,1) derived from the
    release key, and the noise is the exact inverse-CDF transform
    −(1/ε)·sign(u−½)·ln(1−2|u−½|). Deterministic noise is NOT private
    against an adversary who knows the seed — this entry is the AUDIT
    view (true and noisy side by side, the utility-loss readout a DP
    pipeline publishes internally); a production release would swap the
    hash for a secret-keyed PRF and drop true_count, changing no plan
    shape. The +0.5 offset keeps u strictly inside (0,1) so ln never
    sees 0.

    Exactness: counts are exact BIGINTs; u is an exact integer ratio;
    the transform is one closed-form double expression, identical text
    on both engines.

    Scale shape: one broadcast dim join + map-side-combined groupBy to
    the 25-row nation frame; the noise is pure map work."""
    from .datapipe.hashing import hash60

    c = _t(spark, sf_dir, "customer").select("c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    counts = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
    )
    u = (hash60(F.col("n_name"), seed=_DP_SEED) + F.lit(0.5)) / F.lit(_TWO60)
    noise = (
        F.lit(-1.0 / _DP_EPS)
        * F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.ln(F.lit(1.0) - 2.0 * F.abs(u - F.lit(0.5)))
    )
    return counts.select(
        "n_name",
        "true_count",
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
        F.round(F.lit(1.0 / _DP_EPS), 6).alias("laplace_scale"),
    ).orderBy("n_name")


# --------------------------------------------------------------------------
# Code-vs-prose detection (pretraining corpus routing heuristic)
# --------------------------------------------------------------------------

_CODE_THRESHOLD = 0.05  # (2*symbols + digits) per char


def _sql_code_detect() -> str:
    return f"""
WITH scored AS (
  SELECT lang, source,
         round((2.0 * length(regexp_replace(text, '[^{{}}();=<>]', '', 'g'))
                + length(regexp_replace(text, '[^0-9]', '', 'g')))
               / CAST(n_chars AS DOUBLE), 9) AS score
  FROM documents WHERE n_chars > 0
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE score >= {_CODE_THRESHOLD}) AS BIGINT)
         AS flagged_code,
       round((CAST(SUM(CAST(round(score * 1000000.0) AS HUGEINT)) AS DOUBLE)
                / count(*)) / 1000000.0, 9) AS mean_score
FROM scored GROUP BY 1, 2 ORDER BY 1, 2
"""


@register(
    "text_code_detect",
    oracle=_sql_code_detect(),
    tags=("text", "quality", "code-detection", "datapipe"),
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing heuristic per (lang, source): a symbol-
    density score — (2·count of {{}}();=<> + count of digits) / chars —
    with the per-slice flag rate at 0.05 and the micro-quantized mean
    score. The cheap first-pass router a pretraining pipeline runs
    before sending 'code-looking' documents to a code-specific quality
    stack (the Gopher/C4 rules here assume prose; code fails them for
    the wrong reasons). Character counts come from regexp_replace
    deletion (length before minus kept-only), the same primitive both
    engines implement over identical RE2/Java character classes.

    Exactness: counts are exact BIGINTs; the score is a 9-dp-rounded
    integer ratio; the threshold compares the ALREADY-rounded score so
    the decision boundary is bit-identical cross-engine; the mean is
    the catalog's micro-quantized davg.

    Scale shape: pure map work per document (two regex passes over the
    text) into ONE map-side-combined groupBy on the tiny (lang, source)
    grid. No joins, no windows, text never shuffles."""
    d = _t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    sym = F.length(F.regexp_replace(F.col("text"), "[^{}();=<>]", ""))
    dig = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    scored = d.select(
        "lang",
        "source",
        F.round(
            (2.0 * sym + dig) / F.col("n_chars").cast("double"), 9
        ).alias("score"),
    )
    return (
        scored.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("score") >= _CODE_THRESHOLD, 1))
            .cast("bigint")
            .alias("flagged_code"),
            F.round(
                F.sum(F.round(F.col("score") * 1e6).cast("decimal(38,0)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
                / 1e6,
                9,
            ).alias("mean_score"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# Kendall tau-b rank correlation on the daily (revenue, order-count) pairs
# --------------------------------------------------------------------------


def _sql_kendall_tau() -> str:
    return """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS x,
         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
cd AS (
  SELECT
    CAST(count(*) FILTER (WHERE (a.x - b.x) * (a.y - b.y) > 0) AS BIGINT) AS c,
    CAST(count(*) FILTER (WHERE (a.x - b.x) * (a.y - b.y) < 0) AS BIGINT) AS dd
  FROM daily a JOIN daily b ON a.d < b.d
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
tx AS (
  SELECT CAST(coalesce(sum(t * (t - 1) / 2), 0) AS BIGINT) AS n1
  FROM (SELECT count(*) AS t FROM daily GROUP BY x) WHERE t > 1
),
ty AS (
  SELECT CAST(coalesce(sum(t * (t - 1) / 2), 0) AS BIGINT) AS n2
  FROM (SELECT count(*) AS t FROM daily GROUP BY y) WHERE t > 1
)
SELECT n AS n_days, c AS concordant, dd AS discordant,
       round((c - dd)
             / sqrt((n * (n - 1) / 2.0 - n1) * (n * (n - 1) / 2.0 - n2)),
             9) AS tau_b
FROM cd, nn, tx, ty
"""


@register(
    "stats_kendall_tau_daily",
    oracle=_sql_kendall_tau(),
    tags=("stats", "correlation", "kendall"),
)
def stats_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily revenue and daily
    order count — the tie-corrected pair-concordance complement to
    ``stats_spearman_corr`` (tau is the probability statement 'a random
    pair of days orders the same way on both metrics', the more robust
    of the two rank correlations under heavy ties). Concordant and
    discordant counts are exact BIGINTs from sign tests on integer
    differences; the tie corrections n1/n2 are exact integer sums over
    the value-group sizes; tau is one closed-form double over five
    integers — identical on both engines.

    Scale shape: the pair enumeration is a self-join of the DAY-GRAIN
    frame — bounded by the time horizon squared (10 years ≈ 6.7M
    pairs), never the raw table; a broadcast NLJ of the tiny day frame
    is the right plan (the iso_regression_pav precedent). The raw scan
    reduces map-side to one row per day first. Tie groups and the
    grand count stitch in as 1-row broadcasts (the funnel idiom)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount", "l_orderkey"
    )
    daily = (
        li.groupBy(F.date_trunc("day", "l_shipdate").alias("d"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * 100.0
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("x"),
            F.count_distinct(F.col("l_orderkey")).cast("bigint").alias("y"),
        )
        .localCheckpoint(eager=True)  # feeds pairs, ties, and the count
    )
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"), F.col("y").alias("yb"))
    prod = (F.col("xa") - F.col("xb")) * (F.col("ya") - F.col("yb"))
    cd = (
        a.join(F.broadcast(b), F.col("da") < F.col("db"))
        .agg(
            F.count(F.when(prod > 0, 1)).cast("bigint").alias("c"),
            F.count(F.when(prod < 0, 1)).cast("bigint").alias("dd"),
        )
    )
    nn = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tx_ = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(F.sum(F.col("t") * (F.col("t") - 1) / 2), F.lit(0))
            .cast("bigint")
            .alias("n1")
        )
    )
    ty_ = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(F.sum(F.col("t") * (F.col("t") - 1) / 2), F.lit(0))
            .cast("bigint")
            .alias("n2")
        )
    )
    half = F.col("n") * (F.col("n") - 1) / F.lit(2.0)
    return (
        cd.crossJoin(F.broadcast(nn))
        .crossJoin(F.broadcast(tx_))
        .crossJoin(F.broadcast(ty_))
        .select(
            F.col("n").alias("n_days"),
            F.col("c").alias("concordant"),
            F.col("dd").alias("discordant"),
            F.round(
                (F.col("c") - F.col("dd"))
                / F.sqrt((half - F.col("n1")) * (half - F.col("n2"))),
                9,
            ).alias("tau_b"),
        )
    )


# --------------------------------------------------------------------------
# Hampel filter outliers on the daily revenue series (rolling median/MAD)
# --------------------------------------------------------------------------

_HAMPEL_HALF = 3  # centered window of 7 days
_HAMPEL_K = 3.0  # flag beyond 3 scaled MADs
_MAD_C = 1.4826  # normal-consistency constant


def _sql_hampel() -> str:
    # lower median of a sorted integer list: element (n+1)//2, 1-indexed
    return f"""
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
),
win AS (
  SELECT d, x,
         list(x) OVER (ORDER BY d
                       ROWS BETWEEN {_HAMPEL_HALF} PRECEDING
                                AND {_HAMPEL_HALF} FOLLOWING) AS arr
  FROM daily
),
med AS (
  SELECT d, x, len(arr) AS w,
         list_sort(arr)[(len(arr) + 1) // 2] AS med,
         arr
  FROM win
),
mad AS (
  SELECT d, x, w, med,
         list_sort(list_transform(arr, v -> abs(v - med)))[(w + 1) // 2] AS mad
  FROM med
)
SELECT d, x, med, mad,
       round(abs(x - med) / ({_MAD_C} * mad), 9) AS score
FROM mad
WHERE mad > 0 AND abs(x - med) > {_HAMPEL_K} * {_MAD_C} * mad
ORDER BY d
"""


@register(
    "ts_hampel_outliers",
    oracle=_sql_hampel(),
    tags=("timeseries", "outlier", "hampel", "robust"),
)
def ts_hampel_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter over the daily revenue series: a centered 7-day
    rolling window, the window's LOWER median and median absolute
    deviation (both exact order statistics of integer cents — the lower
    median is element (w+1)//2 of the sorted window, so even-sized edge
    windows never average two values and both engines pick the same
    element), and a flag where |x − med| > 3·1.4826·MAD — the robust
    spike detector that, unlike ``stats_grubbs_test``'s global z-score,
    survives level shifts and trend because the reference is local.
    Zero-MAD windows (≥4 equal values) cannot vote and are excluded —
    the standard Hampel degenerate-window contract.

    Exactness: everything up to the final score is integer arithmetic
    on exact cents; the score is one rounded double ratio; the flag
    compares integers (|x−med| vs a double bound on both engines from
    identical text).

    Scale shape: one map-side-combined day groupBy; the rolling window
    runs over the DAY-GRAIN frame (bounded by the horizon — the
    ts_autocorrelation precedent), with O(w log w) per row for the two
    in-window sorts."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("d")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("x")
    )
    w = Window.orderBy("d").rowsBetween(-_HAMPEL_HALF, _HAMPEL_HALF)
    arr = F.collect_list("x").over(w)
    win = daily.select("d", "x", arr.alias("arr"))
    lower_med = lambda a: F.element_at(  # noqa: E731
        F.array_sort(a), ((F.size(a) + 1) / 2).cast("int")
    )
    med = win.select("d", "x", F.size("arr").alias("w"), lower_med(F.col("arr")).alias("med"), "arr")
    dev = F.transform(F.col("arr"), lambda v: F.abs(v - F.col("med")))
    mad = med.select("d", "x", "med", lower_med(dev).alias("mad"))
    return (
        mad.where(
            (F.col("mad") > 0)
            & (F.abs(F.col("x") - F.col("med")) > _HAMPEL_K * _MAD_C * F.col("mad"))
        )
        .select(
            "d",
            "x",
            "med",
            "mad",
            F.round(
                F.abs(F.col("x") - F.col("med")) / (F.lit(_MAD_C) * F.col("mad")), 9
            ).alias("score"),
        )
        .orderBy("d")
    )


# --------------------------------------------------------------------------
# MACD (12/26/9) on the daily revenue series as one literal linear filter
# --------------------------------------------------------------------------

_MACD_L_EMA = 104  # EMA truncation depth (≈ 4x the slow span)
_MACD_L9 = 27  # signal EMA truncation depth (3x its span)
_MACD_LX = _MACD_L_EMA + _MACD_L9 - 1  # = 130, the x-lag depth


def _macd_weights() -> tuple[list[int], list[int]]:
    """Index-mapped INTEGER weight vectors (nano-grid: round(w·1e9)) for
    the window array (oldest-first, 1-indexed, current row last):
    W_MACD[i] pairs with arr[i] so that macd_t = Σ W_MACD[i]·arr[i]/1e9;
    likewise W_SIG for the signal line (the 9-EMA of macd, pre-convolved
    into x-space so ONE window frame serves both). Truncated EMAs are
    re-normalized over their depth, so full-window rows need no adaptive
    divisor.

    Why integers: float weight literals are NOT engine-portable — DuckDB
    parses a 17-digit decimal literal through DECIMAL and lands 1 ulp
    off Python/Spark's strtod on some values, which flipped term
    roundings here. Quantizing the coefficients themselves to the nano
    grid makes every term an exact BIGINT·BIGINT product and the whole
    filter integer arithmetic — bit-identical by construction (the
    operator's spec is then 'MACD with nano-quantized coefficients',
    error ≤1e-9 per unit weight)."""

    def ema_w(span: int, depth: int) -> list[float]:
        a = 2.0 / (span + 1.0)
        w = [a * (1.0 - a) ** j for j in range(depth)]
        s = sum(w)
        return [v / s for v in w]

    w12 = ema_w(12, _MACD_L_EMA)
    w26 = ema_w(26, _MACD_L_EMA)
    wm = [w12[j] - w26[j] for j in range(_MACD_L_EMA)]  # macd lag weights
    w9 = ema_w(9, _MACD_L9)
    conv = [
        sum(
            w9[m] * wm[lag - m]
            for m in range(_MACD_L9)
            if 0 <= lag - m < _MACD_L_EMA
        )
        for lag in range(_MACD_LX)
    ]
    # arr[i] (1-indexed, oldest first, size LX) holds x_{t-(LX-i)}
    w_macd = [
        int(round((wm[_MACD_LX - i] if _MACD_LX - i < _MACD_L_EMA else 0.0) * 1e9))
        for i in range(1, _MACD_LX + 1)
    ]
    w_sig = [int(round(conv[_MACD_LX - i] * 1e9)) for i in range(1, _MACD_LX + 1)]
    return w_macd, w_sig


def _sql_macd() -> str:
    w_macd, w_sig = _macd_weights()
    wm_lit = "CAST([" + ", ".join(str(v) for v in w_macd) + "] AS BIGINT[])"
    ws_lit = "CAST([" + ", ".join(str(v) for v in w_sig) + "] AS BIGINT[])"
    # exact integer convolution (cents × nano-weights), ONE division at
    # the end: /1e9 undoes the weight grid, leaving cents
    qsum = (
        "CAST(list_aggregate(list_transform(range(1, {n} + 1), "
        "i -> CAST(arr[i] AS HUGEINT) * ({w})[i]), 'sum') "
        "AS DOUBLE) / 1000000000.0"
    )
    return f"""
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
),
win AS (
  SELECT d, x,
         list(x) OVER (ORDER BY d
                       ROWS BETWEEN {_MACD_LX - 1} PRECEDING
                                AND CURRENT ROW) AS arr
  FROM daily
),
f AS (
  SELECT d, x,
         {qsum.format(n=_MACD_LX, w=wm_lit)} AS macd,
         {qsum.format(n=_MACD_LX, w=ws_lit)} AS signal
  FROM win WHERE len(arr) = {_MACD_LX}
)
SELECT d, x, round(macd, 6) AS macd_cents,
       round(signal, 6) AS signal_cents,
       round(macd - signal, 6) AS histogram_cents
FROM f ORDER BY d
"""


@register(
    "finance_macd",
    oracle=_sql_macd(),
    tags=("finance", "macd", "timeseries", "ema"),
)
def finance_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD(12, 26, 9) on the daily revenue series, computed as ONE
    literal linear filter: both the macd line (EMA12 − EMA26) and its
    signal line (the 9-EMA of macd) are fixed-coefficient convolutions
    of the raw series once the truncated EMAs are pre-convolved in the
    driver — so a single 130-row window array serves both lines and the
    recursive definition never touches the cluster (the
    ``w_ewma_smoothed`` discipline generalized: any composition of
    truncated EMAs is a literal FIR filter). Warm-up rows (t < 130) are
    excluded — full-window semantics, re-normalized truncated weights.

    Exactness: the filter coefficients are nano-grid INTEGERS rendered
    into both programs, so every term is an exact integer product of
    cents × nano-weights and the convolution is pure (order-free)
    integer arithmetic — no float enters until the single final
    division (see ``_macd_weights`` for why float literals are not
    engine-portable).

    Scale shape: one map-side-combined day groupBy, then one bounded
    window over the day-grain frame with O(130) work per row — pure
    codegen via zip_with/aggregate, no UDF, no recursion."""
    from pyspark.sql import Window

    w_macd, w_sig = _macd_weights()
    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("d")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("x")
    )
    w = Window.orderBy("d").rowsBetween(-(_MACD_LX - 1), 0)
    win = daily.select("d", "x", F.collect_list("x").over(w).alias("arr"))

    def filt(weights: list[int]):
        warr = F.array(*[F.lit(v).cast("decimal(38,0)") for v in weights])
        terms = F.zip_with(F.col("arr"), warr, lambda v, wt: v * wt)
        return (
            F.aggregate(
                terms,
                F.lit(0).cast("decimal(38,0)"),
                lambda acc, t: acc + t,
            ).cast("double")
            / 1e9
        )

    f = win.where(F.size("arr") == _MACD_LX).select(
        "d", "x", filt(w_macd).alias("macd"), filt(w_sig).alias("signal")
    )
    return f.select(
        "d",
        "x",
        F.round("macd", 6).alias("macd_cents"),
        F.round("signal", 6).alias("signal_cents"),
        F.round(F.col("macd") - F.col("signal"), 6).alias("histogram_cents"),
    ).orderBy("d")


# --------------------------------------------------------------------------
# Hive-partitioned write + partition-pruned read (the at-rest layout op)
# --------------------------------------------------------------------------

_PRUNE_LO, _PRUNE_HI = "2024-01-10", "2024-01-16"


def _sql_partition_pruning() -> str:
    davg_v = SQL_DAVG.format(x="value")
    return f"""
SELECT strftime(ts, '%Y-%m-%d') AS event_day, event_type,
       CAST(count(*) AS BIGINT) AS n,
       {davg_v} AS avg_value
FROM events
WHERE strftime(ts, '%Y-%m-%d') BETWEEN '{_PRUNE_LO}' AND '{_PRUNE_HI}'
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _scratch_r7(sf_dir: str, tag: str) -> str:
    import hashlib

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/mda_r7_{tag}_{h}"


@register(
    "source_partition_pruning",
    oracle=_sql_partition_pruning(),
    tags=("source", "layout", "partitioning", "scale"),
)
def source_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned at-rest layout, end to end: write the events
    projection PARTITIONED BY day (``partitionBy`` → one directory per
    day), re-read, and aggregate a one-week slice — the layout decision
    that turns a 100 TB scan into a 23 TB-skipped one: the day filter
    prunes at PLANNING time (``PartitionFilters`` on the scan — whole
    directories never open, vs ``stats_zone_map_pruning``'s row-group
    min/max skipping which still lists every file). The write half is
    part of the entry by design, like ``source_orc_roundtrip``: a
    layout claim without the sink is half a claim. The plan property is
    pinned by ``test_partition_pruning_reaches_scan``.

    Exactness: the oracle replays the same day-string derivation and
    filter from the original parquet; counts are exact BIGINTs, the
    mean is the catalog's micro-quantized davg.

    Scale shape: the write shuffles once on the partition column (a
    day-grain repartition keeps one file per day instead of
    tasks×days small files); the read scans ONLY the 7 matching
    directories; the aggregate is map-side combined on the pruned
    slice."""
    path = _scratch_r7(sf_dir, "part")
    ev = _t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        "event_type",
        "value",
    )
    # one file per partition directory, not tasks × days
    ev.repartition("event_day").write.mode("overwrite").partitionBy(
        "event_day"
    ).parquet(path)
    back = spark.read.parquet(path)
    # partition-column type inference reads event_day back as DATE; the
    # filter stays on the raw partition column (so it prunes at planning
    # time), and only the OUTPUT re-derives the string form
    return (
        back.where(
            F.col("event_day").between(
                F.lit(_PRUNE_LO).cast("date"), F.lit(_PRUNE_HI).cast("date")
            )
        )
        .groupBy(F.date_format("event_day", "yyyy-MM-dd").alias("event_day"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            davg("value").alias("avg_value"),
        )
        .orderBy("event_day", "event_type")
    )


# --------------------------------------------------------------------------
# SAX symbolization of the daily PAA series (alphabet size 4)
# --------------------------------------------------------------------------

# N(0,1) quartile breakpoints for a 4-letter alphabet (the SAX table)
_SAX_B = "0.6744897501960817"


def _sql_sax() -> str:
    davg_x = SQL_DAVG.format(x="value")
    davg_p = SQL_DAVG.format(x="p")
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, {davg_x} AS x
  FROM events GROUP BY 1
),
paa AS (
  SELECT date_trunc('day', h) AS seg, {SQL_DAVG.format(x='x')} AS p
  FROM hourly GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         {davg_p} AS mu,
         (CAST(SUM(CAST(round(p * p * 1000000.0) AS HUGEINT)) AS DOUBLE)
            / count(*)) / 1000000.0 AS m2
  FROM paa
),
z AS (
  SELECT seg, p, mu, sqrt(m2 - mu * mu) AS sd
  FROM paa, m
)
SELECT seg, round(p, 9) AS paa,
       round((p - mu) / sd, 9) AS z,
       CASE WHEN (p - mu) / sd < -{_SAX_B} THEN 'a'
            WHEN (p - mu) / sd < 0.0 THEN 'b'
            WHEN (p - mu) / sd < {_SAX_B} THEN 'c'
            ELSE 'd' END AS symbol
FROM z ORDER BY seg
"""


@register(
    "ts_sax_symbols",
    oracle=_sql_sax(),
    tags=("timeseries", "sax", "symbolic", "datamining"),
)
def ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin/Keogh) of the engagement series: hourly
    mean values → day-grain PAA (piecewise aggregate approximation —
    the segment boundary is the calendar day, so no global index is
    needed) → z-normalize against the PAA moments → map to a 4-letter
    alphabet at the N(0,1) quartile breakpoints (±0.6745, 0). The
    symbolic form is what motif discovery, series indexing, and
    anomaly grammars consume — 30 points of 2-bit resolution standing
    in for 43k raw events at sf0.01.

    Exactness: PAA values are the catalog's micro-quantized davg; the
    moment pair (mu, E[p²]) comes from micro-quantized integer sums, so
    sd and every z are identical double expressions; symbols compare
    the same doubles against the same shared breakpoint literal.

    Scale shape: two map-side-combined groupBys (hour, then day), a
    1-row moment broadcast (scalar idiom), pure map assignment. The
    series frames are horizon-bounded."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        davg("value").alias("x")
    )
    paa = hourly.groupBy(F.date_trunc("day", "h").alias("seg")).agg(
        davg("x").alias("p")
    )
    m = paa.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        davg("p").alias("mu"),
        (
            F.sum(F.round(F.col("p") * F.col("p") * 1e6).cast("decimal(38,0)")).cast(
                "double"
            )
            / F.count(F.lit(1))
            / 1e6
        ).alias("m2"),
    )
    b = float(_SAX_B)
    z = paa.crossJoin(F.broadcast(m)).select(
        "seg",
        "p",
        "mu",
        F.sqrt(F.col("m2") - F.col("mu") * F.col("mu")).alias("sd"),
    )
    zz = (F.col("p") - F.col("mu")) / F.col("sd")
    return z.select(
        "seg",
        F.round("p", 9).alias("paa"),
        F.round(zz, 9).alias("z"),
        F.when(zz < -b, "a")
        .when(zz < 0.0, "b")
        .when(zz < b, "c")
        .otherwise("d")
        .alias("symbol"),
    ).orderBy("seg")


# --------------------------------------------------------------------------
# Second-order Markov transitions over per-user event sequences
# --------------------------------------------------------------------------


@register(
    "events_markov2_transitions",
    oracle="""
WITH seq AS (
  SELECT event_type AS s1,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS s2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS dst
  FROM events
),
cnt AS (
  SELECT s1, s2, dst, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2, 3
),
ctx AS (SELECT s1, s2, CAST(sum(n) AS BIGINT) AS ctx_n FROM cnt GROUP BY 1, 2)
SELECT c.s1, c.s2, c.dst, c.n,
       round(CAST(c.n AS DOUBLE) / x.ctx_n, 6) AS p
FROM cnt c JOIN ctx x USING (s1, s2)
ORDER BY s1, s2, dst
""",
    tags=("markov", "sequence", "window"),
)
def events_markov2_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order Markov transition tensor over per-user event
    sequences: P(next | the two preceding events) — the memory-2
    refinement of ``events_markov_transitions`` that captures patterns
    the first-order chain aliases (view→click→purchase vs
    click→view→purchase have the same first-order edges but different
    conversion odds). Two leads over ONE window spec pair each event
    with its two successors; context-normalized probabilities come from
    the states²-row context totals joined back broadcast. The tensor is
    states³ rows — model-sized — while the only event-cardinality work
    is the single per-user window pass (same shuffle as first order:
    the lag/lead family reuses one sort)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("s1"),
            F.lead("event_type", 1).over(w).alias("s2"),
            F.lead("event_type", 2).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    cnt = seq.groupBy("s1", "s2", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    ctx = cnt.groupBy("s1", "s2").agg(F.sum("n").cast("bigint").alias("ctx_n"))
    return (
        cnt.join(F.broadcast(ctx), ["s1", "s2"])
        .select(
            "s1",
            "s2",
            "dst",
            "n",
            F.round(F.col("n").cast("double") / F.col("ctx_n"), 6).alias("p"),
        )
        .orderBy("s1", "s2", "dst")
    )


# --------------------------------------------------------------------------
# Theil inequality indices over positive customer balances
# --------------------------------------------------------------------------


def _sql_theil() -> str:
    return """
WITH x AS (
  SELECT CAST(round(c_acctbal * 100.0) AS BIGINT) AS v
  FROM customer WHERE c_acctbal > 0
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) / count(*) AS mu
  FROM x
),
t AS (
  SELECT max(m.n) AS n, max(m.mu) AS mu,
         CAST(sum(CAST(round((v / m.mu) * ln(v / m.mu) * 1e9) AS BIGINT))
              AS BIGINT) AS st,
         CAST(sum(CAST(round(ln(m.mu / v) * 1e9) AS BIGINT)) AS BIGINT) AS sl
  FROM x CROSS JOIN m
)
SELECT n, round(mu, 6) AS mean_cents,
       round(CAST(st AS DOUBLE) / 1e9 / n, 9) AS theil_t,
       round(CAST(sl AS DOUBLE) / 1e9 / n, 9) AS theil_l
FROM t
"""


@register(
    "stats_theil_index",
    oracle=_sql_theil(),
    tags=("stats", "inequality", "theil"),
)
def stats_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil inequality indices over positive customer balances: T =
    (1/n)Σ(x/μ)ln(x/μ) (top-sensitive) and L = (1/n)Σln(μ/x) (the mean
    log deviation, bottom-sensitive) — the additively DECOMPOSABLE
    inequality family (unlike ``stats_gini_lorenz``'s Gini, Theil
    splits exactly into within-group + between-group terms, which is
    why concentration audits prefer it). Non-positive balances are
    outside the index's domain (ln) and excluded — the standard
    contract, stated rather than silently absorbed.

    Exactness: μ is an exact DECIMAL-sum ratio broadcast as the 1-row
    scalar; each log term quantizes to a nano-grid integer before the
    order-free sum; the indices are closed-form doubles over those
    integers — identical text both engines.

    Scale shape: one scan to the cents projection, a 1-row moment
    broadcast, one map-side-combined reduce. Nothing keyed, nothing
    windowed."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    x = c.select(F.round(F.col("c_acctbal") * 100.0).cast("bigint").alias("v"))
    m = x.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum(F.col("v").cast("decimal(38,0)")).cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    r = F.col("v") / F.col("mu")
    t = x.crossJoin(F.broadcast(m)).agg(
        F.max("n").alias("n"),
        F.max("mu").alias("mu"),
        F.sum(F.round(r * F.ln(r) * 1e9).cast("bigint")).cast("bigint").alias("st"),
        # mu/v directly (NOT 1/r): two divisions land differently in ulp
        F.sum(F.round(F.ln(F.col("mu") / F.col("v")) * 1e9).cast("bigint"))
        .cast("bigint")
        .alias("sl"),
    )
    return t.select(
        "n",
        F.round("mu", 6).alias("mean_cents"),
        F.round(F.col("st").cast("double") / 1e9 / F.col("n"), 9).alias("theil_t"),
        F.round(F.col("sl").cast("double") / 1e9 / F.col("n"), 9).alias("theil_l"),
    )


# --------------------------------------------------------------------------
# Neyman-allocation stratified sampling (optimal allocation by stratum σ)
# --------------------------------------------------------------------------

_NEYMAN_BUDGET = 100
_NEYMAN_SEED = 31


def _sql_neyman() -> str:
    from .datapipe.hashing import sql_hash60

    h = sql_hash60("doc_id::VARCHAR", seed=_NEYMAN_SEED)
    return f"""
WITH s AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_h,
         CASE WHEN count(*) < 2 THEN 0.0 ELSE
         sqrt((CAST(sum(CAST(n_chars AS HUGEINT) * n_chars) AS DOUBLE)
               - count(*) * (CAST(sum(CAST(n_chars AS HUGEINT)) AS DOUBLE)
                             / count(*))
                          * (CAST(sum(CAST(n_chars AS HUGEINT)) AS DOUBLE)
                             / count(*)))
              / (count(*) - 1)) END AS sigma_h
  FROM documents GROUP BY 1
),
w AS (SELECT CAST(sum(n_h * sigma_h) AS DOUBLE) AS wt FROM s),
alloc AS (
  SELECT lang, n_h, sigma_h,
         CAST(round({_NEYMAN_BUDGET} * (n_h * sigma_h) / wt) AS BIGINT)
           AS alloc_h
  FROM s CROSS JOIN w
),
ranked AS (
  SELECT d.doc_id, d.lang,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY {h}, d.doc_id) AS r
  FROM documents d
)
SELECT ranked.doc_id, ranked.lang, a.n_h,
       round(a.sigma_h, 6) AS sigma_h, a.alloc_h
FROM ranked JOIN alloc a USING (lang)
WHERE ranked.r <= a.alloc_h
ORDER BY ranked.lang, ranked.doc_id
"""


@register(
    "sample_stratified_neyman",
    oracle=_sql_neyman(),
    tags=("sampling", "stratified", "neyman", "datapipe"),
)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sample of the document corpus:
    the 100-doc budget splits across language strata PROPORTIONAL TO
    N_h·σ_h (σ of n_chars per stratum) — the variance-optimal
    allocation for estimating a corpus mean, vs
    ``sample_stratified_lang``'s proportional allocation (which
    over-samples homogeneous strata). Selection within a stratum is
    the catalog's RNG-free gate: rank by seeded md5 of doc_id, take
    the first alloc_h — deterministic, reproducible, and exactly-k per
    stratum. Rounded allocations may sum to budget±(strata/2) — the
    standard largest-remainder caveat, left unadjusted for parity.

    Exactness: stratum moments from exact DECIMAL integer sums; the
    allocation rounds the same double on both engines; ranks order by
    exact 60-bit integers with a doc_id tiebreak.

    Scale shape: one map-side-combined stratum groupBy (strata-sized
    frame), the 1-row allocation-denominator broadcast, and ONE
    per-stratum rank window (partitioned — no global sort; a stratum's
    rank stream is a top-alloc_h selection at 100 TB, swappable for a
    per-group TakeOrdered when strata skew)."""
    from pyspark.sql import Window

    from .datapipe.hashing import hash60

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    nd = F.col("n_chars").cast("decimal(38,0)")
    # singleton-stratum guard (ADVICE r8): count-1 == 0 would make the
    # sample variance NULL in Spark but inf/raise in DuckDB; both
    # engines pin sigma_h = 0 for n_h < 2 (the stratum then draws a
    # zero Neyman allocation, the natural reading: no measurable
    # within-stratum variance).
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.when(F.count(F.lit(1)) < 2, F.lit(0.0))
        .otherwise(
            F.sqrt(
                (
                    F.sum(nd * F.col("n_chars")).cast("double")
                    - F.count(F.lit(1))
                    * (F.sum(nd).cast("double") / F.count(F.lit(1)))
                    * (F.sum(nd).cast("double") / F.count(F.lit(1)))
                )
                / (F.count(F.lit(1)) - 1)
            )
        )
        .alias("sigma_h"),
    )
    w = s.agg(F.sum(F.col("n_h") * F.col("sigma_h")).cast("double").alias("wt"))
    alloc = s.crossJoin(F.broadcast(w)).select(
        "lang",
        "n_h",
        "sigma_h",
        F.round(F.lit(_NEYMAN_BUDGET) * (F.col("n_h") * F.col("sigma_h")) / F.col("wt"))
        .cast("bigint")
        .alias("alloc_h"),
    )
    wr = Window.partitionBy("lang").orderBy(
        hash60(F.col("doc_id").cast("string"), seed=_NEYMAN_SEED), "doc_id"
    )
    ranked = d.select("doc_id", "lang", F.row_number().over(wr).alias("r"))
    return (
        ranked.join(F.broadcast(alloc), "lang")
        .where(F.col("r") <= F.col("alloc_h"))
        .select(
            "doc_id",
            "lang",
            "n_h",
            F.round("sigma_h", 6).alias("sigma_h"),
            "alloc_h",
        )
        .orderBy("lang", "doc_id")
    )


# --------------------------------------------------------------------------
# Cochran-Armitage trend test: purchase rate across ordered dayparts
# --------------------------------------------------------------------------


def _sql_cochran_armitage() -> str:
    phi = _PHI.format(z="abs(z)")
    return f"""
WITH g AS (
  SELECT (hour(ts) // 6) + 1 AS s,
         CAST(count(*) AS BIGINT) AS n_i,
         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS r_i
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(sum(n_i) AS BIGINT) AS n, CAST(sum(r_i) AS BIGINT) AS r,
         CAST(sum(s * r_i) AS BIGINT) AS sr,
         CAST(sum(s * n_i) AS BIGINT) AS sn,
         CAST(sum(s * s * n_i) AS BIGINT) AS ssn
  FROM g
),
z AS (
  SELECT n, r,
         (sr - CAST(r AS DOUBLE) * sn / n)
           / sqrt((CAST(r AS DOUBLE) / n) * (1.0 - CAST(r AS DOUBLE) / n)
                  * (ssn - CAST(sn AS DOUBLE) * sn / n)) AS z
  FROM m
)
SELECT n, r, round(z, 9) AS z_stat,
       round(2.0 * (1.0 - ({phi})), 6) AS p_value
FROM z
"""


@register(
    "stats_cochran_armitage",
    oracle=_sql_cochran_armitage(),
    tags=("stats", "trend", "categorical"),
)
def stats_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test for purchase rate across the four
    ORDERED dayparts (night/morning/afternoon/evening, scores 1..4):
    does conversion rise monotonically through the day, as a trend —
    one degree of freedom — rather than the unordered heterogeneity
    ``stats_chi2_lang_source`` tests? T = Σs·r − R·Σs·n/N normalized by
    the score-weighted binomial variance; two-sided p via the shared
    Bowling Φ.

    Exactness: all five sufficient statistics are exact BIGINT sums
    over the 4-row daypart frame; z and p are closed-form doubles over
    those integers, identical text both engines.

    Scale shape: ONE map-side-combined groupBy to 4 rows, then a 1-row
    reduce. No joins, no windows."""
    ev = _t(spark, sf_dir, "events").select("ts", "event_type")
    g = ev.groupBy(((F.hour("ts") / 6).cast("int") + 1).alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("bigint")
        .alias("r_i"),
    )
    m = g.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("r_i").cast("bigint").alias("r"),
        F.sum(F.col("s") * F.col("r_i")).cast("bigint").alias("sr"),
        F.sum(F.col("s") * F.col("n_i")).cast("bigint").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n_i")).cast("bigint").alias("ssn"),
    )
    rn = F.col("r").cast("double") / F.col("n")
    z = (F.col("sr") - F.col("r").cast("double") * F.col("sn") / F.col("n")) / F.sqrt(
        rn * (F.lit(1.0) - rn)
        * (F.col("ssn") - F.col("sn").cast("double") * F.col("sn") / F.col("n"))
    )
    az = F.abs(z)
    phi = 1.0 / (1.0 + F.exp(F.lit(-1.5976) * az - F.lit(0.07056) * az * az * az))
    return m.select(
        "n",
        "r",
        F.round(z, 9).alias("z_stat"),
        F.round(2.0 * (F.lit(1.0) - phi), 6).alias("p_value"),
    )


# --------------------------------------------------------------------------
# Embedding norm histogram (the vector-quality audit before ANN indexing)
# --------------------------------------------------------------------------

_NORM_BINS = 10


def _sql_norm_hist() -> str:
    return f"""
WITH n AS (
  SELECT vec_id,
         sqrt(list_aggregate(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
  FROM embeddings
),
b AS (
  SELECT CAST(least(floor(nrm / 0.5), {_NORM_BINS - 1}) AS BIGINT) AS bin,
         nrm
  FROM n
)
SELECT bin,
       round(bin * 0.5, 1) AS lo,
       round((bin + 1) * 0.5, 1) AS hi,
       CAST(count(*) AS BIGINT) AS n_vecs,
       round(min(nrm), 9) AS min_norm,
       round(max(nrm), 9) AS max_norm
FROM b GROUP BY bin ORDER BY bin
"""


@register(
    "embeddings_norm_histogram",
    oracle=_sql_norm_hist(),
    tags=("embeddings", "quality", "histogram", "datapipe"),
)
def embeddings_norm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-norm histogram of the embedding corpus (0.5-wide bins, last
    bin open) — the vector-quality audit run before ANN indexing:
    un-normalized embeddings break cosine≈dot shortcuts, near-zero
    norms flag dead encoder outputs, and a bimodal histogram flags a
    mixed-encoder corpus. The norm is a JVM-side array fold
    (transform + aggregate — no UDF, no explode: the row count stays
    the vector count, not vectors × dims).

    Exactness: float32 components widen to double BEFORE squaring on
    both engines; the fold order is index order on both (Spark
    aggregate, DuckDB list_aggregate), so the sum is the same double;
    bin ids are integer floors of identical doubles.

    Scale shape: pure map work into a map-side-combined groupBy on a
    10-row bin domain."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = emb.select(F.sqrt(sq).alias("nrm"))
    b = n.select(
        F.least(F.floor(F.col("nrm") / 0.5), F.lit(_NORM_BINS - 1))
        .cast("bigint")
        .alias("bin"),
        "nrm",
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.round(F.min("nrm"), 9).alias("min_norm"),
            F.round(F.max("nrm"), 9).alias("max_norm"),
        )
        .select(
            "bin",
            F.round(F.col("bin") * 0.5, 1).alias("lo"),
            F.round((F.col("bin") + 1) * 0.5, 1).alias("hi"),
            "n_vecs",
            "min_norm",
            "max_norm",
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Lincoln-Petersen capture-recapture population estimate
# --------------------------------------------------------------------------

_CR_SPLIT = "2024-01-16"  # capture window: before; recapture: on/after


def _sql_capture_recapture() -> str:
    return f"""
WITH cap AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts < TIMESTAMP '{_CR_SPLIT} 00:00:00'
),
recap AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '{_CR_SPLIT} 00:00:00'
),
s AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM cap) AS n1,
         (SELECT CAST(count(*) AS BIGINT) FROM recap) AS n2,
         (SELECT CAST(count(*) AS BIGINT)
          FROM cap JOIN recap USING (user_id)) AS m
)
SELECT n1, n2, m,
       round((CAST(n1 + 1 AS DOUBLE) * (n2 + 1)) / (m + 1) - 1.0, 6)
         AS n_hat_chapman,
       round(CAST(n1 AS DOUBLE) * n2 / m, 6) AS n_hat_lp
FROM s
"""


@register(
    "stats_capture_recapture",
    oracle=_sql_capture_recapture(),
    tags=("stats", "estimation", "capture-recapture"),
)
def stats_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln-Petersen / Chapman capture-recapture estimate of the
    total user population from two observation windows (first vs
    second half-month): users 'captured' early, 'recaptured' late, and
    the overlap m gives N̂ = n1·n2/m (Chapman's +1 form is the
    bias-corrected standard) — the ecology estimator product teams
    reuse to size an audience only partially observed in any window
    (and dedup teams reuse to size a corpus from two crawls). The
    same structure as ``sketch_kmv_intersection``'s estimate, but
    exact: distinct sets intersect via one equi-join on user_id.

    Exactness: all three counts are exact BIGINTs; the estimators are
    closed-form doubles over them.

    Scale shape: two map-side-combined distincts partitioned on
    user_id and one equi-join on the same key — co-partitioned, no
    broadcast needed at any scale; the funnel stitch is three 1-row
    aggregates (the scalar idiom)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    split = F.lit(f"{_CR_SPLIT} 00:00:00").cast("timestamp")
    cap = ev.where(F.col("ts") < split).select("user_id").distinct()
    recap = ev.where(F.col("ts") >= split).select("user_id").distinct()
    n1 = cap.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    n2 = recap.agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    m = cap.join(recap, "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .select(
            "n1",
            "n2",
            "m",
            F.round(
                ((F.col("n1") + 1).cast("double") * (F.col("n2") + 1))
                / (F.col("m") + 1)
                - 1.0,
                6,
            ).alias("n_hat_chapman"),
            F.round(
                F.col("n1").cast("double") * F.col("n2") / F.col("m"), 6
            ).alias("n_hat_lp"),
        )
    )


# --------------------------------------------------------------------------
# Monotonic-id completeness audit (gaps / duplicates in event_id)
# --------------------------------------------------------------------------


@register(
    "dq_id_completeness",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
       CAST(min(event_id) AS BIGINT) AS id_min,
       CAST(max(event_id) AS BIGINT) AS id_max,
       CAST(max(event_id) - min(event_id) + 1 - count(DISTINCT event_id)
            AS BIGINT) AS n_missing,
       CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS n_dup_rows,
       round(count(DISTINCT event_id)
             / CAST(max(event_id) - min(event_id) + 1 AS DOUBLE), 9)
         AS density
FROM events
""",
    tags=("dq", "completeness", "audit"),
)
def dq_id_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-id completeness audit of the event stream: row count
    vs distinct ids (duplicate detection), the id range vs distinct
    count (GAP detection — a CDC/ingest pipeline that dropped a batch
    leaves missing ids), and the resulting density — the first check a
    data-quality suite runs on any sequence-keyed feed, complementing
    ``dq_freshness_lag``'s time axis with the key axis.

    Exactness: every cell is exact BIGINT arithmetic over one
    aggregate; density is one rounded integer ratio.

    Scale shape: ONE aggregation with a count-distinct (Spark expands
    it to a two-stage partial/final plan automatically — map-side
    distinct per partition, then merge); no joins, no windows."""
    return _t(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct(F.col("event_id")).cast("bigint").alias("n_distinct"),
        F.min("event_id").cast("bigint").alias("id_min"),
        F.max("event_id").cast("bigint").alias("id_max"),
        (
            F.max("event_id")
            - F.min("event_id")
            + 1
            - F.count_distinct(F.col("event_id"))
        )
        .cast("bigint")
        .alias("n_missing"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("event_id")))
        .cast("bigint")
        .alias("n_dup_rows"),
        F.round(
            F.count_distinct(F.col("event_id"))
            / (F.max("event_id") - F.min("event_id") + 1).cast("double"),
            9,
        ).alias("density"),
    )


# --------------------------------------------------------------------------
# Geometric and harmonic means per event type (the rate-correct means)
# --------------------------------------------------------------------------


def _sql_gh_means() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(exp(CAST(sum(CAST(round(ln(value) * 1e9) AS HUGEINT)) AS DOUBLE)
                 / 1e9 / count(*)), 9) AS geometric_mean,
       round(count(*)
             / (CAST(sum(CAST(round((1.0 / value) * 1e9) AS HUGEINT))
                     AS DOUBLE) / 1e9), 9) AS harmonic_mean
FROM events WHERE value > 0
GROUP BY 1 ORDER BY 1
"""


@register(
    "agg_geometric_harmonic_means",
    oracle=_sql_gh_means(),
    tags=("aggregation", "stats", "means"),
)
def agg_geometric_harmonic_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric and harmonic means of event value per type — the means
    that are CORRECT for multiplicative quantities (growth factors,
    ratios: geometric) and for rates (throughputs, speeds: harmonic),
    where the arithmetic mean the rest of the catalog reports
    overstates both. Non-positive values are outside both domains and
    excluded — stated, not absorbed.

    Exactness: each ln / reciprocal term quantizes to a nano-grid
    integer before the order-free sum (the catalog discipline for
    non-associative float reductions); exp of identical doubles closes
    the geometric mean.

    Scale shape: ONE map-side-combined groupBy over the type domain.
    Nothing else."""
    ev = _t(spark, sf_dir, "events").where(F.col("value") > 0)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.exp(
                    F.sum(F.round(F.ln("value") * 1e9).cast("decimal(38,0)")).cast(
                        "double"
                    )
                    / 1e9
                    / F.count(F.lit(1))
                ),
                9,
            ).alias("geometric_mean"),
            F.round(
                F.count(F.lit(1))
                / (
                    F.sum(
                        F.round((F.lit(1.0) / F.col("value")) * 1e9).cast(
                            "decimal(38,0)"
                        )
                    ).cast("double")
                    / 1e9
                ),
                9,
            ).alias("harmonic_mean"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Pairwise-cosine distribution audit on a hash-gated sample
# --------------------------------------------------------------------------

_COS_SAMPLE_N = 400  # FIXED panel size (volume-invariant by construction)
_COS_SEED = 37
_COS_BINS = 20  # width-0.1 bins over [-1, 1]


def _sql_cosine_hist() -> str:
    from .datapipe.hashing import sql_hash60

    h = sql_hash60("vec_id::VARCHAR", seed=_COS_SEED)
    return f"""
WITH ranked AS (
  SELECT vec_id, embedding,
         row_number() OVER (ORDER BY {h}, vec_id) AS r
  FROM embeddings
),
s AS (
  SELECT vec_id, embedding FROM ranked WHERE r <= {_COS_SAMPLE_N}
),
n AS (
  SELECT vec_id, embedding,
         sqrt(list_aggregate(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
  FROM s
),
p AS (
  SELECT list_aggregate(list_transform(range(1, len(a.embedding) + 1),
           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)),
           'sum') / (a.nrm * b.nrm) AS cosv
  FROM n a JOIN n b ON a.vec_id < b.vec_id
),
b AS (
  SELECT CAST(least(floor((cosv + 1.0) / 0.1), {_COS_BINS - 1}) AS BIGINT)
           AS bin
  FROM p
)
SELECT bin,
       round(bin * 0.1 - 1.0, 1) AS lo,
       round((bin + 1) * 0.1 - 1.0, 1) AS hi,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM b GROUP BY bin ORDER BY bin
"""


@register(
    "similarity_cosine_hist_sample",
    oracle=_sql_cosine_hist(),
    tags=("similarity", "audit", "histogram", "sample"),
)
def similarity_cosine_hist_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine distribution over a FIXED 400-vector panel (the
    corpus's smallest seeded-md5 hashes — a deterministic uniform
    sample whose SIZE does not grow with the corpus), width-0.1 bins —
    the threshold-calibration audit run BEFORE committing an
    LSH/near-dup cutoff: the histogram shows where the random-pair
    mass sits (near 0 for healthy encoders) and whether a near-dup
    mode exists above the intended threshold. Exact all-pairs on a
    bounded sample IS the operator (the dedup_ngram_jaccard_sample /
    dedup_lsh_recall_eval precedent); the corpus-sized path is the
    banded LSH family this audit parameterizes. (The first cut used a
    hash%5 RATE gate — that keeps a fraction, not a size, and the
    pair count grew 100× at 10× data; the fixed panel is
    volume-invariant by construction.)

    Exactness: the panel is the smallest-(hash, vec_id) prefix — a
    total order both engines rank identically; dot products fold in
    index order with float32→double widening; bin ids are integer
    floors of identical doubles.

    Scale shape: panel selection is a TakeOrdered(400) (map-side
    partial top-k, no global sort in Spark; the oracle's window is
    the semantic spec); the pair join is 400², constant forever; the
    histogram combine is map-side over a 20-bin domain."""
    from .datapipe.hashing import hash60

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    s = emb.orderBy(
        hash60(F.col("vec_id").cast("string"), seed=_COS_SEED), "vec_id"
    ).limit(_COS_SAMPLE_N)
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = s.select("vec_id", "embedding", F.sqrt(sq).alias("nrm")).localCheckpoint(
        eager=True
    )
    a = n.select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("ea"), F.col("nrm").alias("na")
    )
    b = n.select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(F.broadcast(b), F.col("ida") < F.col("idb")).select(
        (dot / (F.col("na") * F.col("nb"))).alias("cosv")
    )
    return (
        pairs.select(
            F.least(F.floor((F.col("cosv") + 1.0) / 0.1), F.lit(_COS_BINS - 1))
            .cast("bigint")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            "bin",
            F.round(F.col("bin") * 0.1 - 1.0, 1).alias("lo"),
            F.round((F.col("bin") + 1) * 0.1 - 1.0, 1).alias("hi"),
            "n_pairs",
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Pettitt rank-based changepoint test on the daily revenue series
# --------------------------------------------------------------------------


def _sql_pettitt() -> str:
    return """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
mr AS (
  SELECT d,
         CAST(2 * rank() OVER (ORDER BY x)
              + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS mr2
  FROM daily
),
u AS (
  SELECT d,
         CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
         CAST(sum(mr2) OVER (ORDER BY d
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT) AS s2
  FROM mr
),
ut AS (
  SELECT d, t * (n + 1) - s2 AS u_t
  FROM u CROSS JOIN nn WHERE t < n
),
best AS (
  SELECT d, u_t FROM ut ORDER BY abs(u_t) DESC, d LIMIT 1
)
SELECT best.d AS changepoint_day, best.u_t AS u_stat, nn.n AS n_days,
       round(2.0 * exp(-6.0 * u_t * u_t
                       / (CAST(n AS DOUBLE) * n * n + n * n)), 6)
         AS p_value
FROM best, nn
"""


@register(
    "ts_pettitt_changepoint",
    oracle=_sql_pettitt(),
    tags=("timeseries", "changepoint", "nonparametric"),
)
def ts_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank-based changepoint test on the daily revenue series:
    U_t = Σ_{i≤t} Σ_{j>t} sign(x_j − x_i), the split day maximizing
    |U_t|, and the standard approximate p-value 2·exp(−6U²/(n³+n²)) —
    the NONPARAMETRIC complement to ``events_changepoint_cusum`` (rank
    signs, so a single spike can't drag the break the way a mean-shift
    CUSUM can). The pairwise definition is NOT enumerated: by the
    antisymmetry of sign over the prefix, U_t = t(n+1) − 2·S_t where
    S_t is the running sum of MIDRANKS (property-verified against the
    O(n³) definition under heavy ties) — doubled midranks keep every
    quantity an exact BIGINT, and the whole statistic reduces to two
    rank windows plus one running sum over the day-grain frame
    (O(n log n); the first cut of this entry enumerated the triple
    join and took 256 s at sf0.01 — the identity makes it ~2 s).

    Exactness: mr2 = 2·rank + tie_count − 1 and U_t are exact BIGINTs;
    the argmax orders on (|U| desc, day); p is one closed-form double.

    Scale shape: day-grain only after one map-side-combined groupBy;
    the rank/running-sum windows run over the horizon-bounded day
    frame (the ts_autocorrelation precedent)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    daily = (
        li.groupBy(F.date_trunc("day", "l_shipdate").alias("d"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("x")
        )
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    nn = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    mr = daily.select(
        "d",
        (
            2 * F.rank().over(Window.orderBy("x"))
            + F.count(F.lit(1)).over(Window.partitionBy("x"))
            - 1
        )
        .cast("bigint")
        .alias("mr2"),
    )
    wd = Window.orderBy("d")
    u = mr.select(
        "d",
        F.row_number().over(wd).cast("bigint").alias("t"),
        F.sum("mr2")
        .over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("s2"),
    )
    ut = (
        u.crossJoin(F.broadcast(nn))
        .where(F.col("t") < F.col("n"))
        .select("d", "n", (F.col("t") * (F.col("n") + 1) - F.col("s2")).alias("u_t"))
    )
    best = ut.orderBy(F.desc(F.abs(F.col("u_t"))), "d").limit(1)
    nd = F.col("n").cast("double")
    return best.select(
        F.col("d").alias("changepoint_day"),
        F.col("u_t").alias("u_stat"),
        F.col("n").alias("n_days"),
        F.round(
            2.0
            * F.exp(
                F.lit(-6.0) * F.col("u_t") * F.col("u_t") / (nd * nd * nd + nd * nd)
            ),
            6,
        ).alias("p_value"),
    )


# --------------------------------------------------------------------------
# Heaps' law fit: vocabulary growth V = k·N^beta over corpus prefixes
# --------------------------------------------------------------------------

_HEAPS_POINTS = 10


def _sql_heaps() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH {sql_cuts_ctes("documents", "doc_id", _HEAPS_POINTS)},
cl AS (SELECT coalesce(list(c ORDER BY b), []) AS cs FROM cuts),
dtok AS (
  SELECT doc_id, unnest({toks}) AS tok FROM documents
),
doc_b AS (
  SELECT 1 + len(list_filter(cl.cs, x -> doc_id > x)) AS bucket,
         CAST(len({toks}) AS BIGINT) AS n_toks
  FROM documents, cl
),
ncum AS (
  SELECT cp, CAST(sum(n_toks) AS BIGINT) AS n_tokens
  FROM doc_b, unnest(generate_series(doc_b.bucket, {_HEAPS_POINTS})) AS u(cp)
  GROUP BY cp
),
fo AS (
  SELECT tok, min(doc_id) AS first_doc FROM dtok GROUP BY tok
),
fo_b AS (
  SELECT 1 + len(list_filter(cl.cs, x -> first_doc > x)) AS bucket
  FROM fo, cl
),
vcum AS (
  SELECT cp, CAST(count(*) AS BIGINT) AS v_types
  FROM fo_b, unnest(generate_series(fo_b.bucket, {_HEAPS_POINTS})) AS u(cp)
  GROUP BY cp
),
pts AS (
  SELECT CAST(round(ln(n_tokens) * 1e9) AS BIGINT) AS a,
         CAST(round(ln(v_types) * 1e9) AS BIGINT) AS b
  FROM ncum JOIN vcum USING (cp)
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS np,
         CAST(sum(CAST(a AS HUGEINT)) AS DOUBLE) / 1e9 AS sa,
         CAST(sum(CAST(b AS HUGEINT)) AS DOUBLE) / 1e9 AS sb,
         CAST(sum(CAST(a AS HUGEINT) * a) AS DOUBLE) / 1e18 AS saa,
         CAST(sum(CAST(a AS HUGEINT) * b) AS DOUBLE) / 1e18 AS sab
  FROM pts
)
SELECT np AS n_points,
       round((np * sab - sa * sb) / (np * saa - sa * sa), 6) AS beta,
       round(exp(sb / np - ((np * sab - sa * sb) / (np * saa - sa * sa))
                           * (sa / np)), 6) AS k_coef
FROM s
"""


@register(
    "vocab_heaps_law_fit",
    oracle=_sql_heaps(),
    tags=("text", "vocabulary", "heaps", "scaling-law"),
)
def vocab_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit of vocabulary growth, V(N) = k·N^β, over ten
    corpus prefixes: prefix checkpoints are exact doc_id deciles (the
    equi-depth cut machinery), the token count N_d at each checkpoint
    accumulates via the explode(sequence(bucket, 10)) cover trick (no
    window, no inequality join), and the vocabulary size V_d counts
    tokens whose FIRST-occurrence doc falls at or before the
    checkpoint — min(doc_id) per token makes 'cumulative distinct'
    distributable, the trick that turns a sequential vocabulary scan
    into two groupBys. β̂ comes from the closed-form log-log OLS over
    the 10-point frame (nano-quantized logs, exact integer moment
    sums) — the corpus-scaling readout (β≈0.5 for natural text) that
    sizes tokenizer vocabularies and dedup budgets before a crawl
    10×es.

    Scale shape: one token explode → groupBy(token) min (the only
    volume shuffle), one doc-grain pass, two 10-row cover aggregations,
    one 1-row fit. The cut derivation is the distributed prefix sum."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", tx.tokens("text").alias("toks")
    ).localCheckpoint(eager=True)  # feeds cuts, N-cum, and the explode
    cuts = equi_depth_cut_points(docs, F.col("doc_id"), _HEAPS_POINTS)
    doc_b = docs.select(
        bucket_by_cuts(F.col("doc_id"), cuts).alias("bucket"),
        F.size("toks").cast("bigint").alias("n_toks"),
    )
    ncum = (
        doc_b.select(
            F.explode(F.sequence(F.col("bucket"), F.lit(_HEAPS_POINTS))).alias("cp"),
            "n_toks",
        )
        .groupBy("cp")
        .agg(F.sum("n_toks").cast("bigint").alias("n_tokens"))
    )
    fo = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    vcum = (
        fo.select(bucket_by_cuts(F.col("first_doc"), cuts).alias("bucket"))
        .select(
            F.explode(F.sequence(F.col("bucket"), F.lit(_HEAPS_POINTS))).alias("cp")
        )
        .groupBy("cp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v_types"))
    )
    pts = ncum.join(F.broadcast(vcum), "cp").select(
        F.round(F.ln("n_tokens") * 1e9).cast("bigint").alias("a"),
        F.round(F.ln("v_types") * 1e9).cast("bigint").alias("b"),
    )
    ad = F.col("a").cast("decimal(38,0)")
    bd = F.col("b").cast("decimal(38,0)")
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        (F.sum(ad).cast("double") / 1e9).alias("sa"),
        (F.sum(bd).cast("double") / 1e9).alias("sb"),
        (F.sum(ad * F.col("a")).cast("double") / 1e18).alias("saa"),
        (F.sum(ad * F.col("b")).cast("double") / 1e18).alias("sab"),
    )
    slope = (F.col("np") * F.col("sab") - F.col("sa") * F.col("sb")) / (
        F.col("np") * F.col("saa") - F.col("sa") * F.col("sa")
    )
    return s.select(
        F.col("np").alias("n_points"),
        F.round(slope, 6).alias("beta"),
        F.round(F.exp(F.col("sb") / F.col("np") - slope * (F.col("sa") / F.col("np"))), 6).alias(
            "k_coef"
        ),
    )


# --------------------------------------------------------------------------
# Multimodal payload dedup accounting (content-hash clusters + bytes saved)
# --------------------------------------------------------------------------


@register(
    "multimodal_payload_dedup",
    oracle="""
WITH p AS (
  SELECT md5(text) AS content_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
),
cl AS (
  SELECT content_id, CAST(count(*) AS BIGINT) AS copies,
         CAST(max(n_bytes) AS BIGINT) AS n_bytes
  FROM p GROUP BY 1
)
SELECT CAST(sum(copies) AS BIGINT) AS n_payloads,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(count(*) FILTER (WHERE copies > 1) AS BIGINT) AS dup_clusters,
       CAST(max(copies) AS BIGINT) AS max_copies,
       CAST(sum(copies * n_bytes) AS BIGINT) AS bytes_total,
       CAST(sum((copies - 1) * n_bytes) AS BIGINT) AS bytes_redundant,
       round(sum((copies - 1) * n_bytes)
             / CAST(sum(copies * n_bytes) AS DOUBLE), 9) AS dedup_ratio
FROM cl
""",
    tags=("multimodal", "dedup", "storage", "datapipe"),
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup accounting over opaque binary payloads (the
    documents' bytes standing in for media blobs, as everywhere in the
    multimodal family): cluster by md5 content id and report the
    STORAGE ledger — distinct payloads, duplicate clusters, total vs
    redundant bytes, and the dedup ratio — the numbers that size a
    content-addressed blob store before ingesting a crawl's media.
    ``dedup_exact_groups`` picks winners; this entry prices the
    duplication. The hash is computed on the payload bytes (md5 of the
    UTF-8 encoding = DuckDB's md5 of the VARCHAR), so the text itself
    never shuffles — 16-byte ids and byte counts do.

    Exactness: every cell is exact BIGINT arithmetic; the ratio is one
    rounded integer quotient.

    Scale shape: map to (content_id, n_bytes), ONE map-side-combined
    groupBy on the hash, one 1-row combine."""
    from .datapipe.multimodal import to_payload

    d = _t(spark, sf_dir, "documents").select(
        F.md5(to_payload("text")).alias("content_id"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    )
    cl = d.groupBy("content_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("copies"),
        F.max("n_bytes").cast("bigint").alias("n_bytes"),
    )
    return cl.agg(
        F.sum("copies").cast("bigint").alias("n_payloads"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.count(F.when(F.col("copies") > 1, 1)).cast("bigint").alias("dup_clusters"),
        F.max("copies").cast("bigint").alias("max_copies"),
        F.sum(F.col("copies") * F.col("n_bytes")).cast("bigint").alias("bytes_total"),
        F.sum((F.col("copies") - 1) * F.col("n_bytes"))
        .cast("bigint")
        .alias("bytes_redundant"),
        F.round(
            F.sum((F.col("copies") - 1) * F.col("n_bytes"))
            / F.sum(F.col("copies") * F.col("n_bytes")).cast("double"),
            9,
        ).alias("dedup_ratio"),
    )


# --------------------------------------------------------------------------
# Friedman rank test: do event types differ, blocking by day?
# --------------------------------------------------------------------------


def _sql_friedman() -> str:
    davg_v = SQL_DAVG.format(x="value")
    phi = _PHI.format(z="z")
    return f"""
WITH cell AS (
  SELECT date_trunc('day', ts) AS d, event_type, {davg_v} AS x
  FROM events GROUP BY 1, 2
),
complete AS (
  SELECT d FROM cell GROUP BY d
  HAVING count(*) = (SELECT count(DISTINCT event_type) FROM events)
),
r AS (
  SELECT cell.d, event_type,
         CAST(2 * rank() OVER (PARTITION BY cell.d ORDER BY x)
              + count(*) OVER (PARTITION BY cell.d, x) - 1 AS BIGINT) AS mr2
  FROM cell JOIN complete USING (d)
),
rs AS (
  SELECT event_type, CAST(sum(mr2) AS BIGINT) AS r2_sum,
         CAST(count(*) AS BIGINT) AS n_blocks
  FROM r GROUP BY 1
),
q AS (
  SELECT CAST(max(n_blocks) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k,
         12.0 / (max(n_blocks) * count(*) * (count(*) + 1))
           * sum((r2_sum / 2.0) * (r2_sum / 2.0))
           - 3.0 * max(n_blocks) * (count(*) + 1) AS q
  FROM rs
),
z AS (
  SELECT n, k, q,
         (cbrt(q / (k - 1)) - (1.0 - 2.0 / (9.0 * (k - 1))))
           / sqrt(2.0 / (9.0 * (k - 1))) AS z
  FROM q
)
SELECT n AS n_blocks, k AS k_treatments, round(q, 9) AS q_stat,
       round(1.0 - ({phi}), 6) AS p_value
FROM z
"""


@register(
    "stats_friedman_test",
    oracle=_sql_friedman(),
    tags=("stats", "nonparametric", "friedman"),
)
def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: do the event types differ in mean value,
    BLOCKING by day? Each complete day ranks its k type means
    (midranks, doubled to stay integer — the Pettitt discipline), and
    Q = 12/(nk(k+1))·ΣR_j² − 3n(k+1) with the Wilson-Hilferty χ²(k−1)
    p-value — the repeated-measures complement to
    ``stats_kruskal_wallis`` (which pools all days and so confounds
    day-to-day level shifts with type differences; Friedman removes
    the block effect). Incomplete days (a type with zero events) are
    excluded — the standard complete-block contract.

    Exactness: cell means are the micro-quantized davg; doubled
    midranks and rank sums are exact BIGINTs; Q/z/p are identical
    closed-form doubles.

    Scale shape: one map-side-combined (day, type) groupBy; the rank
    window partitions BY DAY (k rows per partition — never a global
    sort); the rest is a k-row reduce."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("ts", "event_type", "value")
    cell = ev.groupBy(
        F.date_trunc("day", "ts").alias("d"), "event_type"
    ).agg(davg("value").alias("x"))
    # the type count rides as a 1-row broadcast scalar (the oracle's
    # scalar subquery) — no eager driver action during plan build
    kt = ev.agg(F.count_distinct(F.col("event_type")).alias("kt"))
    complete = (
        cell.groupBy("d")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(kt))
        .where(F.col("c") == F.col("kt"))
    ).select("d")
    r = cell.join(F.broadcast(complete), "d").select(
        "event_type",
        (
            2 * F.rank().over(Window.partitionBy("d").orderBy("x"))
            + F.count(F.lit(1)).over(Window.partitionBy("d", "x"))
            - 1
        )
        .cast("bigint")
        .alias("mr2"),
    )
    rs = r.groupBy("event_type").agg(
        F.sum("mr2").cast("bigint").alias("r2_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    q = rs.agg(
        F.max("n_blocks").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        (
            F.lit(12.0)
            / (F.max("n_blocks") * F.count(F.lit(1)) * (F.count(F.lit(1)) + 1))
            * F.sum((F.col("r2_sum") / 2.0) * (F.col("r2_sum") / 2.0))
            - 3.0 * F.max("n_blocks") * (F.count(F.lit(1)) + 1)
        ).alias("q"),
    )
    dfq = (F.col("k") - 1).cast("double")
    z = (F.cbrt(F.col("q") / dfq) - (F.lit(1.0) - 2.0 / (9.0 * dfq))) / F.sqrt(
        2.0 / (9.0 * dfq)
    )
    phi = 1.0 / (1.0 + F.exp(F.lit(-1.5976) * z - F.lit(0.07056) * z * z * z))
    return q.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.round("q", 9).alias("q_stat"),
        F.round(F.lit(1.0) - phi, 6).alias("p_value"),
    )


# --------------------------------------------------------------------------
# Bartlett test of variance homogeneity across event types
# --------------------------------------------------------------------------


def _sql_bartlett() -> str:
    phi = _PHI.format(z="z")
    return f"""
WITH g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(sum(CAST(round(value * 1000000.0) AS HUGEINT)) AS DOUBLE)
           / 1e6 AS s1,
         CAST(sum(CAST(round(value * 1000000.0) AS HUGEINT)
                  * CAST(round(value * 1000000.0) AS HUGEINT)) AS DOUBLE)
           / 1e12 AS s2
  FROM events GROUP BY 1
),
v AS (
  SELECT event_type, n_h,
         (s2 - s1 * s1 / n_h) / (n_h - 1) AS var_h
  FROM g
),
s AS (
  SELECT CAST(sum(n_h) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         sum((n_h - 1) * var_h) AS ssw,
         sum((n_h - 1) * ln(var_h)) AS slog,
         sum(1.0 / (n_h - 1)) AS sinv
  FROM v
),
t AS (
  SELECT n, k,
         ((n - k) * ln(ssw / (n - k)) - slog)
           / (1.0 + (sinv - 1.0 / (n - k)) / (3.0 * (k - 1))) AS t
  FROM s
),
z AS (
  SELECT n, k, t,
         (cbrt(t / (k - 1)) - (1.0 - 2.0 / (9.0 * (k - 1))))
           / sqrt(2.0 / (9.0 * (k - 1))) AS z
  FROM t
)
SELECT n, k, round(t, 9) AS t_stat, round(1.0 - ({phi}), 6) AS p_value
FROM z
"""


@register(
    "stats_bartlett_test",
    oracle=_sql_bartlett(),
    tags=("stats", "variance", "bartlett"),
)
def stats_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett test of variance homogeneity across event types — the
    PARAMETRIC complement to ``stats_levene_brownforsythe`` (Bartlett
    is more powerful under normality, Brown-Forsythe robust without
    it; a variance-QA suite reports both). T compares the pooled
    log-variance to the mean of group log-variances with the standard
    correction factor; p via Wilson-Hilferty χ²(k−1).

    Exactness: group moments are exact micro-quantized integer sums
    (Σx, Σx² on the micro grid, HUGEINT/DECIMAL-safe); variances, T,
    and p are identical closed-form doubles over them.

    Scale shape: ONE map-side-combined groupBy to k rows, then a 1-row
    reduce. No joins, no windows."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    q = F.round(F.col("value") * 1e6).cast("decimal(38,0)")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        (F.sum(q).cast("double") / 1e6).alias("s1"),
        (F.sum(q * q).cast("double") / 1e12).alias("s2"),
    )
    v = g.select(
        "n_h",
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_h")) / (F.col("n_h") - 1)).alias(
            "var_h"
        ),
    )
    s = v.agg(
        F.sum("n_h").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum((F.col("n_h") - 1) * F.col("var_h")).alias("ssw"),
        F.sum((F.col("n_h") - 1) * F.ln("var_h")).alias("slog"),
        F.sum(F.lit(1.0) / (F.col("n_h") - 1)).alias("sinv"),
    )
    nk = (F.col("n") - F.col("k")).cast("double")
    t = ((F.col("n") - F.col("k")) * F.ln(F.col("ssw") / nk) - F.col("slog")) / (
        F.lit(1.0) + (F.col("sinv") - 1.0 / nk) / (3.0 * (F.col("k") - 1))
    )
    ts = s.select("n", "k", t.alias("t"))
    dfq = (F.col("k") - 1).cast("double")
    z = (F.cbrt(F.col("t") / dfq) - (F.lit(1.0) - 2.0 / (9.0 * dfq))) / F.sqrt(
        2.0 / (9.0 * dfq)
    )
    phi = 1.0 / (1.0 + F.exp(F.lit(-1.5976) * z - F.lit(0.07056) * z * z * z))
    return ts.select(
        "n",
        "k",
        F.round("t", 9).alias("t_stat"),
        F.round(F.lit(1.0) - phi, 6).alias("p_value"),
    )


# --------------------------------------------------------------------------
# Odds ratio + Woolf CI for the hash-split experiment
# --------------------------------------------------------------------------


def _sql_odds_ratio() -> str:
    from .datapipe.hashing import sql_hash60

    arm = f"({sql_hash60('user_id::VARCHAR', seed=_BB_SEED_OR)} % 2)"
    return f"""
WITH u AS (
  SELECT user_id, {arm} AS arm,
         CAST(CASE WHEN count(*) FILTER (WHERE event_type = 'purchase')
                        >= {_OR_HEAVY} THEN 1 ELSE 0 END
              AS BIGINT) AS converted
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT
    CAST(sum(CASE WHEN arm = 1 AND converted = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS a,
    CAST(sum(CASE WHEN arm = 1 AND converted = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS b,
    CAST(sum(CASE WHEN arm = 0 AND converted = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS c,
    CAST(sum(CASE WHEN arm = 0 AND converted = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS d
  FROM u
)
SELECT a, b, c, d,
       round((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c), 9)
         AS odds_ratio,
       round(exp(ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c))
                 - 1.959963984540054
                   * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 9)
         AS ci_lo,
       round(exp(ln((CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c))
                 + 1.959963984540054
                   * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)), 9)
         AS ci_hi
FROM c
"""


_BB_SEED_OR = 7  # the CUPED/TOST/SRM/power/beta-binomial split
_OR_HEAVY = 14  # 'heavy purchaser' outcome: >= median purchase count
# (any-purchase conversion is DEGENERATE on this fixture — every sf0.01
# user purchases at least once, so two 2x2 cells are zero and the odds
# ratio is undefined; the heavy-purchaser cut keeps all four cells
# populated at every SF)


@register(
    "stats_odds_ratio_ci",
    oracle=_sql_odds_ratio(),
    tags=("stats", "experimentation", "odds-ratio"),
)
def stats_odds_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio of the HEAVY-PURCHASER outcome (≥14 purchases, the
    fixture median — any-purchase conversion is degenerate here: every
    sf0.01 user purchases, zeroing two 2×2 cells) for treatment vs
    control on the seed-7 hash split, with the Woolf 95% CI:
    OR = ad/bc from the user-level table,
    CI = exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)) — the effect-size report
    epidemiology and A/B readouts publish next to the risk difference,
    multiplicative where ``stats_bayes_beta_binomial``'s posterior
    difference is additive (same split, same unit — the experiment
    family's shared fixture). The CI is on the log scale, so no support
    clamping is needed (exp keeps it positive by construction — the
    lesson of the beta-binomial's clamp, designed out here).

    Exactness: the four cells are exact BIGINTs from one
    groupBy-user pass + one 1-row combine; OR and CI are identical
    closed-form doubles.

    Scale shape: one map-side-combined user groupBy, one 1-row
    reduce."""
    from .datapipe.hashing import hash60

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type")
    u = ev.groupBy("user_id").agg(
        F.when(
            F.count(F.when(F.col("event_type") == "purchase", 1)) >= _OR_HEAVY, 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("converted")
    ).select(
        F.pmod(hash60(F.col("user_id").cast("string"), seed=_BB_SEED_OR), F.lit(2)).alias(
            "arm"
        ),
        "converted",
    )
    c = u.agg(
        F.sum(F.when((F.col("arm") == 1) & (F.col("converted") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("converted") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("converted") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("converted") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    orr = (F.col("a").cast("double") * F.col("d")) / (
        F.col("b").cast("double") * F.col("c")
    )
    se = F.sqrt(
        F.lit(1.0) / F.col("a")
        + F.lit(1.0) / F.col("b")
        + F.lit(1.0) / F.col("c")
        + F.lit(1.0) / F.col("d")
    )
    z95 = F.lit(1.959963984540054)
    return c.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orr, 9).alias("odds_ratio"),
        F.round(F.exp(F.ln(orr) - z95 * se), 9).alias("ci_lo"),
        F.round(F.exp(F.ln(orr) + z95 * se), 9).alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# Token-budget truncation packing (middle-out: keep head + tail)
# --------------------------------------------------------------------------

_TRUNC_BUDGET = 64
_TRUNC_HEAD = 48  # tail keeps BUDGET - HEAD = 16


def _sql_trunc() -> str:
    toks = tx.sql_tokens("text")
    tail = _TRUNC_BUDGET - _TRUNC_HEAD
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM documents
),
k AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) <= {_TRUNC_BUDGET} THEN toks
              ELSE list_concat(toks[1:{_TRUNC_HEAD}],
                               toks[len(toks) - {tail} + 1:len(toks)])
         END AS kept
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(len(kept) AS BIGINT) AS kept_tokens,
       (n_tokens > {_TRUNC_BUDGET}) AS truncated,
       md5(array_to_string(kept, ' ')) AS kept_digest
FROM k ORDER BY doc_id
"""


@register(
    "pack_token_budget_truncation",
    oracle=_sql_trunc(),
    tags=("packing", "truncation", "datapipe"),
)
def pack_token_budget_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Middle-out truncation to a 64-token budget: documents over
    budget keep their first 48 and last 16 tokens (head carries the
    thesis, tail the conclusion — the 'middle truncation' long-context
    heuristic, vs naive head-only truncation that loses endings) — the
    map-only packing step that runs BEFORE ``pack_chunks_documents``
    when a pipeline caps per-example length instead of chunking. The
    kept sequence is pinned by an md5 digest of the re-joined tokens,
    so the oracle verifies the exact token LIST, not just its length.

    Exactness: token slices are 1-indexed closed ranges on identical
    whitespace tokenizations; the digest hashes the identical joined
    string.

    Scale shape: pure map work, one row per document, text never
    shuffles (the output carries counts and a 16-byte digest)."""
    tail = _TRUNC_BUDGET - _TRUNC_HEAD
    t = _t(spark, sf_dir, "documents").select(
        "doc_id", tx.tokens("text").alias("toks")
    )
    n = F.size("toks")
    kept = F.when(n <= _TRUNC_BUDGET, F.col("toks")).otherwise(
        F.concat(
            F.slice(F.col("toks"), 1, _TRUNC_HEAD),
            F.slice(F.col("toks"), -tail, tail),
        )
    )
    k = t.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        kept.alias("kept"),
    )
    return k.select(
        "doc_id",
        "n_tokens",
        F.size("kept").cast("bigint").alias("kept_tokens"),
        (F.col("n_tokens") > _TRUNC_BUDGET).alias("truncated"),
        F.md5(F.encode(F.array_join("kept", " "), "UTF-8")).alias("kept_digest"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Anderson-Darling normality test on the daily log-revenue series
# --------------------------------------------------------------------------


def _sql_anderson_darling() -> str:
    phi_z = _PHI.format(z="z")
    return f"""
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(round(ln(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
                                           * 100.0) AS BIGINT)) AS DOUBLE))
                    * 1e9) AS BIGINT) AS v
  FROM lineitem GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) / count(*) / 1e9 AS mu,
         sqrt((CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE) / 1e18
               - count(*) * (CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
                             / count(*) / 1e9)
                          * (CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
                             / count(*) / 1e9))
              / (count(*) - 1)) AS sigma
  FROM daily
),
r AS (
  SELECT CAST(row_number() OVER (ORDER BY v, d) AS BIGINT) AS i,
         (v / 1e9 - mu) / sigma AS z, n
  FROM daily, m
),
f AS (
  SELECT i, n, {phi_z} AS fz FROM r
),
s AS (
  SELECT max(n) AS n,
         CAST(sum(CAST(round(((2.0 * i - 1) * ln(fz)
                              + (2.0 * n + 1 - 2.0 * i) * ln(1.0 - fz))
                             * 1e9) AS HUGEINT)) AS DOUBLE) / 1e9 AS t
  FROM f
)
SELECT n AS n_days, round(-CAST(n AS DOUBLE) - t / n, 9) AS a_sq
FROM s
"""


@register(
    "stats_anderson_darling",
    oracle=_sql_anderson_darling(),
    tags=("stats", "normality", "anderson-darling"),
)
def stats_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson-Darling normality statistic on the daily LOG-revenue
    series: A² = −n − (1/n)Σ[(2i−1)·ln F(zᵢ) + (2n+1−2i)·ln(1−F(zᵢ))]
    — the tail-weighted EDF test that catches the departures from
    normality ``stats_lognormal_fit_ks``'s KS misses (KS weighs the
    middle; A-D weighs the tails, where revenue distributions actually
    break). The folded single-pass form replaces the textbook's
    paired-rank (i, n+1−i) sum — algebraically identical, and it needs
    only ONE rank per row. F is the catalog's shared Bowling Φ, so A²
    is comparable across entries, not against scipy's tables —
    documented approximation, identical text both engines.

    Exactness: log values quantize to nano-BIGINTs (the lognormal-KS
    discipline) so moments are exact-integer ratios; the (v, d) rank
    order is total; each row's EDF term quantizes to a nano-grid
    integer before the order-free sum (a plain float sum's order
    differs between Spark partial aggregation and DuckDB).

    Scale shape: one map-side-combined day groupBy; one rank window
    over the horizon-bounded day frame; one 1-row reduce."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("d")).agg(
        F.round(
            F.ln(
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (F.lit(1.0) - F.col("l_discount"))
                        * 100.0
                    ).cast("bigint")
                ).cast("double")
            )
            * 1e9
        )
        .cast("bigint")
        .alias("v")
    )
    vd = F.col("v").cast("decimal(38,0)")
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum(vd).cast("double") / F.count(F.lit(1)) / 1e9).alias("mu"),
        F.sqrt(
            (
                F.sum(vd * F.col("v")).cast("double") / 1e18
                - F.count(F.lit(1))
                * (F.sum(vd).cast("double") / F.count(F.lit(1)) / 1e9)
                * (F.sum(vd).cast("double") / F.count(F.lit(1)) / 1e9)
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("sigma"),
    )
    w = Window.orderBy("v", "d")
    r = daily.crossJoin(F.broadcast(m)).select(
        F.row_number().over(w).cast("bigint").alias("i"),
        ((F.col("v") / 1e9 - F.col("mu")) / F.col("sigma")).alias("z"),
        "n",
    )
    fz = 1.0 / (
        1.0
        + F.exp(
            F.lit(-1.5976) * F.col("z") - F.lit(0.07056) * F.col("z") * F.col("z") * F.col("z")
        )
    )
    f = r.select("i", "n", fz.alias("fz"))
    term = (2.0 * F.col("i") - 1) * F.ln("fz") + (
        2.0 * F.col("n") + 1 - 2.0 * F.col("i")
    ) * F.ln(F.lit(1.0) - F.col("fz"))
    s = f.agg(
        F.max("n").alias("n"),
        (
            F.sum(F.round(term * 1e9).cast("decimal(38,0)")).cast("double") / 1e9
        ).alias("t"),
    )
    return s.select(
        F.col("n").alias("n_days"),
        F.round(-F.col("n").cast("double") - F.col("t") / F.col("n"), 9).alias("a_sq"),
    )


# --------------------------------------------------------------------------
# Cook's distance: influence diagnostics on the daily revenue trend fit
# --------------------------------------------------------------------------

_COOKS_TOP = 5


def _sql_cooks_distance() -> str:
    return f"""
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
xi AS (
  SELECT d, y, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS x
  FROM daily
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) / count(*) AS xbar,
         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) / count(*) AS ybar,
         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE)
           - count(*) * (CAST(sum(x) AS DOUBLE) / count(*))
                      * (CAST(sum(x) AS DOUBLE) / count(*)) AS sxx,
         CAST(sum(CAST(x AS HUGEINT) * y) AS DOUBLE)
           - count(*) * (CAST(sum(x) AS DOUBLE) / count(*))
                      * (CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) / count(*))
           AS sxy
  FROM xi
),
e AS (
  SELECT d, x, y, n, xbar, sxx,
         y - (ybar + (sxy / sxx) * (x - xbar)) AS resid,
         1.0 / n + (x - xbar) * (x - xbar) / sxx AS lev
  FROM xi, m
),
s2 AS (
  SELECT (CAST(sum(CAST(round(resid * resid * 1e6) AS HUGEINT)) AS DOUBLE)
          / 1e6) / (max(n) - 2) AS s2
  FROM e
)
SELECT d, y,
       round(resid, 6) AS residual_cents,
       round(lev, 9) AS leverage,
       round(resid * resid * lev / (2.0 * s2 * (1.0 - lev) * (1.0 - lev)), 9)
         AS cooks_d
FROM e, s2
ORDER BY resid * resid * lev / (2.0 * s2 * (1.0 - lev) * (1.0 - lev)) DESC, d
LIMIT {_COOKS_TOP}
"""


@register(
    "stats_cooks_distance",
    oracle=_sql_cooks_distance(),
    tags=("stats", "regression", "diagnostics"),
)
def stats_cooks_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance on the daily revenue trend fit: the 5 most
    INFLUENTIAL days under the simple OLS of revenue on the day index
    — D_i = e_i²·h_ii / (p·s²·(1−h_ii)²) with p=2 and the closed-form
    simple-regression leverage h_ii = 1/n + (x_i−x̄)²/Sxx. The
    regression-diagnostics readout ``regression_multiple_ols`` omits:
    a day can have a modest residual but dominate the FIT (end-of-range
    leverage), and Cook's D is what says 'this one day moved the
    slope'. The argmax orders on the RAW statistic before rounding
    (the stats_lognormal_fit_ks discipline).

    Exactness: x is a dense rank over the total (day) order; all
    moments are exact DECIMAL integer sums; s² quantizes each squared
    residual to a micro-grid integer before the order-free sum;
    residual/leverage/D are identical closed-form doubles.

    Scale shape: one map-side-combined day groupBy, one rank window
    over the horizon-bounded day frame, a 1-row moment broadcast, a
    TakeOrdered(5)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("d")).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("y")
    )
    xi = daily.select(
        "d", "y", F.row_number().over(Window.orderBy("d")).cast("bigint").alias("x")
    ).localCheckpoint(eager=True)  # feeds moments AND the residual pass
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    cnt = F.count(F.lit(1))
    xbar = F.sum("x").cast("double") / cnt
    ybar = F.sum(yd).cast("double") / cnt
    m = xi.agg(
        cnt.cast("bigint").alias("n"),
        xbar.alias("xbar"),
        ybar.alias("ybar"),
        (F.sum(xd * F.col("x")).cast("double") - cnt * xbar * xbar).alias("sxx"),
        (F.sum(xd * F.col("y")).cast("double") - cnt * xbar * ybar).alias("sxy"),
    )
    e = xi.crossJoin(F.broadcast(m)).select(
        "d",
        "y",
        "n",
        (
            F.col("y")
            - (
                F.col("ybar")
                + (F.col("sxy") / F.col("sxx")) * (F.col("x") - F.col("xbar"))
            )
        ).alias("resid"),
        (
            F.lit(1.0) / F.col("n")
            + (F.col("x") - F.col("xbar")) * (F.col("x") - F.col("xbar")) / F.col("sxx")
        ).alias("lev"),
    )
    s2 = e.agg(
        (
            F.sum(F.round(F.col("resid") * F.col("resid") * 1e6).cast("decimal(38,0)")).cast(
                "double"
            )
            / 1e6
            / (F.max("n") - 2)
        ).alias("s2")
    )
    cooks = (
        F.col("resid")
        * F.col("resid")
        * F.col("lev")
        / (2.0 * F.col("s2") * (F.lit(1.0) - F.col("lev")) * (F.lit(1.0) - F.col("lev")))
    )
    return (
        e.crossJoin(F.broadcast(s2))
        .orderBy(cooks.desc(), "d")
        .limit(_COOKS_TOP)
        .select(
            "d",
            "y",
            F.round("resid", 6).alias("residual_cents"),
            F.round("lev", 9).alias("leverage"),
            F.round(cooks, 9).alias("cooks_d"),
        )
    )


# --------------------------------------------------------------------------
# PPS systematic sampling (probability proportional to size, RNG-free)
# --------------------------------------------------------------------------

_PPS_K = 50  # systematic picks


def _sql_pps() -> str:
    return f"""
WITH w AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS wt FROM documents WHERE n_chars > 0
),
cum AS (
  SELECT doc_id, wt,
         CAST(sum(wt) OVER (ORDER BY doc_id) AS BIGINT) AS c
  FROM w
),
tot AS (SELECT CAST(sum(wt) AS BIGINT) AS t FROM w),
hits AS (
  SELECT doc_id, wt, c,
         (CASE WHEN 2 * {_PPS_K} * c >= t
               THEN (2 * {_PPS_K} * c - t) // (2 * t) + 1 ELSE 0 END)
         - (CASE WHEN 2 * {_PPS_K} * (c - wt) >= t
                 THEN (2 * {_PPS_K} * (c - wt) - t) // (2 * t) + 1 ELSE 0 END)
           AS n_hits
  FROM cum, tot
)
SELECT doc_id, wt AS n_chars, CAST(n_hits AS BIGINT) AS n_hits
FROM hits WHERE n_hits > 0
ORDER BY doc_id
"""


@register(
    "sample_pps_systematic",
    oracle=_sql_pps(),
    tags=("sampling", "pps", "systematic", "datapipe"),
)
def sample_pps_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sample (probability proportional to size) of the
    document corpus, 50 picks weighted by n_chars: selection points sit
    at (2j+1)·T/(2k) along the cumulative-weight axis, and a document
    is selected once per point its weight interval covers — the
    classical survey-sampling design (large docs can be hit twice,
    which IS pps-with-replacement's multiplicity) and the equal-WORK
    sampler for inspection pipelines where a doc's review cost scales
    with its length. Entirely RNG-free and exact: the usual 'random
    start' is pinned at the half-interval offset, and hit counts are
    pure integer arithmetic — #points ≤ x is ((2kx − T) div 2T) + 1 —
    so no float ever decides a membership.

    Scale shape: the cumulative weight is the distributed prefix sum
    (range partition by doc_id — the equidepth machinery's shape, here
    via the oracle-matching window over the doc frame at this SF, with
    `value_counts_cum` as the documented 100 TB swap-in); hit counting
    is map-only integer math; no joins beyond the 1-row total
    broadcast."""
    from pyspark.sql import Window

    w = (
        _t(spark, sf_dir, "documents")
        .where(F.col("n_chars") > 0)
        .select("doc_id", F.col("n_chars").cast("bigint").alias("wt"))
    )
    cum = w.select(
        "doc_id",
        "wt",
        F.sum("wt")
        .over(
            Window.orderBy("doc_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .cast("bigint")
        .alias("c"),
    )
    tot = w.agg(F.sum("wt").cast("bigint").alias("t"))

    two_t = 2 * F.col("t")

    def npts(x):
        # #selection points at or below x: ((2kx - T) floor-div 2T) + 1
        # when 2kx >= T, else 0. EXACT integer floor division — a double
        # floor(a/b) misfloors once operands pass 2^53, so divide the
        # pmod-aligned numerator as DECIMAL (exactly divisible, so the
        # truncating cast is the floor).
        num = F.lit(2 * _PPS_K) * x - F.col("t")
        aligned = (num - F.pmod(num, two_t)).cast("decimal(38,0)")
        q = (aligned / two_t.cast("decimal(38,0)")).cast("bigint")
        return F.when(F.lit(2 * _PPS_K) * x >= F.col("t"), q + 1).otherwise(0)

    hi = npts(F.col("c"))
    lo = npts(F.col("c") - F.col("wt"))
    hits = cum.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        F.col("wt").alias("n_chars"),
        (hi - lo).cast("bigint").alias("n_hits"),
    )
    return hits.where(F.col("n_hits") > 0).orderBy("doc_id")


# --------------------------------------------------------------------------
# Hurst exponent via rescaled-range (R/S) analysis of the hourly series
# --------------------------------------------------------------------------

_HURST_SIZES = (16, 32, 64, 128)


def _sql_hurst() -> str:
    davg_x = SQL_DAVG.format(x="value")
    sizes = ", ".join(str(s) for s in _HURST_SIZES)
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, {davg_x} AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT x, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS i FROM hourly
),
blk AS (
  SELECT s, (i - 1) // s AS b, i, x
  FROM idx, unnest([{sizes}]) AS u(s)
),
full_blocks AS (
  SELECT s, b FROM blk GROUP BY s, b HAVING count(*) = s
),
bm AS (
  SELECT blk.s, blk.b, {SQL_DAVG.format(x='x')} AS m
  FROM blk JOIN full_blocks USING (s, b) GROUP BY blk.s, blk.b
),
dev AS (
  SELECT blk.s, blk.b, blk.i,
         CAST(round((x - m) * 1e9) AS BIGINT) AS d9,
         CAST(round((x - m) * (x - m) * 1e9) AS BIGINT) AS dd9
  FROM blk JOIN bm ON blk.s = bm.s AND blk.b = bm.b
),
y AS (
  SELECT s, b, dd9,
         CAST(sum(d9) OVER (PARTITION BY s, b ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS yt
  FROM dev
),
rs AS (
  SELECT s, b,
         ((greatest(max(yt), 0) - least(min(yt), 0)) / 1e9)
           / sqrt(CAST(sum(dd9) AS DOUBLE) / 1e9 / s) AS rs_b
  FROM y GROUP BY s, b
),
pt AS (
  SELECT s,
         CAST(round(ln(CAST(s AS DOUBLE)) * 1e9) AS BIGINT) AS a,
         CAST(round(ln((CAST(SUM(CAST(round(rs_b * 1000000.0) AS HUGEINT))
                             AS DOUBLE) / count(*)) / 1000000.0) * 1e9)
              AS BIGINT) AS bb
  FROM rs GROUP BY s
),
f AS (
  SELECT CAST(count(*) AS BIGINT) AS np,
         CAST(sum(CAST(a AS HUGEINT)) AS DOUBLE) / 1e9 AS sa,
         CAST(sum(CAST(bb AS HUGEINT)) AS DOUBLE) / 1e9 AS sb,
         CAST(sum(CAST(a AS HUGEINT) * a) AS DOUBLE) / 1e18 AS saa,
         CAST(sum(CAST(a AS HUGEINT) * bb) AS DOUBLE) / 1e18 AS sab
  FROM pt
)
SELECT np AS n_sizes,
       round((np * sab - sa * sb) / (np * saa - sa * sa), 6) AS hurst_h
FROM f
"""


@register(
    "stats_hurst_exponent",
    oracle=_sql_hurst(),
    tags=("stats", "timeseries", "hurst", "long-memory"),
)
def stats_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the hourly engagement series via classical
    rescaled-range analysis: for block sizes s ∈ {16,32,64,128}, each
    complete block's R/S = (range of cumulative mean-deviations) /
    (population σ), averaged per size, and Ĥ is the log-log OLS slope
    — the long-memory diagnostic (H≈0.5 random walk increments, H>0.5
    persistent trends) that says whether ``ts_autocorrelation``'s decay
    carries structure or noise. R spans the walk's
    full excursion INCLUDING its 0 start: greatest(max Y, 0) −
    least(min Y, 0), the classical convention.

    Exactness: per-block deviation increments quantize to nano-BIGINTs,
    so every cumulative walk value AND the range are exact integers;
    block σ comes from the quantized square sums; per-size means
    micro-quantize; the final slope is the Heaps-fit integer-moment
    form.

    Scale shape: the series is an hourly aggregate first (720 points at
    sf0.01); the size explode is 4×; all windows partition by (size,
    block) — no un-partitioned pass except the one bounded series
    index (the ts_autocorrelation precedent)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        davg("value").alias("x")
    )
    idx = hourly.select(
        "x", F.row_number().over(Window.orderBy("h")).cast("bigint").alias("i")
    )
    blk = idx.select(
        F.explode(F.array(*[F.lit(s) for s in _HURST_SIZES])).alias("s"),
        "i",
        "x",
    ).select(
        "s", F.floor((F.col("i") - 1) / F.col("s")).cast("bigint").alias("b"), "i", "x"
    ).localCheckpoint(eager=True)
    full_blocks = (
        blk.groupBy("s", "b").agg(F.count(F.lit(1)).alias("c")).where(
            F.col("c") == F.col("s")
        ).select("s", "b")
    )
    bm = (
        blk.join(full_blocks, ["s", "b"])
        .groupBy("s", "b")
        .agg(davg("x").alias("m"))
    )
    dev = blk.join(bm, ["s", "b"]).select(
        "s",
        "b",
        "i",
        F.round((F.col("x") - F.col("m")) * 1e9).cast("bigint").alias("d9"),
        F.round((F.col("x") - F.col("m")) * (F.col("x") - F.col("m")) * 1e9)
        .cast("bigint")
        .alias("dd9"),
    )
    wy = (
        Window.partitionBy("s", "b")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    y = dev.select(
        "s", "b", "dd9", F.sum("d9").over(wy).cast("bigint").alias("yt")
    )
    rs = y.groupBy("s", "b").agg(
        (
            ((F.greatest(F.max("yt"), F.lit(0)) - F.least(F.min("yt"), F.lit(0))) / 1e9)
            / F.sqrt(F.sum("dd9").cast("double") / 1e9 / F.max(F.col("s")))
        ).alias("rs_b")
    )
    pt = rs.groupBy("s").agg(
        F.round(F.ln(F.col("s").cast("double")) * 1e9)
        .cast("bigint")
        .alias("a"),
        F.round(
            F.ln(
                F.sum(F.round(F.col("rs_b") * 1e6).cast("decimal(38,0)")).cast(
                    "double"
                )
                / F.count(F.lit(1))
                / 1e6
            )
            * 1e9
        )
        .cast("bigint")
        .alias("bb"),
    )
    ad = F.col("a").cast("decimal(38,0)")
    f = pt.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        (F.sum(ad).cast("double") / 1e9).alias("sa"),
        (F.sum(F.col("bb").cast("decimal(38,0)")).cast("double") / 1e9).alias("sb"),
        (F.sum(ad * F.col("a")).cast("double") / 1e18).alias("saa"),
        (F.sum(ad * F.col("bb")).cast("double") / 1e18).alias("sab"),
    )
    slope = (F.col("np") * F.col("sab") - F.col("sa") * F.col("sb")) / (
        F.col("np") * F.col("saa") - F.col("sa") * F.col("sa")
    )
    return f.select(
        F.col("np").alias("n_sizes"), F.round(slope, 6).alias("hurst_h")
    )


# --------------------------------------------------------------------------
# Schema-evolution read (mergeSchema over heterogeneous parquet batches)
# --------------------------------------------------------------------------


def _sql_schema_evolution() -> str:
    davg_v = SQL_DAVG.format(x="value")
    return f"""
WITH unioned AS (
  SELECT event_type, value, NULL AS value_eur
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT event_type, value, round(value * 0.92, 6) AS value_eur
  FROM events WHERE event_id % 2 = 1
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(value_eur) AS BIGINT) AS n_with_eur,
       {davg_v} AS avg_value,
       {SQL_DAVG.format(x='value_eur')} AS avg_value_eur
FROM unioned GROUP BY 1 ORDER BY 1
"""


@register(
    "source_schema_evolution",
    oracle=_sql_schema_evolution(),
    tags=("source", "schema-evolution", "format"),
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the storage layer, end to end: two parquet
    batches with DIFFERENT schemas — the 'old' batch (even event ids)
    lacks the value_eur column a later pipeline version added to the
    'new' batch (odd ids) — land in one dataset directory and are read
    back with ``mergeSchema=true``, which unions the schemas and
    null-fills the missing column. This is the ingest reality every
    long-lived table faces (producers upgrade mid-stream); the
    aggregate pins that old rows read NULL (count skips them) and new
    rows carry the derived value exactly. Spark's default
    (first-footer schema) would silently DROP the new column when an
    old file is listed first — mergeSchema is the correctness flag,
    paid once at footer-merge planning time.

    Exactness: the oracle replays the union semantics relationally;
    counts are exact BIGINTs; means are the catalog's micro-quantized
    davg (NULL-skipping on both engines).

    Scale shape: write once per batch (day-grain repartition as in
    source_partition_pruning); the merged read prunes/pushes exactly
    like any parquet scan; the aggregate is map-side combined."""
    path = _scratch_r7(sf_dir, "evolve")
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    old = ev.where(F.col("event_id") % 2 == 0).select("event_type", "value")
    new = ev.where(F.col("event_id") % 2 == 1).select(
        "event_type",
        "value",
        F.round(F.col("value") * 0.92, 6).alias("value_eur"),
    )
    old.coalesce(4).write.mode("overwrite").parquet(f"{path}/batch=old")
    new.coalesce(4).write.mode("overwrite").parquet(f"{path}/batch=new")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/batch=old", f"{path}/batch=new"
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count("value_eur").cast("bigint").alias("n_with_eur"),
            davg("value").alias("avg_value"),
            davg("value_eur").alias("avg_value_eur"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Markov-chain entropy rate of the event-type process
# --------------------------------------------------------------------------


def _sql_entropy_rate() -> str:
    return """
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
cnt AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
),
rowt AS (SELECT src, CAST(sum(n) AS BIGINT) AS row_n FROM cnt GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM cnt),
h AS (
  SELECT CAST(sum(CAST(round(-(CAST(c.n AS DOUBLE) / t.t)
                             * ln(CAST(c.n AS DOUBLE) / r.row_n) * 1e9)
                       AS BIGINT)) AS BIGINT) AS h9,
         max(t.t) AS t
  FROM cnt c JOIN rowt r USING (src) CROSS JOIN tot t
)
SELECT t AS n_transitions,
       round(CAST(h9 AS DOUBLE) / 1e9, 9) AS entropy_rate_nats,
       round(CAST(h9 AS DOUBLE) / 1e9 / ln(2.0), 9) AS entropy_rate_bits
FROM h
"""


@register(
    "events_entropy_rate",
    oracle=_sql_entropy_rate(),
    tags=("markov", "entropy", "information"),
)
def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the event-type process under the first-order
    Markov model: H = −Σ_ij π_i·p_ij·ln p_ij with the stationary weight
    taken as the EMPIRICAL transition mass (π_i·p_ij = n_ij/N — exact,
    and the MLE), in nats and bits — 'how many bits does the next
    action carry given the last one?', the one-number summary of
    ``events_markov_transitions``' matrix that monitors journey
    predictability drift (a UX change that makes behavior more
    deterministic drops it).

    Exactness: counts are exact BIGINTs from the same single window
    pass as the transition entries; each −(n_ij/N)·ln(n_ij/n_i·) term
    quantizes to a nano-grid integer before the order-free sum.

    Scale shape: one per-user window pass (shared shape with the
    Markov family), a states²-row frame, a 1-row total broadcast, one
    reduce."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    cnt = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint(eager=True)  # states²; feeds row totals AND terms
    rowt = cnt.groupBy("src").agg(F.sum("n").cast("bigint").alias("row_n"))
    tot = cnt.agg(F.sum("n").cast("bigint").alias("t"))
    term = (
        -(F.col("n").cast("double") / F.col("t"))
        * F.ln(F.col("n").cast("double") / F.col("row_n"))
    )
    h = (
        cnt.join(F.broadcast(rowt), "src")
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.round(term * 1e9).cast("bigint")).cast("bigint").alias("h9"),
            F.max("t").alias("t"),
        )
    )
    return h.select(
        F.col("t").alias("n_transitions"),
        F.round(F.col("h9").cast("double") / 1e9, 9).alias("entropy_rate_nats"),
        # divide by the ENGINE's ln(2.0), mirroring the oracle text — a
        # Python literal could sit 1 ulp off the engine's computation
        F.round(F.col("h9").cast("double") / 1e9 / F.ln(F.lit(2.0)), 9).alias(
            "entropy_rate_bits"
        ),
    )


# --------------------------------------------------------------------------
# Generalized ESD: iterative most-extreme-day removal (k rounds, zero
# driver state — the whole recursion is one lazy plan)
# --------------------------------------------------------------------------

_ESD_K = 5


def _sql_esd() -> str:
    base = """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS x
  FROM lineitem GROUP BY 1
)"""
    ctes = [base]
    prev_excl = ""
    for r in range(1, _ESD_K + 1):
        excl = (
            "WHERE d NOT IN (" + " UNION ALL ".join(
                f"SELECT d FROM p{j}" for j in range(1, r)
            ) + ")"
            if r > 1
            else ""
        )
        ctes.append(f"""
rem{r} AS (SELECT d, x FROM daily {excl}),
m{r} AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
  FROM rem{r}
),
mm{r} AS (
  SELECT n, sx / n AS mean,
         sqrt((sxx - n * (sx / n) * (sx / n)) / (n - 1)) AS sd
  FROM m{r}
),
p{r} AS (
  SELECT {r} AS round, d, x,
         abs(x - mean) / sd AS r_stat
  FROM rem{r}, mm{r}
  ORDER BY abs(x - mean) / sd DESC, d LIMIT 1
)""")
        prev_excl = excl
    picks = " UNION ALL ".join(f"SELECT * FROM p{r}" for r in range(1, _ESD_K + 1))
    return (
        ",".join(ctes)
        + f"""
SELECT CAST(round AS BIGINT) AS esd_round, d, x,
       round(r_stat, 9) AS r_stat
FROM ({picks}) ORDER BY esd_round
"""
    )


@register(
    "stats_esd_outliers",
    oracle=_sql_esd(),
    tags=("stats", "outlier", "esd", "iterative"),
)
def stats_esd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD (Rosner) outlier sequence on the daily revenue
    series: 5 rounds of 'remove the most-studentized day, recompute the
    moments' — the multi-outlier extension of ``stats_grubbs_test``
    (whose single-shot statistic is MASKED when a second outlier
    inflates the SD; ESD's re-estimation after each removal is the
    fix, and the S-H-ESD anomaly pipeline's core loop). Each round
    reports the picked day and its studentized statistic.

    The recursion compiles to ONE LAZY PLAN — no driver loop, no
    collects: round r's frame anti-joins the union of rounds 1..r−1's
    single-row picks, its moments broadcast back (scalar idiom), and
    its pick is a TakeOrdered(1). Five rounds = five tiny stages over
    the day-grain frame; k is a compile-time constant exactly like the
    EMA depths.

    Exactness: the day frame is exact BIGINT cents; moments are exact
    DECIMAL sums; each argmax orders on the RAW studentized deviation
    (then day) before rounding."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    daily = (
        li.groupBy(F.date_trunc("day", "l_shipdate").alias("d"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * 100.0
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("x")
        )
        .localCheckpoint(eager=True)  # base of all five rounds
    )
    picks: list = []
    rem = daily
    for r in range(1, _ESD_K + 1):
        xd = F.col("x").cast("decimal(38,0)")
        s = rem.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(xd).cast("double").alias("sx"),
            F.sum(xd * F.col("x")).cast("double").alias("sxx"),
        )
        mm = s.select(
            "n",
            (F.col("sx") / F.col("n")).alias("mean"),
            F.sqrt(
                (
                    F.col("sxx")
                    - F.col("n") * (F.col("sx") / F.col("n")) * (F.col("sx") / F.col("n"))
                )
                / (F.col("n") - 1)
            ).alias("sd"),
        )
        p = (
            rem.crossJoin(F.broadcast(mm))
            .orderBy(F.desc(F.abs(F.col("x") - F.col("mean")) / F.col("sd")), "d")
            .limit(1)
            .select(
                F.lit(r).cast("bigint").alias("esd_round"),
                "d",
                "x",
                F.round(F.abs(F.col("x") - F.col("mean")) / F.col("sd"), 9).alias(
                    "r_stat"
                ),
            )
        )
        picks.append(p)
        rem = rem.join(p.select("d"), "d", "left_anti")
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.orderBy("esd_round")


# --------------------------------------------------------------------------
# Forward as-of join (pandas merge_asof direction='forward')
# --------------------------------------------------------------------------


@register(
    "join_asof_forward",
    oracle="""
WITH e AS (
  SELECT user_id, ts, arg_min(value, event_id) AS value,
         -epoch_us(ts) AS nts
  FROM events GROUP BY user_id, ts
),
o AS (
  SELECT o_orderkey, o_custkey, -epoch_us(o_orderdate) AS nod FROM orders
)
SELECT o.o_orderkey AS o_orderkey, o.o_custkey AS user_id,
       e.value AS value_asof_next
FROM o ASOF LEFT JOIN e ON o.o_custkey = e.user_id AND e.nts <= o.nod
ORDER BY o_orderkey
""",
    tags=("asof-join", "point-in-time", "forward"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each order, the value of that user's
    EARLIEST event at or after the order date — the 'next observation
    after the decision' lookup (label attribution, treatment-response,
    next-touch) that mirrors ``asof_join_last_event``'s point-in-time
    feature lookup. Spark runs the union-sentinel merge flipped to a
    [current, following) frame (operators.asof.asof_join_next — one
    shuffle, no row explosion); the oracle runs DuckDB's NATIVE ASOF
    JOIN on NEGATED epoch timestamps (DuckDB's ASOF is backward-only;
    time negation turns 'earliest at-or-after' into 'latest at-or-
    before'), so the two implementations stay genuinely independent.
    Equal-time right rows pre-reduce with arg_min on event_id (the
    forward mirror of the backward entry's arg_max)."""
    from .operators.asof import asof_join_next

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    events = _t(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    return (
        asof_join_next(
            orders, events, "user_id", "o_orderdate", "ts", "value", right_seq="event_id"
        )
        .select("o_orderkey", "user_id", F.col("value_asof_next"))
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Seasonal Mann-Kendall trend test (day-of-week seasons) on daily revenue
# --------------------------------------------------------------------------


def _sql_seasonal_mk() -> str:
    return """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS day, isodow(l_shipdate) AS g,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS v
  FROM lineitem GROUP BY 1, 2
),
pairs AS (
  SELECT a.g,
         CAST(sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END)
              AS BIGINT) AS s_g
  FROM daily a JOIN daily b ON a.g = b.g AND a.day < b.day
  GROUP BY 1
),
ties AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CAST(c AS HUGEINT) * (c - 1) * (2 * c + 5)) AS BIGINT) AS tv
  FROM (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM daily GROUP BY 1, 2)
  GROUP BY 1
),
per AS (
  SELECT p.g, t.n_g, p.s_g,
         (CAST(t.n_g AS DOUBLE) * (t.n_g - 1) * (2 * t.n_g + 5) - t.tv) / 18.0
           AS var_g
  FROM pairs p JOIN ties t USING (g)
),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n_days,
         CAST(count(*) AS BIGINT) AS n_seasons,
         CAST(sum(s_g) AS BIGINT) AS s_stat,
         sum(var_g) AS var_s
  FROM per
)
SELECT n_days, n_seasons, s_stat, round(var_s, 6) AS var_s,
       round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                  ELSE 0.0 END, 6) AS z
FROM tot
"""


@register(
    "ts_seasonal_mann_kendall",
    oracle=_sql_seasonal_mk(),
    tags=("timeseries", "stats", "trend", "seasonal"),
)
def ts_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall (Hirsch-Slack) on daily revenue with
    day-of-week seasons: Kendall's S computed WITHIN each weekday
    stream (Monday vs other Mondays, never Monday vs Saturday), summed
    with summed tie-corrected variances and the continuity-corrected z
    — the trend test that a weekly cycle cannot fool, where the plain
    ``ts_mann_kendall_trend`` counts every weekend-vs-weekday pair as
    (anti-)trend evidence. The standard hydrology/KPI long-run monotone
    trend readout.

    Exactness: daily totals are exact BIGINT cents; every S_g and tie
    term is integer (HUGEINT/DECIMAL-safe); z is one closed-form
    double.

    Scale shape: pair enumeration joins WITHIN seasons on the
    day-grain pre-aggregate — (days/7)² per season, bounded by the
    horizon, never raw rows; the season frames then reduce to 7 rows
    and one total."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    daily = li.groupBy(
        F.date_trunc("day", "l_shipdate").alias("day"),
        F.dayofweek("l_shipdate").alias("g"),  # grouping key only; any
        # fixed weekday numbering partitions the days identically
    ).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("v")
    ).localCheckpoint(eager=True)  # feeds pairs AND ties
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.day") < F.col("b.day")))
        .groupBy(F.col("a.g").alias("g"))
        .agg(
            F.sum(
                F.when(F.col("b.v") > F.col("a.v"), 1)
                .when(F.col("b.v") < F.col("a.v"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_g")
        )
    )
    ch = F.col("c").cast("decimal(38,0)")
    ties = (
        daily.groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .groupBy("g")
        .agg(
            F.sum("c").cast("bigint").alias("n_g"),
            F.sum(ch * (F.col("c") - 1) * (2 * F.col("c") + 5))
            .cast("bigint")
            .alias("tv"),
        )
    )
    per = pairs.join(ties, "g").select(
        "g",
        "n_g",
        "s_g",
        (
            (
                F.col("n_g").cast("double")
                * (F.col("n_g") - 1)
                * (2 * F.col("n_g") + 5)
                - F.col("tv")
            )
            / 18.0
        ).alias("var_g"),
    )
    tot = per.agg(
        F.sum("n_g").cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_seasons"),
        F.sum("s_g").cast("bigint").alias("s_stat"),
        F.sum("var_g").alias("var_s"),
    )
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")),
        )
        .otherwise(F.lit(0.0))
    )
    return tot.select(
        "n_days",
        "n_seasons",
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.round(z, 6).alias("z"),
    )

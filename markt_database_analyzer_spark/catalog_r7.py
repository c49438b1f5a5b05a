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
    base = docs.select("lang", tx.tokens("text").alias("toks"))
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
    )
    deg = (
        e.select(F.col("x").alias("node"))
        .unionAll(e.select(F.col("y").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
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

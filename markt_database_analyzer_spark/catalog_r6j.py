"""Round-6 additions, part 10: risk-adjusted return ratios, Wilson
score intervals, and query-likelihood retrieval with Dirichlet
smoothing.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle) pairs with identical semantics — exact-integer daily /
per-group sufficient statistics, nano-quantized log terms before any
cross-row sum, identical double expression text — hash-compared at
sf0.01 by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .catalog_r3c import _BM25_TERMS, _SQL_TOKENS, _tokens

# --------------------------------------------------------------------------
# Sharpe / Sortino ratios of the daily revenue series
# --------------------------------------------------------------------------

_ANN = 252.0  # trading-day annualization


def _sql_sharpe() -> str:
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
r AS (
  SELECT CAST(round(ln(CAST(x AS DOUBLE) / xp) * 1e9) AS BIGINT) AS rq
  FROM led WHERE xp IS NOT NULL
),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS nr,
         CAST(sum(CAST(rq AS HUGEINT)) AS DOUBLE) AS sr,
         CAST(sum(CAST(rq AS HUGEINT) * rq) AS DOUBLE) AS srr,
         CAST(sum(CASE WHEN rq < 0 THEN CAST(rq AS HUGEINT) * rq
                       ELSE 0 END) AS DOUBLE) AS sdd
  FROM r
),
m AS (
  SELECT nr, sr / nr / 1e9 AS mr,
         sqrt((srr / 1e18 - nr * (sr / nr / 1e9) * (sr / nr / 1e9)) / (nr - 1))
           AS sd,
         sqrt(sdd / 1e18 / nr) AS dsd
  FROM s
)
SELECT CAST(nr AS BIGINT) AS n_returns,
       round(mr, 9) AS mean_daily_ret,
       round(mr / sd * sqrt({_ANN}), 6) AS sharpe,
       round(mr / dsd * sqrt({_ANN}), 6) AS sortino
FROM m
"""


@register(
    "finance_sharpe_sortino",
    oracle=_sql_sharpe(),
    tags=("finance", "timeseries", "risk", "stats"),
)
def finance_sharpe_sortino(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annualized Sharpe and Sortino ratios of the daily discounted-
    revenue log-return series (zero risk-free rate, sqrt(252)
    annualization; Sortino uses the downside deviation about a zero
    target — the risk measure that does not punish upside variance).
    Completes the finance family next to ``finance_max_drawdown`` /
    ``finance_rsi_sma`` / ``ts_bollinger_bands``.

    Exactness: daily revenue totals are exact integer cents; each
    log-return is nano-quantized, so all four moments (n, sum, sum of
    squares, downside sum of squares) are exact HUGEINT/decimal
    integers and the two ratios are single double expressions with
    identical association order.

    Scale shape: one map-side-combined daily aggregate is the only
    data-sized stage; the lag window and moments run over the
    day-grain frame (~years x 365 rows at any corpus size)."""
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
    r = led.filter(F.col("xp").isNotNull()).select(
        F.round(F.log(F.col("x").cast("double") / F.col("xp")) * 1e9)
        .cast("bigint")
        .alias("rq")
    )
    rd = F.col("rq").cast("decimal(38,0)")
    s = r.agg(
        F.count(F.lit(1)).cast("double").alias("nr"),
        F.sum(rd).cast("double").alias("sr"),
        F.sum(rd * F.col("rq")).cast("double").alias("srr"),
        F.sum(F.when(F.col("rq") < 0, rd * F.col("rq")).otherwise(F.lit(0)))
        .cast("double")
        .alias("sdd"),
    )
    mr = F.col("sr") / F.col("nr") / 1e9
    m = s.select(
        "nr",
        mr.alias("mr"),
        F.sqrt(
            (F.col("srr") / 1e18 - F.col("nr") * mr * mr) / (F.col("nr") - 1)
        ).alias("sd"),
        F.sqrt(F.col("sdd") / 1e18 / F.col("nr")).alias("dsd"),
    )
    return m.select(
        F.col("nr").cast("bigint").alias("n_returns"),
        F.round("mr", 9).alias("mean_daily_ret"),
        F.round(F.col("mr") / F.col("sd") * F.sqrt(F.lit(_ANN)), 6).alias("sharpe"),
        F.round(F.col("mr") / F.col("dsd") * F.sqrt(F.lit(_ANN)), 6).alias(
            "sortino"
        ),
    )


# --------------------------------------------------------------------------
# Wilson score intervals for per-nation proportions
# --------------------------------------------------------------------------

_WILSON_Z = 1.96
_WILSON_THRESHOLD = 5000.0


def _sql_wilson() -> str:
    z = _WILSON_Z
    return f"""
WITH g AS (
  SELECT c_nationkey,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(count(*) FILTER (WHERE c_acctbal > {_WILSON_THRESHOLD})
              AS DOUBLE) AS k
  FROM customer GROUP BY 1
),
w AS (
  SELECT c_nationkey, n, k, k / n AS p,
         1.0 + {z} * {z} / n AS dn,
         (k / n + {z} * {z} / (2.0 * n)) AS ctr,
         {z} * sqrt((k / n) * (1.0 - k / n) / n
                    + {z} * {z} / (4.0 * n * n)) AS hw
  FROM g
)
SELECT CAST(c_nationkey AS INT) AS nationkey,
       CAST(n AS BIGINT) AS n_customers, CAST(k AS BIGINT) AS k_high,
       round(p, 6) AS p_hat,
       round((ctr - hw) / dn, 6) AS ci_lo,
       round((ctr + hw) / dn, 6) AS ci_hi
FROM w ORDER BY nationkey
"""


@register(
    "stats_wilson_ci_by_nation",
    oracle=_sql_wilson(),
    tags=("stats", "proportion", "confidence-interval"),
)
def stats_wilson_ci_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for each nation's
    high-balance customer share (acctbal > 5000) — the interval of
    choice for proportions (never escapes [0,1], stays calibrated at
    small n and extreme p where the Wald interval collapses); the
    per-segment readout dashboards should use instead of p ± 1.96 se.

    Exactness: n and k are exact counts; center, half-width and the
    denominator 1 + z^2/n are single double expressions with identical
    association order on both engines — no iteration, no special
    functions beyond sqrt.

    Scale shape: ONE map-side-combined FILTERed groupBy(nation); the
    interval algebra is row-local on the 25-row group frame. Nothing
    else — the cheapest possible per-segment readout plan."""
    cust = _t(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(F.when(F.col("c_acctbal") > _WILSON_THRESHOLD, F.lit(1)))
        .cast("double")
        .alias("k"),
    )
    z = F.lit(_WILSON_Z)
    p = F.col("k") / F.col("n")
    dn = F.lit(1.0) + z * z / F.col("n")
    ctr = F.col("k") / F.col("n") + z * z / (F.lit(2.0) * F.col("n"))
    hw = z * F.sqrt(
        (F.col("k") / F.col("n")) * (F.lit(1.0) - F.col("k") / F.col("n"))
        / F.col("n")
        + z * z / (F.lit(4.0) * F.col("n") * F.col("n"))
    )
    w = g.select(
        "c_nationkey",
        "n",
        "k",
        p.alias("p"),
        dn.alias("dn"),
        ctr.alias("ctr"),
        hw.alias("hw"),
    )
    return w.select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("k").cast("bigint").alias("k_high"),
        F.round("p", 6).alias("p_hat"),
        F.round((F.col("ctr") - F.col("hw")) / F.col("dn"), 6).alias("ci_lo"),
        F.round((F.col("ctr") + F.col("hw")) / F.col("dn"), 6).alias("ci_hi"),
    ).orderBy("nationkey")


# --------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing
# --------------------------------------------------------------------------

_QL_MU = 2000.0
_QL_TOP = 20


def _sql_ql() -> str:
    return f"""
WITH toks AS ({_SQL_TOKENS}),
dl AS (
  SELECT d.doc_id, CAST(coalesce(t.n, 0) AS BIGINT) AS dl
  FROM documents d LEFT JOIN
       (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id) t USING (doc_id)
),
ctot AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
cf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cf FROM toks
  WHERE w IN {_BM25_TERMS!r} GROUP BY w
),
kq AS (
  SELECT CAST(count(*) AS BIGINT) AS nq,
         CAST(sum(CAST(round(ln({_QL_MU} * (CAST(cf AS DOUBLE) / ct)) * 1e9)
                       AS BIGINT)) AS BIGINT) AS kq
  FROM cf, ctot
),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE w IN {_BM25_TERMS!r} GROUP BY doc_id, w
),
sd AS (
  SELECT t.doc_id,
         CAST(sum(CAST(round((ln(t.tf + {_QL_MU} * (CAST(c.cf AS DOUBLE) / ct))
                              - ln({_QL_MU} * (CAST(c.cf AS DOUBLE) / ct)))
                             * 1e9) AS BIGINT)) AS BIGINT) AS sd
  FROM tf t JOIN cf c USING (w) CROSS JOIN ctot
  GROUP BY t.doc_id
),
scored AS (
  SELECT d.doc_id,
         round(CAST(coalesce(s.sd, 0) + k.kq AS DOUBLE) / 1e9
               - k.nq * ln(d.dl + {_QL_MU}), 9) AS ql_score
  FROM dl d LEFT JOIN sd s USING (doc_id) CROSS JOIN kq k
)
SELECT doc_id, ql_score FROM scored
ORDER BY ql_score DESC, doc_id LIMIT {_QL_TOP}
"""


@register(
    "search_query_likelihood_dirichlet",
    oracle=_sql_ql(),
    tags=("search", "language-model", "dirichlet", "ranking"),
)
def search_query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty) for the catalog's fixed query — the probabilistic-IR twin
    of ``search_bm25_topk``: score(d) = sum_q ln((tf + mu*P(w|C)) /
    (dl + mu)), mu=2000, decomposed into the standard efficient form
    sum over PRESENT terms of [ln(tf + mu*p_w) - ln(mu*p_w)] plus a
    doc-independent constant sum_q ln(mu*p_w) minus |q|*ln(dl + mu) —
    so only posting lists for the query terms are ever touched, yet
    every document (even with zero query terms) receives its smoothed
    score.

    Exactness: collection statistics are exact integer counts; every
    per-(doc,term) log contribution and the query constant are
    nano-quantized before integer summation; the per-doc closing
    expression is written with identical association order. Query terms
    absent from the corpus drop out of the model (nq counts only
    cf > 0 terms), avoiding ln(0).

    Scale shape: identical to BM25 — corpus-sized work is the doclen
    build and token-total; scoring touches the <=3 posting lists
    (filtered before the shuffle), the query model is a <=3-row
    broadcast, the spine left join distributes on doc_id, and the
    top-20 is TakeOrdered."""
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(docs).localCheckpoint(eager=True)
    dl = (
        docs.select("doc_id")
        .join(
            toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("dl")
        )
    )
    ctot = toks.agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    qtoks = toks.filter(F.col("w").isin(*_BM25_TERMS))
    cf = qtoks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("cf"))
    pw = F.lit(_QL_MU) * (F.col("cf").cast("double") / F.col("ct"))
    kq = (
        cf.crossJoin(F.broadcast(ctot))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nq"),
            F.sum(F.round(F.log(pw) * 1e9).cast("bigint"))
            .cast("bigint")
            .alias("kq"),
        )
    )
    tf = qtoks.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    contrib = F.log(F.col("tf") + pw) - F.log(pw)
    sd = (
        tf.join(F.broadcast(cf), "w")
        .crossJoin(F.broadcast(ctot))
        .groupBy("doc_id")
        .agg(
            F.sum(F.round(contrib * 1e9).cast("bigint"))
            .cast("bigint")
            .alias("sd")
        )
    )
    scored = (
        dl.join(sd, "doc_id", "left")
        .crossJoin(F.broadcast(kq))
        .select(
            "doc_id",
            F.round(
                (F.coalesce(F.col("sd"), F.lit(0)) + F.col("kq")).cast("double")
                / 1e9
                - F.col("nq") * F.log(F.col("dl") + F.lit(_QL_MU)),
                9,
            ).alias("ql_score"),
        )
    )
    return scored.orderBy(F.desc("ql_score"), "doc_id").limit(_QL_TOP)

"""Round-6 additions, part 8: two-pass pseudo-relevance-feedback
retrieval, partial autocorrelation via Yule-Walker / Durbin-Levinson,
and delete-one-block jackknife standard errors for ratio metrics.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle) pairs with identical semantics — shared tokenization
convention with the BM25/postings entries, exact-integer sufficient
statistics, nano-quantized terms before any cross-row sum of doubles,
and total orderings at every row selection — hash-compared at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, register, _t
from .catalog_r3c import _BM25_B, _BM25_K1, _BM25_TERMS, _SQL_TOKENS, _tokens
from .functions import dsum

# --------------------------------------------------------------------------
# Pseudo-relevance feedback (two-pass BM25 with query expansion)
# --------------------------------------------------------------------------

_PRF_FB_DOCS = 10  # feedback set size from pass 1
_PRF_EXP_TERMS = 5  # expansion terms added to the query
_PRF_EXP_WEIGHT = 0.5  # weight of expansion terms in pass 2
_PRF_TOP = 20
_PRF_MIN_FB_DF = 2  # expansion term must appear in >= 2 feedback docs
_PRF_MIN_LEN = 3


def _sql_bm25_score(tf: str, df: str, dl: str, nd: str, avgdl: str) -> str:
    """BM25 term score with the catalog's association order (matches
    catalog_r3c's expression text)."""
    return f"""
           ln(1.0 + (CAST({nd} - {df} AS DOUBLE) + 0.5) / (CAST({df} AS DOUBLE) + 0.5))
           * ((CAST({tf} AS DOUBLE) * {_BM25_K1 + 1.0}) /
              (CAST({tf} AS DOUBLE)
               + {_BM25_K1} * (1.0 - {_BM25_B}
                               + {_BM25_B} * (CAST({dl} AS DOUBLE) / {avgdl}))))"""


def _sql_prf() -> str:
    score1 = _sql_bm25_score("t.tf", "i.df", "d.dl", "s.nd", "s.avgdl")
    score2 = _sql_bm25_score("t.tf", "i.df", "d.dl", "s.nd", "s.avgdl")
    return f"""
WITH toks AS ({_SQL_TOKENS}),
dl AS (
  SELECT d.doc_id, CAST(coalesce(t.n, 0) AS BIGINT) AS dl
  FROM documents d LEFT JOIN
       (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id) t USING (doc_id)
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
tf1 AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE w IN {_BM25_TERMS!r}
  GROUP BY doc_id, w
),
idf1 AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf1 GROUP BY w),
pass1 AS (
  SELECT t.doc_id,
         {SQL_DSUM.format(x=score1)} AS score
  FROM tf1 t JOIN idf1 i USING (w) JOIN dl d USING (doc_id) CROSS JOIN stats s
  GROUP BY t.doc_id
),
fb AS (
  SELECT doc_id FROM pass1 ORDER BY score DESC, doc_id LIMIT {_PRF_FB_DOCS}
),
cdf AS (
  SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY w
),
fbdf AS (
  SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS fb_df
  FROM toks JOIN fb USING (doc_id)
  WHERE len(w) >= {_PRF_MIN_LEN} AND w NOT IN {_BM25_TERMS!r}
  GROUP BY w
),
exp_terms AS (
  SELECT w, 0.5 AS wt FROM (
    SELECT f.w,
           row_number() OVER (
             ORDER BY CAST(f.fb_df AS DOUBLE)
                      * ln((CAST(s.nd AS DOUBLE) + 1.0) / (CAST(c.df AS DOUBLE) + 1.0))
                      DESC, f.w) AS r
    FROM fbdf f JOIN cdf c USING (w) CROSS JOIN stats s
    WHERE f.fb_df >= {_PRF_MIN_FB_DF}
  ) WHERE r <= {_PRF_EXP_TERMS}
),
qmodel AS (
  SELECT w, wt FROM exp_terms
  UNION ALL
  SELECT unnest({list(_BM25_TERMS)!r}) AS w, 1.0 AS wt
),
tf2 AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM toks
  JOIN (SELECT w FROM qmodel) USING (w)
  GROUP BY doc_id, w
),
idf2 AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY w),
pass2 AS (
  SELECT t.doc_id,
         {SQL_DSUM.format(x=f"q.wt * ({score2})")} AS score
  FROM tf2 t JOIN idf2 i USING (w) JOIN qmodel q USING (w)
  JOIN dl d USING (doc_id) CROSS JOIN stats s
  GROUP BY t.doc_id
)
SELECT doc_id, score AS prf_score FROM pass2
ORDER BY score DESC, doc_id LIMIT {_PRF_TOP}
"""


@register(
    "search_pseudo_relevance_feedback",
    oracle=_sql_prf(),
    tags=("search", "bm25", "prf", "query-expansion", "ranking"),
)
def search_pseudo_relevance_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass pseudo-relevance-feedback retrieval (Rocchio/RM-style):
    pass 1 runs the catalog's BM25 for the fixed query, takes the
    top-10 documents as the feedback set, mines the top-5 expansion
    terms by fb_df * ln((N+1)/(df+1)) (appearing in >= 2 feedback docs,
    length >= 3, original terms excluded), then pass 2 re-scores the
    corpus with the expanded weighted query (originals at 1.0,
    expansions at 0.5) and returns the fused top-20. This is the
    classic recall-booster layered on `search_bm25_topk`.

    Exactness: both ranked cuts (feedback set, expansion terms) are
    total orders with doc_id / term tiebreaks; expansion scores are
    ln() over exact integer counts; pass-2 term contributions reuse the
    BM25 expression text verbatim and micro-quantize before the per-doc
    sum (dsum), so both engines fuse identical doubles.

    Scale shape: the corpus-sized work is one token-stream groupBy
    (document-frequency build — the inverted-index pass) plus two
    posting-list scoring passes, each filtered to the query model
    BEFORE the shuffle by a broadcast join on term (<= 8 terms). The
    query model itself is a 10-row top-k and a 5-row top-k — driver
    never sees data, both cuts are TakeOrdered."""
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
        .localCheckpoint(eager=True)
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    def bm25_score() -> F.Column:
        k1, b = _BM25_K1, _BM25_B
        return F.log(
            1.0
            + ((F.col("nd") - F.col("df")).cast("double") + 0.5)
            / (F.col("df").cast("double") + 0.5)
        ) * (
            (F.col("tf").cast("double") * F.lit(k1 + 1.0))
            / (
                F.col("tf").cast("double")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
                )
            )
        )

    def score_pass(term_frame: DataFrame) -> DataFrame:
        # wt = 1.0 multiplies exactly in IEEE, so the unweighted pass-1
        # oracle (no wt factor) still matches bit-for-bit.
        tf = (
            toks.join(F.broadcast(term_frame), "w")
            .groupBy("doc_id", "w")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("tf"),
                F.first("wt").alias("wt"),
            )
        )
        idf = tf.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        return (
            tf.join(F.broadcast(idf), "w")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats))
            .groupBy("doc_id")
            .agg(dsum(F.col("wt") * bm25_score()).alias("score"))
        )

    q1 = spark.createDataFrame([(w, 1.0) for w in _BM25_TERMS], ["w", "wt"])
    pass1 = score_pass(q1)
    fb = pass1.orderBy(F.desc("score"), "doc_id").limit(_PRF_FB_DOCS).select("doc_id")
    fbdf = (
        toks.join(F.broadcast(fb), "doc_id")
        .filter(
            (F.length("w") >= _PRF_MIN_LEN) & (~F.col("w").isin(*_BM25_TERMS))
        )
        .groupBy("w")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("fb_df"))
        .filter(F.col("fb_df") >= _PRF_MIN_FB_DF)
    )
    # Corpus document frequencies are only ever read for feedback-doc
    # terms, so semi-filter the token stream by that (broadcast, <=
    # feedback vocabulary) term set BEFORE the countDistinct — the
    # oracle's full-vocabulary cdf CTE is the semantic spec; the values
    # used are identical, the aggregation state shrinks from |corpus
    # vocab| to |feedback vocab|.
    cdf = (
        toks.join(F.broadcast(fbdf.select("w")), "w")
        .groupBy("w")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("df"))
    )
    exp_score = F.col("fb_df").cast("double") * F.log(
        (F.col("nd").cast("double") + 1.0) / (F.col("df").cast("double") + 1.0)
    )
    ranked = (
        fbdf.join(cdf, "w")
        .crossJoin(F.broadcast(stats))
        .select("w", exp_score.alias("es"))
        .orderBy(F.desc("es"), "w")
        .limit(_PRF_EXP_TERMS)
    )
    exp_terms = ranked.select("w", F.lit(_PRF_EXP_WEIGHT).alias("wt"))
    qmodel = exp_terms.unionByName(
        spark.createDataFrame([(w, 1.0) for w in _BM25_TERMS], ["w", "wt"])
    )
    pass2 = score_pass(qmodel)
    return (
        pass2.orderBy(F.desc("score"), "doc_id")
        .limit(_PRF_TOP)
        .select("doc_id", F.col("score").alias("prf_score"))
    )


# --------------------------------------------------------------------------
# Partial autocorrelation (Yule-Walker via Durbin-Levinson, lags 1..3)
# --------------------------------------------------------------------------


def _sql_pacf() -> str:
    leads = ", ".join(f"lead(x, {k}) OVER (ORDER BY d) AS x{k}" for k in (1, 2, 3))
    nums = ",\n    ".join(
        f"CAST(sum(CAST(round((x - xbar) * (x{k} - xbar) * 1e9) AS BIGINT)) AS BIGINT)"
        f" AS num{k}"
        for k in (1, 2, 3)
    )
    return f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(x) AS DOUBLE) / count(*) AS xbar
  FROM daily
),
led AS (SELECT x, xbar, n_days, {leads} FROM daily, m),
s AS (
  SELECT any_value(n_days) AS n_days,
    CAST(sum(CAST(round((x - xbar) * (x - xbar) * 1e9) AS BIGINT)) AS BIGINT) AS denom,
    {nums}
  FROM led
),
r AS (
  SELECT n_days,
         CAST(num1 AS DOUBLE) / denom AS r1,
         CAST(num2 AS DOUBLE) / denom AS r2,
         CAST(num3 AS DOUBLE) / denom AS r3
  FROM s
),
l2 AS (
  SELECT n_days, r1, r2, r3,
         (r2 - r1 * r1) / (1.0 - r1 * r1) AS ph22
  FROM r
),
l3 AS (
  SELECT n_days, r1, r2, r3, ph22,
         r1 - ph22 * r1 AS ph21
  FROM l2
)
SELECT n_days,
       round(r1, 6) AS acf1, round(r2, 6) AS acf2, round(r3, 6) AS acf3,
       round(r1, 6) AS pacf1,
       round(ph22, 6) AS pacf2,
       round((r3 - ph21 * r2 - ph22 * r1)
             / (1.0 - ph21 * r1 - ph22 * r2), 6) AS pacf3
FROM l3
"""


@register(
    "ts_pacf_yule_walker",
    oracle=_sql_pacf(),
    tags=("timeseries", "pacf", "yule-walker", "stats"),
)
def ts_pacf_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of the daily event-count series at lags
    1..3 via the Yule-Walker equations solved by the Durbin-Levinson
    recursion (unrolled: phi_11 = r1; phi_22 = (r2 - r1^2)/(1 - r1^2);
    phi_33 from the level-2 prediction coefficients) — the AR-order
    diagnostic that complements ``ts_autocorrelation``'s ACF: PACF
    cutting off after lag p is the signature of an AR(p) process.

    Exactness: the daily series is integer counts; every lag product
    (x_t - xbar)(x_{t+k} - xbar) is nano-quantized before summing (the
    ACF-entry discipline) so r1..r3 are ratios of exact integers; the
    recursion algebra is written with identical association order on
    both engines.

    Scale shape: the corpus-sized work is one map-side-combined daily
    count; the ordered lead window and the recursion run over the
    series frame (cardinality = days). At 100 TB a 10-year horizon is
    ~3.7k points — the window never touches raw events."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("xbar"),
    )
    w = Window.orderBy("d")
    led = daily.crossJoin(F.broadcast(m)).select(
        "x",
        "xbar",
        "n_days",
        *[F.lead("x", k).over(w).alias(f"x{k}") for k in (1, 2, 3)],
    )

    def qprod(a, b):
        return F.sum(
            F.round((a - F.col("xbar")) * (b - F.col("xbar")) * 1e9).cast("bigint")
        )

    s = led.agg(
        F.any_value("n_days").alias("n_days"),
        qprod(F.col("x"), F.col("x")).alias("denom"),
        *[qprod(F.col("x"), F.col(f"x{k}")).alias(f"num{k}") for k in (1, 2, 3)],
    )
    r = s.select(
        "n_days",
        *[
            (F.col(f"num{k}").cast("double") / F.col("denom")).alias(f"r{k}")
            for k in (1, 2, 3)
        ],
    )
    l2 = r.select(
        "*",
        (
            (F.col("r2") - F.col("r1") * F.col("r1"))
            / (F.lit(1.0) - F.col("r1") * F.col("r1"))
        ).alias("ph22"),
    )
    l3 = l2.select(
        "*", (F.col("r1") - F.col("ph22") * F.col("r1")).alias("ph21")
    )
    pacf3 = (
        F.col("r3") - F.col("ph21") * F.col("r2") - F.col("ph22") * F.col("r1")
    ) / (
        F.lit(1.0) - F.col("ph21") * F.col("r1") - F.col("ph22") * F.col("r2")
    )
    return l3.select(
        "n_days",
        F.round("r1", 6).alias("acf1"),
        F.round("r2", 6).alias("acf2"),
        F.round("r3", 6).alias("acf3"),
        F.round("r1", 6).alias("pacf1"),
        F.round("ph22", 6).alias("pacf2"),
        F.round(pacf3, 6).alias("pacf3"),
    )


# --------------------------------------------------------------------------
# Delete-one-block jackknife SE for a ratio metric
# --------------------------------------------------------------------------


def _sql_jackknife() -> str:
    return """
WITH q AS (
  SELECT date_trunc('month', l_shipdate) AS blk,
         CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS a,
         CAST(round(l_quantity * 100.0) AS BIGINT) AS b
  FROM lineitem
),
g AS (
  SELECT blk,
         CAST(sum(CAST(a AS HUGEINT)) AS DOUBLE) AS a_g,
         CAST(sum(CAST(b AS HUGEINT)) AS DOUBLE) AS b_g
  FROM q GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS gg,
         CAST(sum(a_g) AS DOUBLE) AS sa,
         CAST(sum(b_g) AS DOUBLE) AS sb
  FROM g
),
loo AS (
  SELECT gg, sa, sb,
         CAST(round((sa - a_g) / (sb - b_g) * 1e9) AS BIGINT) AS rq
  FROM g, tot
),
jk AS (
  SELECT any_value(gg) AS gg, any_value(sa) AS sa, any_value(sb) AS sb,
         CAST(sum(rq) AS DOUBLE) / count(*) / 1e9 AS rbar,
         list(rq ORDER BY rq) AS rqs
  FROM loo
),
dev AS (
  SELECT gg, sa, sb, rbar,
         CAST(sum(CAST(round(
           (CAST(u.r AS DOUBLE) / 1e9 - rbar)
           * (CAST(u.r AS DOUBLE) / 1e9 - rbar) * 1e15) AS HUGEINT)) AS DOUBLE)
           AS ssq
  FROM jk, unnest(rqs) AS u(r)
  GROUP BY gg, sa, sb, rbar
)
SELECT gg AS n_blocks,
       round(sa / sb, 6) AS ratio,
       round(sqrt((gg - 1.0) / gg * ssq / 1e15), 9) AS jack_se,
       round(sa / sb - 1.96 * sqrt((gg - 1.0) / gg * ssq / 1e15), 6) AS ci_lo,
       round(sa / sb + 1.96 * sqrt((gg - 1.0) / gg * ssq / 1e15), 6) AS ci_hi
FROM dev
"""


@register(
    "stats_jackknife_ratio_se",
    oracle=_sql_jackknife(),
    tags=("stats", "jackknife", "resampling", "ratio-metric"),
)
def stats_jackknife_ratio_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-block jackknife standard error for a ratio metric —
    the RNG-free resampling twin of ``stats_bootstrap_ci``, and the
    estimator production metric pipelines use for ratio KPIs (a mean of
    ratios is biased; the ratio of sums needs a resampling SE). Metric:
    discounted revenue per unit quantity over lineitem; blocks are
    shipdate months (delete-one-month leave-out, the temporal block
    form robust to within-month correlation). SE^2 = (G-1)/G *
    sum_g (R_(-g) - Rbar)^2 with R_(-g) = (Sa - a_g)/(Sb - b_g).

    Exactness: block sums are exact integer cents (HUGEINT/decimal);
    each leave-one-out ratio is nano-quantized before averaging, each
    squared deviation atto-quantized (1e18) before summing, so the
    whole jackknife reduces to exact-integer arithmetic on both
    engines.

    Scale shape: one map-side-combined groupBy(month) — the only
    data-sized stage — then all leave-one-out algebra runs on the
    G-row block frame against 1-row broadcast totals. Blocks grow with
    the time horizon, not the data: identical plan at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    q = li.select(
        F.date_trunc("month", "l_shipdate").alias("blk"),
        F.round(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0)
        .cast("bigint")
        .alias("a"),
        F.round(F.col("l_quantity") * 100.0).cast("bigint").alias("b"),
    )
    g = q.groupBy("blk").agg(
        F.sum(F.col("a").cast("decimal(38,0)")).cast("double").alias("a_g"),
        F.sum(F.col("b").cast("decimal(38,0)")).cast("double").alias("b_g"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("gg"),
        F.sum("a_g").cast("double").alias("sa"),
        F.sum("b_g").cast("double").alias("sb"),
    )
    loo = g.crossJoin(F.broadcast(tot)).select(
        "gg",
        "sa",
        "sb",
        F.round((F.col("sa") - F.col("a_g")) / (F.col("sb") - F.col("b_g")) * 1e9)
        .cast("bigint")
        .alias("rq"),
    )
    jk = loo.agg(
        F.any_value("gg").alias("gg"),
        F.any_value("sa").alias("sa"),
        F.any_value("sb").alias("sb"),
        (F.sum("rq").cast("double") / F.count(F.lit(1)) / 1e9).alias("rbar"),
    )
    dev = loo.select("rq").crossJoin(F.broadcast(jk)).agg(
        F.any_value("gg").alias("gg"),
        F.any_value("sa").alias("sa"),
        F.any_value("sb").alias("sb"),
        F.sum(
            F.round(
                (F.col("rq").cast("double") / 1e9 - F.col("rbar"))
                * (F.col("rq").cast("double") / 1e9 - F.col("rbar"))
                * 1e15
            ).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("ssq"),
    )
    gd = F.col("gg").cast("double")
    se = F.sqrt((gd - 1.0) / gd * F.col("ssq") / 1e15)
    return dev.select(
        F.col("gg").alias("n_blocks"),
        F.round(F.col("sa") / F.col("sb"), 6).alias("ratio"),
        F.round(se, 9).alias("jack_se"),
        F.round(F.col("sa") / F.col("sb") - F.lit(1.96) * se, 6).alias("ci_lo"),
        F.round(F.col("sa") / F.col("sb") + F.lit(1.96) * se, 6).alias("ci_hi"),
    )

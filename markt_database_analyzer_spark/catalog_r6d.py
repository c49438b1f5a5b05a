"""Round-6 additions, part 4: trend testing, cross-correlation, RSI,
probability scoring, and lexical-richness statistics.

Every entry follows the catalog contract — a PySpark program plus a
DuckDB oracle replaying identical semantics (same tie-breaks, same
integer/rounding grid), hash-compared at sf0.01 by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import text as tx

# --------------------------------------------------------------------------
# Mann-Kendall trend test (Kendall's S vs time, tie-corrected variance)
# --------------------------------------------------------------------------

_MK_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
),
ties AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(c AS HUGEINT) * (c - 1) * (2 * c + 5)) AS BIGINT) AS tv,
         CAST(sum(CAST(c AS HUGEINT) * (c - 1)) / 2 AS BIGINT) AS t1
  FROM (SELECT event_type, v, CAST(count(*) AS BIGINT) AS c
        FROM daily GROUP BY 1, 2)
  GROUP BY 1
),
stat AS (
  SELECT p.event_type, t.n, p.s_stat,
         (CAST(t.n AS DOUBLE) * (t.n - 1) * (2 * t.n + 5) - t.tv) / 18.0 AS var_s,
         CAST(t.n AS DOUBLE) * (t.n - 1) / 2 AS np,
         CAST(t.t1 AS DOUBLE) AS t1
  FROM pairs p JOIN ties t USING (event_type)
)
SELECT event_type, n, s_stat,
       round(var_s, 6) AS var_s,
       round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                  ELSE 0.0 END, 6) AS z,
       round(s_stat / sqrt((np - t1) * np), 9) AS tau_b
FROM stat ORDER BY event_type
"""


@register(
    "ts_mann_kendall_trend",
    oracle=_MK_SQL,
    tags=("timeseries", "stats", "trend", "rank"),
)
def ts_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per event type — Kendall's
    S = Sigma_{i<j} sign(x_j - x_i) against time over the daily-total
    series, with the tie-corrected variance (Sigma t(t-1)(2t+5) term)
    and continuity-corrected z; tau-b normalizes S by the tie-adjusted
    pair count (the time axis has no ties, so only the value-tie factor
    applies). The distribution-free trend detector that pairs with
    ``stats_theilsen_slope``'s robust magnitude estimate.

    Everything is exact integers until the final formula: daily totals
    are cents (BIGINT), sign comparisons and S are integer, tie terms
    go through HUGEINT/DECIMAL(38,0). Pair enumeration is O(days^2) per
    series ON THE DAILY PRE-AGGREGATE (the ``stats_theilsen_slope``
    discipline — days, never raw rows, bound the join), grouped by the
    series key so partitioning follows series count."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100.0).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.v") > F.col("a.v"), 1)
                .when(F.col("b.v") < F.col("a.v"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ch = F.col("c").cast("decimal(38,0)")
    ties = (
        daily.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(ch * (ch - 1) * (2 * ch + 5)).cast("bigint").alias("tv"),
            (F.sum(ch * (ch - 1)) / 2).cast("bigint").alias("t1"),
        )
    )
    st = pairs.join(ties, "event_type")
    nd = F.col("n").cast("double")
    var_s = (nd * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tv")) / 18.0
    np_ = nd * (F.col("n") - 1) / 2
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return st.select(
        "event_type",
        "n",
        "s_stat",
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.round(
            F.col("s_stat") / F.sqrt((np_ - F.col("t1").cast("double")) * np_), 9
        ).alias("tau_b"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Cross-correlation function (hourly click vs view counts, lags 0-6h)
# --------------------------------------------------------------------------

_CCF_SQL = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) / 3600 AS hour_id,
         CAST(count(*) AS BIGINT) AS c
  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1, 2
),
x AS (SELECT hour_id, c FROM hourly WHERE event_type = 'click'),
y AS (SELECT hour_id, c FROM hourly WHERE event_type = 'view'),
lags AS (SELECT unnest(range(0, 7)) AS lag),
joined AS (
  SELECT l.lag, x.c AS xc, y.c AS yc
  FROM x CROSS JOIN lags l
  JOIN y ON y.hour_id = x.hour_id + l.lag
),
stats AS (
  SELECT CAST(lag AS BIGINT) AS lag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(xc) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
         CAST(sum(CAST(xc AS HUGEINT) * xc) AS BIGINT) AS sxx,
         CAST(sum(CAST(yc AS HUGEINT) * yc) AS BIGINT) AS syy,
         CAST(sum(CAST(xc AS HUGEINT) * yc) AS BIGINT) AS sxy
  FROM joined GROUP BY 1
)
SELECT lag, n AS n_pairs,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 9)
         AS ccf
FROM stats ORDER BY lag
"""


@register(
    "ts_cross_correlation",
    oracle=_CCF_SQL,
    tags=("timeseries", "stats", "correlation", "lag"),
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function — Pearson correlation between the
    hourly click-count series and the view-count series shifted by lag
    0..6 hours (does clicking now predict viewing later?); the
    two-series generalization of ``ts_autocorrelation``, the lead-lag
    diagnostic behind marketing-mix and anomaly-propagation analyses.

    Hourly counts are exact BIGINTs keyed by integer epoch-hour, so the
    lag join is a pure integer equi-join (no timestamp arithmetic in
    the join key) and each lag's Pearson moments (n, Sigma x, Sigma y,
    Sigma x^2, Sigma y^2, Sigma xy) accumulate exactly through
    HUGEINT/DECIMAL(38,0) in one map-side-combinable pass; both engines
    then evaluate the identical IEEE correlation formula. Plan shape:
    one fact scan, a 7-row lag explode on the smaller series, an
    integer equi-join, and a 7-group combine — hours bound every
    post-scan frame at any event volume."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(
            "event_type",
            (
                F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).cast("bigint")
                / 3600
            )
            .cast("bigint")
            .alias("hour_id"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    x = hourly.filter(F.col("event_type") == "click").select(
        "hour_id", F.col("c").alias("xc")
    )
    y = hourly.filter(F.col("event_type") == "view").select(
        F.col("hour_id").alias("y_hour"), F.col("c").alias("yc")
    )
    lags = F.explode(F.array(*[F.lit(i) for i in range(7)])).alias("lag")
    joined = (
        x.select("hour_id", "xc", lags)
        .join(y, F.col("y_hour") == F.col("hour_id") + F.col("lag"))
    )
    xq = F.col("xc").cast("decimal(38,0)")
    yq = F.col("yc").cast("decimal(38,0)")
    stats = joined.groupBy(F.col("lag").cast("bigint").alias("lag")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xc").cast("bigint").alias("sx"),
        F.sum("yc").cast("bigint").alias("sy"),
        F.sum(xq * xq).cast("bigint").alias("sxx"),
        F.sum(yq * yq).cast("bigint").alias("syy"),
        F.sum(xq * yq).cast("bigint").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    ) * F.sqrt(nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    return stats.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.round(num / den, 9).alias("ccf"),
    ).orderBy("lag")


# --------------------------------------------------------------------------
# RSI (relative strength index, 14-period SMA form, per priority series)
# --------------------------------------------------------------------------

_RSI_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS priority, o_orderdate AS day,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1, 2
),
d AS (
  SELECT priority, day, v,
         v - lag(v) OVER (PARTITION BY priority ORDER BY day) AS delta
  FROM daily
),
g AS (
  SELECT priority, day,
         CAST(count(delta) OVER win AS BIGINT) AS n_deltas,
         CAST(sum(greatest(delta, 0)) OVER win AS BIGINT) AS sg,
         CAST(sum(greatest(-delta, 0)) OVER win AS BIGINT) AS sl
  FROM d
  WINDOW win AS (PARTITION BY priority ORDER BY day
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT priority, day, n_deltas,
       round(coalesce(sg, 0) / 100.0, 2) AS gain_sum,
       round(coalesce(sl, 0) / 100.0, 2) AS loss_sum,
       CASE WHEN n_deltas = 0 THEN NULL
            WHEN sg + sl = 0 THEN 50.0
            ELSE round(100.0 * CAST(sg AS DOUBLE) / (sg + sl), 6) END AS rsi
FROM g ORDER BY priority, day
"""


@register(
    "finance_rsi_sma",
    oracle=_RSI_SQL,
    tags=("finance", "timeseries", "window", "momentum"),
)
def finance_rsi_sma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (Wilder 1978), 14-period simple-moving-
    average form, over each order priority's daily-revenue series:
    up-moves and down-moves of the exact-cents day-over-day delta are
    summed over a 14-row frame and RSI = 100 * gains / (gains +
    losses) — the bounded [0, 100] momentum oscillator; complements
    ``ts_bollinger_bands`` (volatility) and ``finance_max_drawdown``
    (extremum) in the technical-indicator family.

    All state is integer: daily cents, BIGINT deltas, frame sums of
    clamped gains/losses; the only float is the final ratio, an
    identical expression on both engines. Degenerate frames are pinned
    cross-engine: the first row of each series (no delta yet) yields
    NULL, an all-flat frame yields exactly 50. Plan shape: one
    map-side-combinable daily aggregate, then ONE window PARTITIONED BY
    series (lag and the 14-row frame share it) — per-key sequential
    state, scaling with series count."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("day"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100.0).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    ws = Window.partitionBy("priority").orderBy("day")
    d = daily.withColumn("delta", F.col("v") - F.lag("v").over(ws))
    win = ws.rowsBetween(-13, Window.currentRow)
    g = d.select(
        "priority",
        "day",
        F.count("delta").over(win).cast("bigint").alias("n_deltas"),
        F.sum(F.greatest(F.col("delta"), F.lit(0))).over(win)
        .cast("bigint")
        .alias("sg"),
        F.sum(F.greatest(-F.col("delta"), F.lit(0))).over(win)
        .cast("bigint")
        .alias("sl"),
    )
    return g.select(
        "priority",
        "day",
        "n_deltas",
        F.round(F.coalesce(F.col("sg"), F.lit(0)) / 100.0, 2).alias("gain_sum"),
        F.round(F.coalesce(F.col("sl"), F.lit(0)) / 100.0, 2).alias("loss_sum"),
        F.when(F.col("n_deltas") == 0, F.lit(None).cast("double"))
        .when(F.col("sg") + F.col("sl") == 0, F.lit(50.0))
        .otherwise(
            F.round(
                F.lit(100.0) * F.col("sg").cast("double") / (F.col("sg") + F.col("sl")),
                6,
            )
        )
        .alias("rsi"),
    ).orderBy("priority", "day")


# --------------------------------------------------------------------------
# Brier score + skill (probability-forecast quality on the ROC fixture)
# --------------------------------------------------------------------------

_BRIER_STOPWORDS = "('the', 'a', 'of', 'and', 'is')"


def _sql_brier() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
         round(len(list_filter({toks}, t -> t IN {_BRIER_STOPWORDS}))
                 / CAST(len({toks}) AS DOUBLE), 9) AS score
  FROM documents
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(label) AS BIGINT) AS pos,
         CAST(sum(CAST(round(1000000000.0 * (score - label) * (score - label))
                       AS BIGINT)) AS BIGINT) AS bq
  FROM scored
)
SELECT n, pos,
       round(CAST(bq AS DOUBLE) / n / 1000000000.0, 9) AS brier,
       round((pos / CAST(n AS DOUBLE)) * (1 - pos / CAST(n AS DOUBLE)), 9)
         AS brier_ref,
       round(1 - (CAST(bq AS DOUBLE) / n / 1000000000.0)
                 / ((pos / CAST(n AS DOUBLE)) * (1 - pos / CAST(n AS DOUBLE))), 9)
         AS brier_skill
FROM agg
"""


@register(
    "eval_brier_score",
    oracle=_sql_brier(),
    tags=("eval", "stats", "probability", "calibration"),
)
def eval_brier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score (Brier 1950) — mean squared error of the stopword-
    ratio "probability" against the lang='en' label — with the Brier
    skill score vs the climatology reference p_bar(1 - p_bar) (always
    predicting the base rate): the strictly proper scoring rule that
    penalizes both discrimination AND calibration failures, completing
    the probability-evaluation family (`eval_roc_auc` ranks,
    `eval_calibration_bins` calibrates, Brier scores).

    Each per-row squared error is computed from the 9-dp-rounded score
    (identical double on both engines) and quantized to the 1e9 integer
    grid BEFORE the corpus sum, so the mean is a ratio of exact
    BIGINTs; the reference and skill terms are pure functions of the
    exact (n, positives) pair. ONE map-side-combinable aggregation —
    at 100 TB this is a single scan with a 3-number combine."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select("lang", tx.tokens("text").alias("toks"))
    stop = F.filter(F.col("toks"), lambda t: t.isin("the", "a", "of", "and", "is"))
    scored = base.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
        F.round(F.size(stop) / F.size("toks").cast("double"), 9).alias("score"),
    )
    term = F.round(
        F.lit(1000000000.0)
        * (F.col("score") - F.col("label"))
        * (F.col("score") - F.col("label"))
    ).cast("bigint")
    agg = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("pos"),
        F.sum(term).cast("bigint").alias("bq"),
    )
    p = F.col("pos") / F.col("n").cast("double")
    brier = F.col("bq").cast("double") / F.col("n") / 1000000000.0
    ref = p * (1 - p)
    return agg.select(
        "n",
        "pos",
        F.round(brier, 9).alias("brier"),
        F.round(ref, 9).alias("brier_ref"),
        F.round(1 - brier / ref, 9).alias("brier_skill"),
    )


# --------------------------------------------------------------------------
# Hapax legomena / vocabulary richness per language
# --------------------------------------------------------------------------


def _sql_hapax() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH tok AS (
  SELECT lang, unnest({toks}) AS t FROM documents
),
vc AS (
  SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1, 2
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax,
       CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS dis,
       CAST(sum(c) AS BIGINT) AS tokens,
       round(count(*) FILTER (WHERE c = 1) / CAST(count(*) AS DOUBLE), 9)
         AS hapax_ratio,
       round(count(*) / CAST(sum(c) AS DOUBLE), 9) AS type_token_ratio
FROM vc GROUP BY 1 ORDER BY 1
"""


@register(
    "text_hapax_richness",
    oracle=_sql_hapax(),
    tags=("text", "vocabulary", "lexical-stats"),
)
def text_hapax_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness profile per language: vocabulary size, hapax
    legomena (frequency-1 types — in a clean natural corpus roughly
    40-60% of the vocabulary, a Zipf consequence; far off that band
    signals boilerplate or spam), dis legomena, hapax ratio, and
    type-token ratio. The corpus-health diagnostic that complements
    ``text_zipf_fit`` (slope) and ``text_distinct_ngram_diversity``
    (n-gram level) for pretraining-data QA.

    Two-level exact aggregation — (lang, token) counts, then per-lang
    FILTERed counts over the vocabulary frame — all BIGINTs, ratios as
    single exact-integer divisions. Plan shape: explode + two
    map-side-combinable aggregates keyed by (lang, token) then lang;
    the shuffle carries one row per VOCABULARY entry, never per token
    occurrence, at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(tx.tokens("text")).alias("t"))
    vc = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return (
        vc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            F.count(F.when(F.col("c") == 1, 1)).cast("bigint").alias("hapax"),
            F.count(F.when(F.col("c") == 2, 1)).cast("bigint").alias("dis"),
            F.sum("c").cast("bigint").alias("tokens"),
        )
        .select(
            "lang",
            "vocab",
            "hapax",
            "dis",
            "tokens",
            F.round(F.col("hapax") / F.col("vocab").cast("double"), 9).alias(
                "hapax_ratio"
            ),
            F.round(F.col("vocab") / F.col("tokens").cast("double"), 9).alias(
                "type_token_ratio"
            ),
        )
        .orderBy("lang")
    )

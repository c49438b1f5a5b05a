"""Round-6 additions, part 17: STL seasonal/trend strength, historical
VaR/CVaR, and a recall evaluation of the MinHash-LSH candidate stage
against exact ground truth on a bounded sample.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle SQL) pairs with identical semantics — micro/nano
quantization before every cross-row float sum, exact-integer counts,
total orderings at every row selection — hash-compared at sf0.01 by
the driver.

Reference parity: the reference (analyse.py) has none of these; they
extend the decomposition family (``ts_stl_residual_outliers`` reports
components, this entry reports Hyndman-style STRENGTHS — the tsfeatures
readout), the finance family (Sharpe/Sortino measure reward-per-risk,
VaR/CVaR measure the tail itself), and the dedup family (the LSH
entries generate candidates; this one GRADES the generator — the
recall/efficiency trade every banded-LSH deployment must quantify).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DAVG, register, _t
from .datapipe import dedup as dd
from .functions import davg
from .operators.rolling import centered_rolling_mean

# --------------------------------------------------------------------------
# STL seasonal / trend strength (Hyndman's tsfeatures readout)
# --------------------------------------------------------------------------

_STR_W = 25  # the ts_stl_residual_outliers trend window
_Q = 1e6  # micro-unit grid for component values, nano for squares


def _sql_seasonal_strength() -> str:
    davg_val = SQL_DAVG.format(x="value")
    half = _STR_W // 2

    def var(z: str, mean_alias: str) -> str:
        # E[z^2] - E[z]^2 on the nano/micro grid — identical text Spark-side
        return (
            f"(CAST(sum(CAST(round(({z}) * ({z}) * 1e9) AS HUGEINT)) AS DOUBLE)"
            f" / count(*) / 1e9"
            f" - {mean_alias} * {mean_alias})"
        )

    mean = (
        "(CAST(sum(CAST(round(({z}) * 1e6) AS HUGEINT)) AS DOUBLE)"
        " / count(*) / 1e6)"
    )
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, {davg_val} AS x
  FROM events GROUP BY 1
),
tr AS (
  SELECT h, x,
         avg(x) OVER (ORDER BY h ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)
           AS trend
  FROM hourly
),
de AS (SELECT h, x, trend, x - trend AS detr FROM tr),
seas AS (
  SELECT hour(h) AS hod, {SQL_DAVG.format(x='detr')} AS seasonal
  FROM de GROUP BY 1
),
comp AS (
  SELECT de.h, de.trend, seas.seasonal,
         de.detr - seas.seasonal AS resid
  FROM de JOIN seas ON hour(de.h) = seas.hod
),
v AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hours,
         {mean.format(z='resid')} AS m_r,
         {mean.format(z='seasonal + resid')} AS m_sr,
         {mean.format(z='trend + resid')} AS m_tr,
         {var('resid', mean.format(z='resid'))} AS v_r,
         {var('seasonal + resid', mean.format(z='seasonal + resid'))} AS v_sr,
         {var('trend + resid', mean.format(z='trend + resid'))} AS v_tr
  FROM comp
)
SELECT n_hours,
       round(greatest(0.0, 1.0 - v_r / v_sr), 9) AS seasonal_strength,
       round(greatest(0.0, 1.0 - v_r / v_tr), 9) AS trend_strength,
       round(sqrt(greatest(v_r, 0.0)), 6) AS resid_sd
FROM v
"""


@register(
    "ts_seasonal_strength",
    oracle=_sql_seasonal_strength(),
    tags=("timeseries", "decomposition", "features"),
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal and trend STRENGTH of the hourly event-value series
    (Hyndman's tsfeatures definitions): F_s = max(0, 1 −
    var(R)/var(S+R)) and F_t = max(0, 1 − var(R)/var(T+R)) over the
    SAME decomposition as ``ts_stl_residual_outliers`` (centered
    25-hour rolling trend, hour-of-day seasonal index) — the two
    numbers a forecasting pipeline uses to ROUTE series (seasonal model
    vs trend model vs naive) before fitting anything.

    Exactness: component values go through the micro-unit grid for
    means and the nano grid for squares BEFORE the cross-row sums
    (HUGEINT/decimal accumulators), so each variance is the E[z²]−E[z]²
    identity over identical integers; the strengths are single double
    expressions with identical text.

    Scale shape: the hour-grain frame (~2.4k rows at any corpus size)
    carries every window — the only data-sized stage is the hourly
    aggregate (the theilsen discipline)."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        davg("value").alias("x")
    )
    tr = centered_rolling_mean(hourly, "h", "x", _STR_W, out_col="trend")
    de = tr.select(
        "h", "x", "trend", (F.col("x") - F.col("trend")).alias("detr")
    )
    seas = de.groupBy(F.hour("h").alias("hod")).agg(davg("detr").alias("seasonal"))
    comp = de.join(F.broadcast(seas), F.hour(de["h"]) == seas["hod"]).select(
        "h",
        "trend",
        "seasonal",
        (F.col("detr") - F.col("seasonal")).alias("resid"),
    )

    def mean_of(z):
        return (
            F.sum(F.round(z * _Q).cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / _Q
        )

    def sq_of(z):
        return (
            F.sum(F.round(z * z * 1e9).cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / 1e9
        )

    r = F.col("resid")
    sr = F.col("seasonal") + F.col("resid")
    trr = F.col("trend") + F.col("resid")
    v = comp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        (sq_of(r) - mean_of(r) * mean_of(r)).alias("v_r"),
        (sq_of(sr) - mean_of(sr) * mean_of(sr)).alias("v_sr"),
        (sq_of(trr) - mean_of(trr) * mean_of(trr)).alias("v_tr"),
    )
    return v.select(
        "n_hours",
        F.round(
            F.greatest(F.lit(0.0), 1.0 - F.col("v_r") / F.col("v_sr")), 9
        ).alias("seasonal_strength"),
        F.round(
            F.greatest(F.lit(0.0), 1.0 - F.col("v_r") / F.col("v_tr")), 9
        ).alias("trend_strength"),
        F.round(F.sqrt(F.greatest(F.col("v_r"), F.lit(0.0))), 6).alias(
            "resid_sd"
        ),
    )


# --------------------------------------------------------------------------
# Historical VaR / CVaR of the daily revenue log-return series
# --------------------------------------------------------------------------

_VAR_ALPHA = 0.05  # 95% VaR


def _sql_var_cvar() -> str:
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
  SELECT d, CAST(round(ln(CAST(x AS DOUBLE) / xp) * 1e9) AS BIGINT) AS rq
  FROM led WHERE xp IS NOT NULL
),
ranked AS (
  SELECT rq, row_number() OVER (ORDER BY rq, d) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM r
),
k AS (SELECT CAST(ceil({_VAR_ALPHA} * max(n)) AS BIGINT) AS k, max(n) AS n
      FROM ranked)
SELECT k.n AS n_returns, k.k AS tail_days,
       round(-max(CASE WHEN rn = k.k THEN rq END) / 1e9, 9) AS var_95,
       round(-CAST(sum(CASE WHEN rn <= k.k THEN CAST(rq AS HUGEINT) END)
                   AS DOUBLE) / k.k / 1e9, 9) AS cvar_95,
       round(-min(rq) / 1e9, 9) AS worst_day_loss
FROM ranked, k GROUP BY k.n, k.k
"""


@register(
    "finance_var_cvar",
    oracle=_sql_var_cvar(),
    tags=("finance", "risk", "timeseries", "tail"),
)
def finance_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95% Value-at-Risk and Conditional VaR (expected
    shortfall) of the daily revenue log-return series: VaR = the
    ceil(αn)-th smallest return negated (loss convention), CVaR = the
    mean of that entire tail — the coherent tail-risk measure Basel
    moved to. Completes the finance family: Sharpe/Sortino normalize by
    dispersion, drawdown measures path risk, VaR/CVaR measure the
    return distribution's tail itself.

    Exactness: the same nano-quantized log-return integers as
    ``finance_sharpe_sortino``; the order statistic comes from a
    row_number over the (return, day) total order; the tail mean
    accumulates exact integers in HUGEINT/decimal.

    Scale shape: one map-side-combined daily aggregate is the only
    data-sized stage; ranking and tail algebra run on the day-grain
    frame (~2.4k rows at any corpus size — the Sharpe/theilsen
    discipline)."""
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
        "d",
        F.round(F.log(F.col("x").cast("double") / F.col("xp")) * 1e9)
        .cast("bigint")
        .alias("rq"),
    )
    wr = Window.orderBy("rq", "d")
    ranked = r.select(
        "rq",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).cast("bigint").alias("n"),
    )
    k = ranked.agg(
        F.ceil(F.lit(_VAR_ALPHA) * F.max("n")).cast("bigint").alias("k"),
        F.max("n").alias("n_total"),
    )
    tail = ranked.select("rq", "rn").crossJoin(F.broadcast(k))
    agg = tail.groupBy(
        F.col("n_total").alias("n_returns"), F.col("k").alias("tail_days")
    ).agg(
        F.max(F.when(F.col("rn") == F.col("k"), F.col("rq"))).alias("var_q"),
        F.sum(
            F.when(F.col("rn") <= F.col("k"), F.col("rq").cast("decimal(38,0)"))
        )
        .cast("double")
        .alias("tail_sum"),
        F.min("rq").alias("min_rq"),
    )
    return agg.select(
        "n_returns",
        "tail_days",
        F.round(-F.col("var_q") / 1e9, 9).alias("var_95"),
        F.round(-F.col("tail_sum") / F.col("tail_days") / 1e9, 9).alias("cvar_95"),
        F.round(-F.col("min_rq") / 1e9, 9).alias("worst_day_loss"),
    )


# --------------------------------------------------------------------------
# LSH candidate-stage recall evaluation on a bounded sample
# --------------------------------------------------------------------------

_LSHR_SAMPLE = 200  # doc_id < 200: all-pairs truth stays bounded
_LSHR_THRESHOLD = 0.5  # the dedup_minhash_lsh verification threshold


def _sql_lsh_recall() -> str:
    sh_expr = dd.sql_shingles("text", k=3)
    num_hashes, bands = 16, 4
    rows = num_hashes // bands
    mins = ",\n    ".join(
        f"list_min(list_transform(sh, s -> {dd.sql_km_hash('s', i)})) AS m{i}"
        for i in range(num_hashes)
    )
    from .datapipe.hashing import sql_hash60

    band_selects = []
    for b in range(bands):
        vals = " || ',' || ".join(
            f"m{i}::VARCHAR" for i in range(b * rows, (b + 1) * rows)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, "
            f"{sql_hash60(f'({vals})', seed=1000 + b)} AS band_hash FROM sig"
        )
    bands_sql = "\nUNION ALL\n".join(band_selects)
    jac = (
        "len(list_intersect(sa.sh, sb.sh))::DOUBLE"
        " / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE"
    )
    return f"""
WITH sh AS (
  SELECT doc_id, {sh_expr} AS sh FROM documents WHERE doc_id < {_LSHR_SAMPLE}
),
truth AS (
  SELECT sa.doc_id AS id_a, sb.doc_id AS id_b
  FROM sh sa JOIN sh sb ON sa.doc_id < sb.doc_id
  WHERE {jac} >= {_LSHR_THRESHOLD}
),
sig AS (SELECT doc_id, sh, {mins} FROM sh),
bands AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
m AS (
  SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS true_pairs,
         CAST((SELECT count(*) FROM cand) AS BIGINT) AS candidate_pairs,
         CAST((SELECT count(*) FROM truth t JOIN cand c
               ON t.id_a = c.id_a AND t.id_b = c.id_b) AS BIGINT) AS caught
)
SELECT CAST({_LSHR_SAMPLE} AS BIGINT) AS sample_docs,
       true_pairs, candidate_pairs, caught,
       CASE WHEN true_pairs = 0 THEN NULL
            ELSE round(caught / CAST(true_pairs AS DOUBLE), 9) END AS recall,
       CASE WHEN candidate_pairs = 0 THEN NULL
            ELSE round(caught / CAST(candidate_pairs AS DOUBLE), 9) END
         AS candidate_precision
FROM m
"""


@register(
    "dedup_lsh_recall_eval",
    oracle=_sql_lsh_recall(),
    tags=("dedup", "lsh", "eval", "recall"),
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the MinHash(16)+LSH(4-band) CANDIDATE stage against
    exact all-pairs 3-gram Jaccard ground truth (J >= 0.5) on a 200-doc
    sample — the measurement every banded-LSH deployment owes itself:
    banding trades recall for the equi-join shape (at J = 0.5 the
    16/4 configuration's collision probability is 1−(1−0.5⁴)⁴ ≈ 23%
    per theory; seeded near-exact duplicates collide at ~1), and this
    entry reports the realized recall and candidate precision side by
    side. The production LSH entries stay as-is; this GRADES them.

    Scale shape: ground truth is all-pairs BY DEFINITION, so it runs
    on an explicit bounded sample (the ``dedup_ngram_jaccard_sample``
    contract — at scale you grade on a sample, never the corpus); the
    candidate side is the standard banded equi-join on the same
    sample; all three counts are exact BIGINTs from equi-joins on
    (id_a, id_b).

    Exactness: same shingle/KM-hash/band-hash machinery as
    ``dedup_minhash_lsh`` (bit-identical cross-engine md5 paths);
    recall/precision are integer ratios."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < _LSHR_SAMPLE)
    sh = docs.select(
        "doc_id", dd.shingles("text", k=3).alias("sh")
    ).localCheckpoint(eager=True)  # feeds truth AND the LSH branch
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sha"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb")).cast("double")
    jac = inter / (F.size("sha") + F.size("shb") - inter)
    truth = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(jac >= _LSHR_THRESHOLD)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    cand = (
        dd.minhash_lsh_candidates(
            docs,
            "text",
            "doc_id",
            num_hashes=16,
            bands=4,
            shingled=sh.select(F.col("doc_id").alias("doc"), "sh"),
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    tc = truth.agg(F.count(F.lit(1)).cast("bigint").alias("true_pairs"))
    cc = cand.agg(F.count(F.lit(1)).cast("bigint").alias("candidate_pairs"))
    hit = truth.join(cand, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("caught")
    )
    m = tc.crossJoin(F.broadcast(cc)).crossJoin(F.broadcast(hit))
    return m.select(
        F.lit(_LSHR_SAMPLE).cast("bigint").alias("sample_docs"),
        "true_pairs",
        "candidate_pairs",
        "caught",
        # sample windows with zero ground-truth pairs (possible at SFs
        # where the seeded dups fall outside the sample) read NULL, not
        # a division error — matching the oracle's CASE
        F.round(
            F.try_divide(F.col("caught"), F.col("true_pairs").cast("double")), 9
        ).alias("recall"),
        F.round(
            F.try_divide(
                F.col("caught"), F.col("candidate_pairs").cast("double")
            ),
            9,
        ).alias("candidate_precision"),
    )

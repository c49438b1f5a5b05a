"""Round-6 additions, part 6: experimentation and drift analytics —
CUPED variance-reduced A/B readout, Jensen-Shannon divergence drift,
and the Nelson-Aalen cumulative-hazard estimator.

Catalog contract as everywhere (see catalog.py): each entry is a
(PySpark program, DuckDB oracle SQL) pair with identical semantics —
exact-integer sufficient statistics (micro-unit quantized inputs,
HUGEINT/decimal(38,0) accumulators), nano-quantized log/ratio terms
before any cumulative or cross-category sum, and a total ordering
everywhere a row is selected — hash-compared at sf0.01 by the driver.

Reference parity: the reference (analyse.py) has no experimentation
surface; these extend SURVEY.md §2's aggregation/window families with
the readouts a training-data/metrics pipeline runs on event logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe.hashing import hash60, sql_hash60

# --------------------------------------------------------------------------
# CUPED variance-reduced experiment readout
# --------------------------------------------------------------------------

_CUPED_SEED = 7


def _sql_cuped() -> str:
    arm = f"({sql_hash60('user_id::VARCHAR', seed=_CUPED_SEED)} % 2)"
    return f"""
WITH b AS (
  SELECT CAST(floor((epoch_us(min(ts)) + epoch_us(max(ts))) / 2.0) AS BIGINT)
           AS tmid
  FROM events
),
u AS (
  SELECT user_id, {arm} AS arm,
         CAST(sum(CASE WHEN epoch_us(ts) < tmid
                       THEN CAST(round(value * 1000000.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS xq,
         CAST(sum(CASE WHEN epoch_us(ts) >= tmid
                       THEN CAST(round(value * 1000000.0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS yq
  FROM events, b GROUP BY 1, 2
),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(xq AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(sum(CAST(yq AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(xq AS HUGEINT) * xq) AS DOUBLE) AS sxx,
         CAST(sum(CAST(yq AS HUGEINT) * yq) AS DOUBLE) AS syy,
         CAST(sum(CAST(xq AS HUGEINT) * yq) AS DOUBLE) AS sxy
  FROM u
),
t AS (
  SELECT n, sx,
         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
         (n * sxy - sx * sy) * (n * sxy - sx * sy)
           / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rho_sq
  FROM g
),
a AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CAST(xq AS HUGEINT)) AS DOUBLE) AS ax,
         CAST(sum(CAST(yq AS HUGEINT)) AS DOUBLE) AS ay
  FROM u GROUP BY arm
)
SELECT CAST(arm AS INT) AS arm, n_users,
       round(ay / n_users / 1000000.0, 6) AS mean_y,
       round((ay / n_users - theta * (ax / n_users - sx / n)) / 1000000.0, 6)
         AS mean_y_cuped,
       round(theta, 6) AS theta,
       round(rho_sq, 6) AS rho_sq
FROM a, t ORDER BY arm
"""


@register(
    "stats_cuped_adjustment",
    oracle=_sql_cuped(),
    tags=("stats", "experimentation", "cuped", "variance-reduction"),
)
def stats_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data) readout:
    the standard variance-reduction adjustment for A/B metrics. Unit =
    user; arm = RNG-free md5 hash split (the ``sample_hash_documents``
    gate discipline); metric Y = the user's total event value in the
    second half of the corpus time range, covariate X = the same total
    in the first half. theta = cov(X,Y)/var(X) pooled over all units,
    Y_cuped = Y - theta (X - mean X); the readout reports per-arm raw
    and adjusted means plus theta and rho^2 (the achieved variance
    reduction is 1 - rho^2).

    Exactness: per-user X/Y are integer micro-unit sums; the pooled
    sufficient statistics (Sx, Sy, Sxx, Syy, Sxy) accumulate those
    bigints in decimal(38,0) on Spark / HUGEINT in DuckDB — exact
    integers — so theta and every mean are single double expressions
    over identical integers on both engines.

    Scale shape: one shuffle (groupBy user), then two tiny aggregates
    over the per-user frame (a 1-row pooled-stats frame broadcast onto
    the 2-row per-arm frame). No window, no driver data; the per-user
    frame is localCheckpointed so the shared subtree runs once. At
    100 TB the user groupBy is the only data-sized stage and it
    map-side combines."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    b = ev.agg(
        F.floor(
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2.0
        )
        .cast("bigint")
        .alias("tmid")
    )
    vq = F.round(F.col("value") * 1000000.0).cast("bigint")
    us = F.unix_micros("ts")
    u = (
        ev.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(us < F.col("tmid"), vq).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("xq"),
            F.sum(F.when(us >= F.col("tmid"), vq).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("yq"),
        )
        .select(
            F.pmod(
                hash60(F.col("user_id").cast("string"), seed=_CUPED_SEED),
                F.lit(2),
            ).alias("arm"),
            "xq",
            "yq",
        )
        .localCheckpoint(eager=True)
    )
    xd = F.col("xq").cast("decimal(38,0)")
    yd = F.col("yq").cast("decimal(38,0)")
    g = u.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * F.col("xq")).cast("double").alias("sxx"),
        F.sum(yd * F.col("yq")).cast("double").alias("syy"),
        F.sum(xd * F.col("yq")).cast("double").alias("sxy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    t = g.select(
        "n",
        "sx",
        (cov_n / var_x).alias("theta"),
        (cov_n * cov_n / (var_x * var_y)).alias("rho_sq"),
    )
    a = u.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(xd).cast("double").alias("ax"),
        F.sum(yd).cast("double").alias("ay"),
    )
    return (
        a.crossJoin(F.broadcast(t))
        .select(
            F.col("arm").cast("int").alias("arm"),
            "n_users",
            F.round(F.col("ay") / F.col("n_users") / 1000000.0, 6).alias("mean_y"),
            F.round(
                (
                    F.col("ay") / F.col("n_users")
                    - F.col("theta")
                    * (F.col("ax") / F.col("n_users") - F.col("sx") / F.col("n"))
                )
                / 1000000.0,
                6,
            ).alias("mean_y_cuped"),
            F.round("theta", 6).alias("theta"),
            F.round("rho_sq", 6).alias("rho_sq"),
        )
        .orderBy("arm")
    )


# --------------------------------------------------------------------------
# Jensen-Shannon divergence drift between two corpus splits
# --------------------------------------------------------------------------

_JSD_SEED = 11


def _sql_jsd() -> str:
    sp = f"({sql_hash60('doc_id::VARCHAR', seed=_JSD_SEED)} % 2)"
    return f"""
WITH s AS (SELECT {sp} AS sp, lang FROM documents),
tot AS (
  SELECT CAST(count(*) FILTER (WHERE sp = 0) AS DOUBLE) AS na,
         CAST(count(*) FILTER (WHERE sp = 1) AS DOUBLE) AS nb
  FROM s
),
c AS (
  SELECT lang,
         CAST(count(*) FILTER (WHERE sp = 0) AS BIGINT) AS ca,
         CAST(count(*) FILTER (WHERE sp = 1) AS BIGINT) AS cb
  FROM s GROUP BY lang
),
terms AS (
  SELECT ca, cb,
         CAST(round((
           CASE WHEN ca > 0
                THEN 0.5 * (ca / na) * ln((ca / na) / ((ca / na + cb / nb) / 2))
                ELSE 0 END
           + CASE WHEN cb > 0
                  THEN 0.5 * (cb / nb) * ln((cb / nb) / ((ca / na + cb / nb) / 2))
                  ELSE 0 END) * 1e9) AS BIGINT) AS tq
  FROM c, tot
)
SELECT CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT) AS k_a,
       CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS k_b,
       CAST(sum(ca) AS BIGINT) AS n_a,
       CAST(sum(cb) AS BIGINT) AS n_b,
       round(CAST(sum(tq) AS DOUBLE) / 1e9, 9) AS jsd_nats,
       round(CAST(sum(tq) AS DOUBLE) / 1e9 / ln(2), 9) AS jsd_bits
FROM terms
"""


@register(
    "dq_jensen_shannon_drift",
    oracle=_sql_jsd(),
    tags=("data-quality", "drift", "divergence", "stats"),
)
def dq_jensen_shannon_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the language distributions of
    two deterministic halves of the document corpus (md5 hash split on
    doc_id) — the bounded, symmetric sibling of the PSI drift monitor
    (``dq_psi_drift``): JSD = KL(p||m)/2 + KL(q||m)/2 with m=(p+q)/2,
    0 <= JSD <= ln 2, and zero-count categories contribute exactly 0
    instead of PSI's unbounded blow-up. Reported in nats and bits.

    Exactness: category counts are exact bigints; each per-category
    divergence term is nano-quantized before the cross-category sum, so
    the total is an exact integer reduction on both engines (the
    Kaplan-Meier log-term discipline).

    Scale shape: one map-side-combined groupBy over (split, lang) —
    cardinality = 2 x #langs — then a 1-row reduce. No window, no
    driver data. At 100 TB this is a single pass with tiny state."""
    docs = _t(spark, sf_dir, "documents").select(
        F.pmod(
            hash60(F.col("doc_id").cast("string"), seed=_JSD_SEED), F.lit(2)
        ).alias("sp"),
        "lang",
    )
    c = docs.groupBy("lang").agg(
        F.count(F.when(F.col("sp") == 0, 1)).cast("bigint").alias("ca"),
        F.count(F.when(F.col("sp") == 1, 1)).cast("bigint").alias("cb"),
    )
    tot = c.agg(
        F.sum("ca").cast("double").alias("na"),
        F.sum("cb").cast("double").alias("nb"),
    )
    p = F.col("ca") / F.col("na")
    q = F.col("cb") / F.col("nb")
    m = (p + q) / 2
    term = F.when(F.col("ca") > 0, F.lit(0.5) * p * F.log(p / m)).otherwise(
        F.lit(0.0)
    ) + F.when(F.col("cb") > 0, F.lit(0.5) * q * F.log(q / m)).otherwise(F.lit(0.0))
    terms = c.crossJoin(F.broadcast(tot)).select(
        "ca", "cb", F.round(term * 1e9).cast("bigint").alias("tq")
    )
    return terms.agg(
        F.sum(F.when(F.col("ca") > 0, 1).otherwise(0)).cast("bigint").alias("k_a"),
        F.sum(F.when(F.col("cb") > 0, 1).otherwise(0)).cast("bigint").alias("k_b"),
        F.sum("ca").cast("bigint").alias("n_a"),
        F.sum("cb").cast("bigint").alias("n_b"),
        F.round(F.sum("tq").cast("double") / 1e9, 9).alias("jsd_nats"),
        F.round(F.sum("tq").cast("double") / 1e9 / F.log(F.lit(2.0)), 9).alias(
            "jsd_bits"
        ),
    )


# --------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard
# --------------------------------------------------------------------------


def _sql_nelson_aalen() -> str:
    return """
WITH u AS (
  SELECT user_id,
         CAST(min(date_trunc('day', ts)) AS DATE) AS first_day,
         CAST(max(date_trunc('day', ts)) AS DATE) AS last_day
  FROM events GROUP BY user_id
),
mx AS (SELECT max(last_day) AS max_day FROM u),
d AS (
  SELECT date_diff('day', first_day, last_day) AS t,
         CASE WHEN last_day < max_day THEN 1 ELSE 0 END AS ev
  FROM u, mx
),
pt AS (
  SELECT t,
         CAST(sum(ev) AS BIGINT) AS d_events,
         CAST(count(*) AS BIGINT) AS tot
  FROM d GROUP BY t
),
rk AS (
  SELECT t, d_events,
         CAST(sum(tot) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
  FROM pt
),
et AS (SELECT * FROM rk WHERE d_events > 0),
cm AS (
  SELECT t, d_events, n_risk,
         sum(CAST(round(CAST(d_events AS DOUBLE) / n_risk * 1e9) AS BIGINT))
           OVER (ORDER BY t) AS cum_hq
  FROM et
)
SELECT CAST(t AS INT) AS t_days, n_risk, d_events,
       round(CAST(cum_hq AS DOUBLE) / 1e9, 9) AS cum_hazard,
       round(exp(-CAST(cum_hq AS DOUBLE) / 1e9), 9) AS fh_survival
FROM cm ORDER BY t_days
"""


@register(
    "events_nelson_aalen",
    oracle=_sql_nelson_aalen(),
    tags=("survival", "retention", "stats"),
)
def events_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator over the same user
    lifetimes as ``events_kaplan_meier`` (duration = days between a
    user's first and last event, last-day users right-censored):
    H(t) = sum d_u/n_u over event times, plus the Fleming-Harrington
    survival exp(-H(t)) — the estimator of choice when hazard RATES
    (not just survival) are the deliverable, and the numerically
    stabler curve when risk sets get small.

    Exactness: each hazard increment d/n is nano-quantized before the
    ascending prefix sum, so the trajectory is an exact-integer
    reduction on both engines; unlike the KM product chain there is no
    d == n edge case (the hazard just adds 1.0).

    Scale shape: identical to KM — the groupBy user shuffle, then all
    ordered windows run over the per-duration frame (cardinality =
    distinct durations, ~days), never raw events; the corpus max-day is
    the 1-row scalar broadcast idiom."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.to_date(F.min(F.date_trunc("day", "ts"))).alias("first_day"),
        F.to_date(F.max(F.date_trunc("day", "ts"))).alias("last_day"),
    )
    mx = u.agg(F.max("last_day").alias("max_day"))
    d = u.crossJoin(F.broadcast(mx)).select(
        F.datediff("last_day", "first_day").alias("t"),
        F.when(F.col("last_day") < F.col("max_day"), 1).otherwise(0).alias("ev"),
    )
    pt = d.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d_events"),
        F.count(F.lit(1)).cast("bigint").alias("tot"),
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    rk = pt.select(
        "t", "d_events", F.sum("tot").over(wdesc).cast("bigint").alias("n_risk")
    )
    et = rk.filter(F.col("d_events") > 0)
    wasc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    hq = F.round(F.col("d_events").cast("double") / F.col("n_risk") * 1e9).cast(
        "bigint"
    )
    cm = et.select(
        "t",
        "d_events",
        "n_risk",
        F.sum(hq).over(wasc).alias("cum_hq"),
    )
    return cm.select(
        F.col("t").cast("int").alias("t_days"),
        "n_risk",
        "d_events",
        F.round(F.col("cum_hq").cast("double") / 1e9, 9).alias("cum_hazard"),
        F.round(F.exp(-F.col("cum_hq").cast("double") / 1e9), 9).alias(
            "fh_survival"
        ),
    ).orderBy("t_days")

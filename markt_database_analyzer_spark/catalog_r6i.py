"""Round-6 additions, part 9: inequality/impurity analytics on the
distributed prefix-sum scale path, the Poisson bootstrap, and TOST
equivalence testing.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle) pairs with identical semantics — exact-integer
sufficient statistics, identical expression text wherever doubles are
combined, RNG-free hash gates — hash-compared at sf0.01 by the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe.hashing import hash60, sql_hash60
from .datapipe.sampling import RESOLUTION
from .functions.aggregates import davg
from .operators.equidepth import value_counts_cum

# --------------------------------------------------------------------------
# Gini coefficient via the distributed distinct-domain prefix sum
# --------------------------------------------------------------------------


def _sql_gini() -> str:
    return """
WITH pts AS (
  SELECT CAST(round(c_acctbal * 100.0) AS BIGINT) AS v
  FROM customer WHERE c_acctbal >= 0
),
dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(count(*)) OVER (ORDER BY v) AS BIGINT) AS cum
  FROM pts GROUP BY v
),
s AS (
  SELECT CAST(max(cum) AS BIGINT) AS n,
         CAST(sum(CAST(v AS HUGEINT) * cnt) AS HUGEINT) AS sx,
         CAST(sum(CAST(v AS HUGEINT) * cnt * (2 * cum - cnt + 1))
              AS HUGEINT) AS s1x2
  FROM dom
)
SELECT n,
       round(CAST(sx AS DOUBLE) / n / 100.0, 6) AS mean_balance,
       round((CAST(s1x2 AS DOUBLE) - (n + 1.0) * CAST(sx AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS gini
FROM s
"""


@register(
    "stats_gini_lorenz",
    oracle=_sql_gini(),
    tags=("stats", "inequality", "gini", "scale-path"),
)
def stats_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of non-negative customer balances
    — the native (pure-expression) twin of the ``udf_grouped_agg_gini``
    UDF-surface entry, demonstrating that the slow-path pandas UDF is
    never REQUIRED for this statistic. Uses the rank-sum identity
    G = (2*sum(i*x_(i)) - (n+1)*sum(x)) / (n*sum(x)) with ties handled
    exactly: a distinct value v occupying ranks (cum-cnt+1..cum)
    contributes 2*v*(sum of ranks) = v * cnt * (2*cum - cnt + 1) to the
    DOUBLED rank-sum, so the whole numerator is exact HUGEINT/decimal
    arithmetic (no integer halving, whose `/` semantics differ between
    engines) and the coefficient is a single double expression.

    Scale path: the ranks come from the distributed distinct-domain
    prefix sum (``value_counts_cum`` — range-repartitioned, PARTITIONED
    window + broadcast offsets, never an un-partitioned global sort;
    the oracle's global window is the semantic spec only). One more
    map-side-combined aggregate over the domain frame finishes it."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 0)
    pts = cust.select(F.round(F.col("c_acctbal") * 100.0).cast("bigint").alias("v"))
    cum, _n = value_counts_cum(pts, F.col("v"))
    vd = F.col("v").cast("decimal(38,0)")
    s = cum.agg(
        F.max("cum").cast("bigint").alias("n"),
        F.sum(vd * F.col("cnt")).alias("sx"),
        F.sum(
            vd * F.col("cnt") * (2 * F.col("cum") - F.col("cnt") + 1)
        ).cast("decimal(38,0)").alias("s1x2"),
    )
    return s.select(
        "n",
        F.round(F.col("sx").cast("double") / F.col("n") / 100.0, 6).alias(
            "mean_balance"
        ),
        F.round(
            (
                F.col("s1x2").cast("double")
                - (F.col("n") + 1.0) * F.col("sx").cast("double")
            )
            / (F.col("n").cast("double") * F.col("sx").cast("double")),
            9,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# Decision stump (best binary split by weighted Gini impurity)
# --------------------------------------------------------------------------


def _sql_stump() -> str:
    return """
WITH pts AS (
  SELECT n_chars AS v,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos,
         CAST(sum(count(*)) OVER (ORDER BY v) AS BIGINT) AS cumn,
         CAST(sum(sum(y)) OVER (ORDER BY v) AS BIGINT) AS cumpos
  FROM pts GROUP BY v
),
tot AS (
  SELECT CAST(max(cumn) AS BIGINT) AS n, CAST(max(cumpos) AS BIGINT) AS post
  FROM dom
),
cand AS (
  SELECT v, cumn AS n_left, n - cumn AS n_right,
         cumpos AS pos_left, post - cumpos AS pos_right,
         (CAST(cumpos AS DOUBLE) * (cumn - cumpos) / cumn
          + CAST(post - cumpos AS DOUBLE) * ((n - cumn) - (post - cumpos))
            / (n - cumn)) * 2.0 / n AS gini_split,
         2.0 * CAST(post AS DOUBLE) * (n - post)
           / (CAST(n AS DOUBLE) * n) AS gini_root
  FROM dom, tot WHERE cumn < n
)
SELECT CAST(v AS BIGINT) AS threshold, n_left, n_right, pos_left, pos_right,
       round(gini_split, 9) AS gini_split, round(gini_root, 9) AS gini_root
FROM cand ORDER BY gini_split, v LIMIT 1
"""


@register(
    "ml_decision_stump_gini",
    oracle=_sql_stump(),
    tags=("ml", "decision-tree", "gini", "scale-path"),
)
def ml_decision_stump_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-1 decision tree (stump) fit by exhaustive split search:
    the best threshold on n_chars for predicting lang == 'en' by
    weighted Gini impurity 2/n * (posL*negL/nL + posR*negR/nR) — the
    split-finding primitive inside every distributed tree learner
    (XGBoost/LightGBM histogram mode evaluates exactly this quantity
    over a value domain). Every distinct feature value except the
    maximum is a candidate threshold (split is x <= t).

    Exactness: candidate statistics are the inclusive prefix sums of
    (count, positives) over the ascending distinct-value domain — exact
    integers — and the impurity is one double expression with identical
    association order on both engines; the argmin is made total by the
    (impurity, threshold) tiebreak.

    Scale path: the prefix sums come from the distributed
    distinct-domain machinery (``value_counts_cum`` with unit and label
    weights — range-repartitioned, partitioned windows, broadcast
    offsets); the argmin is a domain-frame TakeOrdered. The oracle's
    global window is the semantic spec only. Histogram-binning (the
    production trick for continuous features) is the ``_cuts`` family
    composed in front."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("v"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    cnt_cum, _ = value_counts_cum(docs, F.col("v"))
    pos_cum, _ = value_counts_cum(docs, F.col("v"), weight=F.col("y"))
    dom = cnt_cum.join(
        pos_cum.select(
            F.col("v").alias("v2"),
            F.col("cnt").alias("pos"),
            F.col("cum").alias("cumpos"),
        ),
        F.col("v") == F.col("v2"),
    ).select("v", "cnt", "cum", "pos", "cumpos")
    tot = dom.agg(
        F.max("cum").cast("bigint").alias("n"),
        F.max("cumpos").cast("bigint").alias("pos_total"),
    )
    cand = (
        dom.crossJoin(F.broadcast(tot))
        .filter(F.col("cum") < F.col("n"))
        .select(
            "v",
            F.col("cum").alias("n_left"),
            (F.col("n") - F.col("cum")).alias("n_right"),
            F.col("cumpos").alias("pos_left"),
            (F.col("pos_total") - F.col("cumpos")).alias("pos_right"),
            (
                (
                    F.col("cumpos").cast("double")
                    * (F.col("cum") - F.col("cumpos"))
                    / F.col("cum")
                    + (F.col("pos_total") - F.col("cumpos")).cast("double")
                    * (
                        (F.col("n") - F.col("cum"))
                        - (F.col("pos_total") - F.col("cumpos"))
                    )
                    / (F.col("n") - F.col("cum"))
                )
                * 2.0
                / F.col("n")
            ).alias("gini_split"),
            (
                2.0
                * F.col("pos_total").cast("double")
                * (F.col("n") - F.col("pos_total"))
                / (F.col("n").cast("double") * F.col("n"))
            ).alias("gini_root"),
        )
    )
    return (
        cand.orderBy("gini_split", "v")
        .limit(1)
        .select(
            F.col("v").cast("bigint").alias("threshold"),
            "n_left",
            "n_right",
            "pos_left",
            "pos_right",
            F.round("gini_split", 9).alias("gini_split"),
            F.round("gini_root", 9).alias("gini_root"),
        )
    )


# --------------------------------------------------------------------------
# Poisson bootstrap (the at-scale bootstrap: per-row Poisson(1) weights)
# --------------------------------------------------------------------------

_PB_B = 32
_PB_SEED = 211
# Inverse-CDF thresholds for Poisson(1) on the RESOLUTION grid, rendered
# as integer literals into BOTH engines (cumulative e^-1/k!).
_PB_THRESH: list[int] = []
_acc = 0.0
for _k in range(7):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _PB_THRESH.append(int(_acc * RESOLUTION))


def _sql_poisson_bootstrap() -> str:
    hid = sql_hash60("event_id::VARCHAR", seed=_PB_SEED)
    ob = sql_hash60("b::VARCHAR")
    cases = " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(_PB_THRESH)
    )
    return f"""
WITH x AS (
  SELECT b, CAST(round(value * 1000000.0) AS BIGINT) AS vq,
         (({hid} + {ob}) % {RESOLUTION}) AS u
  FROM events, unnest(generate_series(0, {_PB_B - 1})) AS t(b)
),
w AS (SELECT b, vq, CASE {cases} ELSE 7 END AS w FROM x),
rs AS (
  SELECT b,
         CAST(sum(CAST(w AS HUGEINT) * vq) AS DOUBLE)
           / CAST(sum(CAST(w AS HUGEINT)) AS DOUBLE) / 1000000.0 AS mean_b
  FROM w GROUP BY b
)
SELECT CAST(count(*) AS BIGINT) AS n_resamples,
       round((CAST(SUM(CAST(round((mean_b) * 1000000.0) AS HUGEINT)) AS DOUBLE)
              / COUNT(mean_b) / 1000000.0), 6) AS mean_of_means,
       round(quantile_cont(mean_b, 0.05), 6) AS ci_lo,
       round(quantile_cont(mean_b, 0.95), 6) AS ci_hi
FROM rs
"""


@register(
    "stats_poisson_bootstrap",
    oracle=_sql_poisson_bootstrap(),
    tags=("stats", "bootstrap", "poisson", "resampling", "scale-path"),
)
def stats_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap for the mean event value — the bootstrap that
    actually runs at 100 TB: instead of drawing n-out-of-n multinomial
    resamples (which needs global coordination), every row
    independently receives a Poisson(1) replication weight per
    resample, giving each row an identical marginal resampling
    distribution with NO cross-row state — the streaming/map-only
    recipe. Weights are RNG-free: the (h(event_id) + h(b)) mod R
    uniform (the ``stats_bootstrap_ci`` hash-gate discipline) pushed
    through the Poisson(1) inverse CDF rendered as integer grid
    thresholds, identical literals on both engines. B=32 weighted
    means; the 90% CI is the [p05, p95] band.

    Exactness: weighted sums are HUGEINT/decimal over micro-unit
    integers; each resample mean micro-quantizes before the
    mean-of-means (davg); the percentile runs over the 32-row frame.

    Scale shape: one explode(xB) -> map-only weight -> 32-group
    map-side-combined aggregate; at 100 TB the xB blow-up collapses to
    per-partition partial (sum w*v, sum w) pairs per b."""
    ev = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 1000000.0).cast("bigint").alias("vq"),
        hash60(F.col("event_id").cast("string"), seed=_PB_SEED).alias("h"),
    )
    offsets = spark.range(_PB_B).select(
        F.col("id").cast("int").alias("b"),
        hash60(F.col("id").cast("string")).alias("ob"),
    )
    x = (
        ev.select(
            "vq", "h", F.explode(F.sequence(F.lit(0), F.lit(_PB_B - 1))).alias("b")
        )
        .join(F.broadcast(offsets), "b")
        .select("b", "vq", F.pmod(F.col("h") + F.col("ob"), F.lit(RESOLUTION)).alias("u"))
    )
    w: F.Column = F.lit(7)
    for k, t in reversed(list(enumerate(_PB_THRESH))):
        w = F.when(F.col("u") < t, F.lit(k)).otherwise(w)
    wd = w.cast("decimal(38,0)")
    rs = x.groupBy("b").agg(
        (
            F.sum(wd * F.col("vq")).cast("double")
            / F.sum(wd).cast("double")
            / 1000000.0
        ).alias("mean_b")
    )
    return rs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_resamples"),
        F.round(davg("mean_b"), 6).alias("mean_of_means"),
        F.round(F.percentile("mean_b", F.lit(0.05)), 6).alias("ci_lo"),
        F.round(F.percentile("mean_b", F.lit(0.95)), 6).alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# TOST equivalence test between the hash-split arms
# --------------------------------------------------------------------------

_TOST_SEED = 7  # same split as stats_cuped_adjustment: arms are comparable
_TOST_MARGIN_FRAC = 0.05


def _sql_tost() -> str:
    arm = f"({sql_hash60('user_id::VARCHAR', seed=_TOST_SEED)} % 2)"
    phi = "1.0 / (1.0 + exp(-1.5976 * ({z}) - 0.07056 * ({z}) * ({z}) * ({z})))"
    return f"""
WITH u AS (
  SELECT user_id, {arm} AS arm,
         CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT) AS yq
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT CAST(count(*) FILTER (WHERE arm = 0) AS DOUBLE) AS n0,
         CAST(count(*) FILTER (WHERE arm = 1) AS DOUBLE) AS n1,
         CAST(sum(CAST(yq AS HUGEINT)) FILTER (WHERE arm = 0) AS DOUBLE) AS s0,
         CAST(sum(CAST(yq AS HUGEINT)) FILTER (WHERE arm = 1) AS DOUBLE) AS s1,
         CAST(sum(CAST(yq AS HUGEINT) * yq) FILTER (WHERE arm = 0) AS DOUBLE) AS ss0,
         CAST(sum(CAST(yq AS HUGEINT) * yq) FILTER (WHERE arm = 1) AS DOUBLE) AS ss1
  FROM u
),
d AS (
  SELECT n0, n1,
         s1 / n1 - s0 / n0 AS diff,
         sqrt((ss0 - s0 * s0 / n0) / (n0 - 1) / n0
              + (ss1 - s1 * s1 / n1) / (n1 - 1) / n1) AS se,
         {_TOST_MARGIN_FRAC} * abs((s0 + s1) / (n0 + n1)) AS delta
  FROM g
),
t AS (
  SELECT n0, n1, diff, se, delta,
         (diff + delta) / se AS t_lower,
         (diff - delta) / se AS t_upper
  FROM d
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       round(diff / 1000000.0, 6) AS diff,
       round(se / 1000000.0, 6) AS se,
       round(delta / 1000000.0, 6) AS delta,
       round(1.0 - {phi.format(z='t_lower')}, 6) AS p_lower,
       round({phi.format(z='t_upper')}, 6) AS p_upper,
       CAST(CASE WHEN 1.0 - {phi.format(z='t_lower')} <= 0.05
                  AND {phi.format(z='t_upper')} <= 0.05
            THEN 1 ELSE 0 END AS INT) AS equivalent
FROM t
"""


@register(
    "stats_tost_equivalence",
    oracle=_sql_tost(),
    tags=("stats", "experimentation", "equivalence", "tost"),
)
def stats_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST (two one-sided tests) equivalence readout between the two
    md5 hash-split arms (the CUPED entry's split): 'no significant
    difference' never demonstrates equivalence — TOST does, by testing
    H0: |diff| >= delta with two one-sided Welch z-tests against the
    margin delta = 5% of the grand mean of per-user total value.
    Equivalence is declared iff BOTH one-sided p-values <= 0.05 (i.e.
    the 90% CI for the difference sits inside +/-delta) — the readout
    an A/A gate or a non-inferiority launch check runs.

    Exactness: per-user totals are exact micro-unit integers; arm
    moments accumulate in HUGEINT/decimal; diff/se/delta and the two
    z-statistics are single double expressions; the normal CDF is the
    Bowling logistic closed form with identical expression text (the
    BH-FDR entry's convention).

    Scale shape: one groupBy-user shuffle, then ONE 6-statistic
    FILTERed aggregate — no window, no driver data; left-assoc folds
    nowhere needed (two-arm folds are single expressions)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    u = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 1000000.0).cast("bigint"))
            .cast("bigint")
            .alias("yq")
        )
        .select(
            F.pmod(
                hash60(F.col("user_id").cast("string"), seed=_TOST_SEED), F.lit(2)
            ).alias("arm"),
            "yq",
        )
    )
    yd = F.col("yq").cast("decimal(38,0)")
    a0 = F.col("arm") == 0
    a1 = F.col("arm") == 1
    g = u.agg(
        F.count(F.when(a0, F.lit(1))).cast("double").alias("n0"),
        F.count(F.when(a1, F.lit(1))).cast("double").alias("n1"),
        F.sum(F.when(a0, yd)).cast("double").alias("s0"),
        F.sum(F.when(a1, yd)).cast("double").alias("s1"),
        F.sum(F.when(a0, yd * F.col("yq"))).cast("double").alias("ss0"),
        F.sum(F.when(a1, yd * F.col("yq"))).cast("double").alias("ss1"),
    )
    d = g.select(
        "n0",
        "n1",
        (F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")).alias("diff"),
        F.sqrt(
            (F.col("ss0") - F.col("s0") * F.col("s0") / F.col("n0"))
            / (F.col("n0") - 1)
            / F.col("n0")
            + (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1"))
            / (F.col("n1") - 1)
            / F.col("n1")
        ).alias("se"),
        (
            F.lit(_TOST_MARGIN_FRAC)
            * F.abs((F.col("s0") + F.col("s1")) / (F.col("n0") + F.col("n1")))
        ).alias("delta"),
    )
    t = d.select(
        "n0",
        "n1",
        "diff",
        "se",
        "delta",
        ((F.col("diff") + F.col("delta")) / F.col("se")).alias("t_lower"),
        ((F.col("diff") - F.col("delta")) / F.col("se")).alias("t_upper"),
    )

    def phi(z: F.Column) -> F.Column:
        return F.lit(1.0) / (
            F.lit(1.0) + F.exp(F.lit(-1.5976) * z - F.lit(0.07056) * z * z * z)
        )

    p_lower = F.lit(1.0) - phi(F.col("t_lower"))
    p_upper = phi(F.col("t_upper"))
    return t.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(F.col("diff") / 1000000.0, 6).alias("diff"),
        F.round(F.col("se") / 1000000.0, 6).alias("se"),
        F.round(F.col("delta") / 1000000.0, 6).alias("delta"),
        F.round(p_lower, 6).alias("p_lower"),
        F.round(p_upper, 6).alias("p_upper"),
        F.when((p_lower <= 0.05) & (p_upper <= 0.05), 1)
        .otherwise(0)
        .cast("int")
        .alias("equivalent"),
    )

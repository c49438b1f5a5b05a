"""Round-6 additions, part 11: paired-classifier McNemar test, Cohen's
d / Hedges' g effect sizes, the G-test of independence, and ridge
regression via regularized normal equations.

Catalog contract as everywhere (see catalog.py): each entry is a
(PySpark program, DuckDB oracle SQL) pair with identical semantics —
exact-integer sufficient statistics (micro-unit quantized inputs,
HUGEINT/decimal(38,0) accumulators), nano-quantized log terms before
any cross-cell sum, identical scalar-algebra expression text on both
engines — hash-compared at sf0.01 by the driver.

Reference parity: the reference (analyse.py) has no inferential-stats
surface; these complete SURVEY.md §2's aggregation family with the
paired-comparison / effect-size / regularized-regression readouts an
experimentation and model-training pipeline needs next to the already
shipped chi-square, Welch, TOST, CUPED, and multiple-OLS entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import text as tx
from .datapipe.hashing import hash60, sql_hash60

# Bowling et al.'s logistic approximation to the normal CDF — the
# BH-FDR / TOST convention: identical expression text on both engines.
_PHI = "1.0 / (1.0 + exp(-1.5976 * ({z}) - 0.07056 * ({z}) * ({z}) * ({z})))"

# --------------------------------------------------------------------------
# McNemar's test: paired comparison of two lang-ID classifiers
# --------------------------------------------------------------------------

_MCN_STOPWORDS = "('the', 'a', 'of', 'and', 'is')"
_MCN_THRESHOLD = 0.08  # classifier A: the eval_cohens_kappa decision rule


def _sql_mcnemar() -> str:
    toks = tx.sql_tokens("text")
    phi = _PHI.format(z="sqrt((abs(CAST(b AS DOUBLE) - c) - 1.0) "
                        "* (abs(CAST(b AS DOUBLE) - c) - 1.0) / (b + c))")
    return f"""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth,
         CASE WHEN round(len(list_filter({toks}, t -> t IN {_MCN_STOPWORDS}))
                      / CAST(len({toks}) AS DOUBLE), 9) >= {_MCN_THRESHOLD}
              THEN 1 ELSE 0 END AS pa,
         CASE WHEN len(list_filter({toks}, t -> t = 'the')) > 0
              THEN 1 ELSE 0 END AS pb
  FROM documents
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE pa = truth AND pb = truth) AS BIGINT)
           AS both_right,
         CAST(count(*) FILTER (WHERE pa = truth AND pb <> truth) AS BIGINT) AS b,
         CAST(count(*) FILTER (WHERE pa <> truth AND pb = truth) AS BIGINT) AS c,
         CAST(count(*) FILTER (WHERE pa <> truth AND pb <> truth) AS BIGINT)
           AS both_wrong
  FROM scored
)
SELECT n, both_right, b, c, both_wrong,
       round((abs(CAST(b AS DOUBLE) - c) - 1.0)
             * (abs(CAST(b AS DOUBLE) - c) - 1.0) / (b + c), 9) AS chi2_cc,
       round(2.0 * (1.0 - {phi}), 6) AS p_value
FROM c
"""


@register(
    "stats_mcnemar_test",
    oracle=_sql_mcnemar(),
    tags=("stats", "eval", "paired-test", "mcnemar"),
)
def stats_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test (continuity-corrected) comparing two lang-ID
    classifiers on the SAME documents: classifier A = the thresholded
    stopword-ratio rule (``eval_cohens_kappa``'s 9-dp decision
    boundary), classifier B = presence of the token 'the'. Accuracy
    deltas on paired predictions must be tested on the DISCORDANT
    pairs only — chi2 = (|b-c|-1)^2/(b+c) where b = A right & B wrong,
    c = A wrong & B right — the standard readout for "is the new model
    actually better on the same eval set". Two-sided p via the Bowling
    logistic CDF (the BH-FDR/TOST convention).

    The whole statistic is ONE map-side-combinable aggregate producing
    five exact BIGINT cells; chi2 and p are single double expressions
    over those integers with identical text on both engines. At 100 TB
    this is one scan, one 5-cell combine — no shuffle wider than the
    final 1-row reduce."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("truth"),
        tx.tokens("text").alias("toks"),
    )
    stop = F.filter(F.col("toks"), lambda t: t.isin("the", "a", "of", "and", "is"))
    the = F.filter(F.col("toks"), lambda t: t == "the")
    scored = base.select(
        "truth",
        (
            F.round(F.size(stop) / F.size("toks").cast("double"), 9)
            >= _MCN_THRESHOLD
        ).cast("int").alias("pa"),
        (F.size(the) > 0).cast("int").alias("pb"),
    )
    c = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when((F.col("pa") == F.col("truth")) & (F.col("pb") == F.col("truth")), 1))
        .cast("bigint")
        .alias("both_right"),
        F.count(F.when((F.col("pa") == F.col("truth")) & (F.col("pb") != F.col("truth")), 1))
        .cast("bigint")
        .alias("b"),
        F.count(F.when((F.col("pa") != F.col("truth")) & (F.col("pb") == F.col("truth")), 1))
        .cast("bigint")
        .alias("c"),
        F.count(F.when((F.col("pa") != F.col("truth")) & (F.col("pb") != F.col("truth")), 1))
        .cast("bigint")
        .alias("both_wrong"),
    )
    diff = F.abs(F.col("b").cast("double") - F.col("c")) - F.lit(1.0)
    chi2 = diff * diff / (F.col("b") + F.col("c"))
    z = F.sqrt(chi2)
    phi = 1.0 / (
        1.0 + F.exp(F.lit(-1.5976) * z - F.lit(0.07056) * z * z * z)
    )
    return c.select(
        "n",
        "both_right",
        "b",
        "c",
        "both_wrong",
        F.round(chi2, 9).alias("chi2_cc"),
        F.round(2.0 * (1.0 - phi), 6).alias("p_value"),
    )


# --------------------------------------------------------------------------
# Cohen's d / Hedges' g between the md5 hash-split arms
# --------------------------------------------------------------------------

_EFFECT_SEED = 7  # the CUPED/TOST split: arms are comparable across entries


def _sql_cohens_d() -> str:
    arm = f"({sql_hash60('user_id::VARCHAR', seed=_EFFECT_SEED)} % 2)"
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
         CAST(sum(CAST(yq AS HUGEINT) * yq) FILTER (WHERE arm = 0) AS DOUBLE)
           AS ss0,
         CAST(sum(CAST(yq AS HUGEINT) * yq) FILTER (WHERE arm = 1) AS DOUBLE)
           AS ss1
  FROM u
),
d AS (
  SELECT n0, n1,
         s1 / n1 - s0 / n0 AS diff,
         sqrt(((ss0 - s0 * s0 / n0) + (ss1 - s1 * s1 / n1))
              / (n0 + n1 - 2.0)) AS sp
  FROM g
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       round(diff / 1000000.0, 6) AS diff,
       round(sp / 1000000.0, 6) AS pooled_sd,
       round(diff / sp, 9) AS cohens_d,
       round((diff / sp) * (1.0 - 3.0 / (4.0 * (n0 + n1) - 9.0)), 9)
         AS hedges_g
FROM d
"""


@register(
    "stats_cohens_d_effect",
    oracle=_sql_cohens_d(),
    tags=("stats", "experimentation", "effect-size"),
)
def stats_cohens_d_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g — the standardized effect sizes that a
    significance test alone never reports — between the two md5
    hash-split arms on per-user total event value (the CUPED/TOST
    fixture: same seed, so the three experimentation readouts describe
    the SAME experiment). d = (mean1 - mean0) / pooled SD with the
    pooled variance over (n0 + n1 - 2) df; Hedges' g applies the
    small-sample bias correction J = 1 - 3/(4N - 9).

    Exactness: per-user totals are exact micro-unit integers; the six
    FILTERed moments accumulate in HUGEINT/decimal(38,0); diff, the
    pooled SD, and both effect sizes are single double expressions with
    identical association order on both engines (the TOST expression
    discipline).

    Scale shape: one groupBy-user shuffle (map-side combined), then ONE
    6-statistic FILTERed aggregate to a single row — no window, no
    driver data."""
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
                hash60(F.col("user_id").cast("string"), seed=_EFFECT_SEED),
                F.lit(2),
            ).alias("arm"),
            "yq",
        )
    )
    yd = F.col("yq").cast("decimal(38,0)")
    g = u.agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("double").alias("n0"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("double").alias("n1"),
        F.sum(F.when(F.col("arm") == 0, yd)).cast("double").alias("s0"),
        F.sum(F.when(F.col("arm") == 1, yd)).cast("double").alias("s1"),
        F.sum(F.when(F.col("arm") == 0, yd * F.col("yq"))).cast("double").alias("ss0"),
        F.sum(F.when(F.col("arm") == 1, yd * F.col("yq"))).cast("double").alias("ss1"),
    )
    diff = F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")
    sp = F.sqrt(
        (
            (F.col("ss0") - F.col("s0") * F.col("s0") / F.col("n0"))
            + (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1"))
        )
        / (F.col("n0") + F.col("n1") - 2.0)
    )
    d = g.select("n0", "n1", diff.alias("diff"), sp.alias("sp"))
    j = 1.0 - 3.0 / (4.0 * (F.col("n0") + F.col("n1")) - 9.0)
    return d.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(F.col("diff") / 1000000.0, 6).alias("diff"),
        F.round(F.col("sp") / 1000000.0, 6).alias("pooled_sd"),
        F.round(F.col("diff") / F.col("sp"), 9).alias("cohens_d"),
        F.round((F.col("diff") / F.col("sp")) * j, 9).alias("hedges_g"),
    )


# --------------------------------------------------------------------------
# G-test of independence (log-likelihood-ratio twin of the chi-square)
# --------------------------------------------------------------------------


def _sql_gtest() -> str:
    exp = "(CAST(r.nl AS DOUBLE) * ct.ns) / t.n"
    return f"""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2
),
rowt AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl FROM documents GROUP BY 1),
colt AS (SELECT source, CAST(count(*) AS BIGINT) AS ns FROM documents GROUP BY 1),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT lang) AS BIGINT) AS l,
         CAST(count(DISTINCT source) AS BIGINT) AS s
  FROM documents
)
SELECT round(2.0 * CAST(sum(CAST(round(
           CAST(c.o AS DOUBLE) * ln(CAST(c.o AS DOUBLE) / ({exp})) * 1e9)
           AS HUGEINT)) AS DOUBLE) / 1e9, 6) AS g_stat,
       min((t.l - 1) * (t.s - 1)) AS dof,
       min(t.n) AS n
FROM cells c
JOIN rowt r USING (lang)
JOIN colt ct USING (source)
CROSS JOIN tot t
ORDER BY 1
"""


@register(
    "stats_gtest_independence",
    oracle=_sql_gtest(),
    tags=("stats", "gtest", "contingency"),
)
def stats_gtest_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test of independence on the lang x source contingency table —
    the log-likelihood-ratio twin of ``stats_chi2_lang_source`` (same
    marginal machinery, same expected-count expression text): G = 2 ·
    Σ O·ln(O/E). Preferred over Pearson when any cell's O/E ratio is
    large, and the form whose cell terms ADD across partitions of the
    data (the property mutual-information / feature-selection pipelines
    exploit). Zero-count cells contribute no term by construction
    (absent from the observed-cells frame), matching the 0·ln0 = 0
    convention.

    Exactness: each cell's O·ln(O/E) is nano-quantized BEFORE the
    cross-cell sum (HUGEINT/decimal accumulator), so G is
    partitioning- and engine-independent; E uses the identical
    (row_total * col_total)/N double expression as the chi-square
    entry. Scale: one scan per marginal, every post-scan frame is
    (langs x sources)-sized."""
    docs = _t(spark, sf_dir, "documents").select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rowt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("nl"))
    colt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    tot = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("lang").alias("l"),
        F.countDistinct("source").alias("s"),
    )
    exp = (F.col("nl").cast("double") * F.col("ns")) / F.col("n")
    term = F.round(
        F.col("o").cast("double") * F.log(F.col("o").cast("double") / exp) * 1e9
    ).cast("decimal(38,0)")
    joined = (
        cells.join(rowt, "lang")
        .join(colt, "source")
        .crossJoin(F.broadcast(tot))
    )
    return joined.agg(
        F.round(2.0 * F.sum(term).cast("double") / 1e9, 6).alias("g_stat"),
        F.min((F.col("l") - 1) * (F.col("s") - 1)).alias("dof"),
        F.min("n").alias("n"),
    ).orderBy("g_stat")


# --------------------------------------------------------------------------
# Ridge regression via regularized normal equations
# --------------------------------------------------------------------------

_RIDGE_LAMBDA_FRAC = 0.1  # lambda = 0.1 * n on the quantized-unit grid


def _sql_ridge() -> str:
    lam = f"({_RIDGE_LAMBDA_FRAC} * n)"
    det = f"((s11c + {lam}) * (s22c + {lam}) - s12c * s12c)"
    return f"""
WITH q AS (
  SELECT CAST(round(l_quantity * 100.0) AS BIGINT) AS x1,
         CAST(round(l_discount * 10000.0) AS BIGINT) AS x2,
         CAST(round(l_extendedprice * 100.0) AS BIGINT) AS y
  FROM lineitem
),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(sum(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
         CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
         CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
         CAST(sum(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
         CAST(sum(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y
  FROM q
),
c AS (
  SELECT n, s1, s2, sy,
         s11 - s1 * s1 / n AS s11c,
         s22 - s2 * s2 / n AS s22c,
         s12 - s1 * s2 / n AS s12c,
         s1y - s1 * sy / n AS s1yc,
         s2y - s2 * sy / n AS s2yc
  FROM g
),
b AS (
  SELECT n, s1, s2, sy,
         (s1yc * (s22c + {lam}) - s12c * s2yc) / {det} AS b1,
         ((s11c + {lam}) * s2yc - s12c * s1yc) / {det} AS b2
  FROM c
)
SELECT CAST(n AS BIGINT) AS n,
       round({lam} / n, 6) AS lambda_per_row,
       round((sy / n - b1 * (s1 / n) - b2 * (s2 / n)) / 100.0, 6) AS beta0,
       round(b1, 6) AS beta1,
       round(b2 * 100.0, 6) AS beta2
FROM b
"""


@register(
    "ml_ridge_normal_equations",
    oracle=_sql_ridge(),
    tags=("ml", "regression", "ridge"),
)
def ml_ridge_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge (L2-regularized) regression on ``regression_multiple_ols``'s
    fixture — extendedprice ~ quantity + discount — via the regularized
    normal equations (X'X_centered + lambda·I) beta = X'y_centered,
    solved in closed form on the 2x2 centered-moment matrix. The
    intercept is NOT penalized (the standard convention: center first,
    shrink the slopes, recover beta0 from the means). lambda scales
    with n (0.1·n on the quantized grid) so the shrinkage strength is
    row-count-invariant — the hyperparameter contract a distributed
    trainer needs.

    Exactness: the nine sufficient statistics accumulate the SAME
    exact HUGEINT/decimal(38,0) integers as the OLS entry; centering,
    the 2x2 Cramer solve, and the descaling are single double
    expressions with identical association order on both engines.

    Scale shape: ONE map-side-combined moment pass over the fact table,
    then row-local algebra on a 1-row frame — the one-pass distributed-
    ML recipe (same as OLS; regularization costs nothing extra)."""
    li = _t(spark, sf_dir, "lineitem")
    q = li.select(
        F.round(F.col("l_quantity") * 100.0).cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 10000.0).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100.0).cast("bigint").alias("y"),
    )
    d1 = F.col("x1").cast("decimal(38,0)")
    d2 = F.col("x2").cast("decimal(38,0)")
    dy = F.col("y").cast("decimal(38,0)")
    g = q.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d1).cast("double").alias("s1"),
        F.sum(d2).cast("double").alias("s2"),
        F.sum(dy).cast("double").alias("sy"),
        F.sum(d1 * F.col("x1")).cast("double").alias("s11"),
        F.sum(d2 * F.col("x2")).cast("double").alias("s22"),
        F.sum(d1 * F.col("x2")).cast("double").alias("s12"),
        F.sum(d1 * F.col("y")).cast("double").alias("s1y"),
        F.sum(d2 * F.col("y")).cast("double").alias("s2y"),
    )
    c = g.select(
        "n",
        "s1",
        "s2",
        "sy",
        (F.col("s11") - F.col("s1") * F.col("s1") / F.col("n")).alias("s11c"),
        (F.col("s22") - F.col("s2") * F.col("s2") / F.col("n")).alias("s22c"),
        (F.col("s12") - F.col("s1") * F.col("s2") / F.col("n")).alias("s12c"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / F.col("n")).alias("s1yc"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / F.col("n")).alias("s2yc"),
    )
    lam = F.lit(_RIDGE_LAMBDA_FRAC) * F.col("n")
    det = (F.col("s11c") + lam) * (F.col("s22c") + lam) - F.col("s12c") * F.col(
        "s12c"
    )
    b1 = (F.col("s1yc") * (F.col("s22c") + lam) - F.col("s12c") * F.col("s2yc")) / det
    b2 = ((F.col("s11c") + lam) * F.col("s2yc") - F.col("s12c") * F.col("s1yc")) / det
    b = c.select("n", "s1", "s2", "sy", b1.alias("b1"), b2.alias("b2"))
    return b.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(F.lit(_RIDGE_LAMBDA_FRAC) * F.col("n") / F.col("n"), 6).alias(
            "lambda_per_row"
        ),
        F.round(
            (
                F.col("sy") / F.col("n")
                - F.col("b1") * (F.col("s1") / F.col("n"))
                - F.col("b2") * (F.col("s2") / F.col("n"))
            )
            / 100.0,
            6,
        ).alias("beta0"),
        F.round(F.col("b1"), 6).alias("beta1"),
        F.round(F.col("b2") * 100.0, 6).alias("beta2"),
    )

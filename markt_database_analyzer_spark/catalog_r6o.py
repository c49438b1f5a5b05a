"""Round-6 additions, part 15: A/B power analysis (minimum detectable
effect + required sample size), train/eval n-gram novelty, and a
lognormal fit with a Kolmogorov-Smirnov goodness-of-fit distance on the
distributed prefix-sum path.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle SQL) pairs with identical semantics — exact-integer
sufficient statistics, nano-quantized log values, z-quantile constants
injected as identical decimal literals, total orderings at every row
selection — hash-compared at sf0.01 by the driver.

Reference parity: the reference (analyse.py) has none of these; they
complete the experimentation suite (design-side power next to the
readout-side CUPED/TOST/effect-size/SRM entries), the contamination
family (`pipeline_contamination_check`'s generalization twin), and the
distribution-fitting family (KS machinery against a FITTED model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import text as tx
from .datapipe.hashing import hash60, sql_hash60
from .datapipe.sampling import RESOLUTION, sql_gate, train_eval_split
from .operators.equidepth import value_counts_cum

# Bowling et al.'s logistic approximation to the normal CDF — the
# BH-FDR / TOST / SRM convention: identical expression text both engines.
_PHI = "1.0 / (1.0 + exp(-1.5976 * ({z}) - 0.07056 * ({z}) * ({z}) * ({z})))"

# --------------------------------------------------------------------------
# Power analysis: MDE at current n, required n for a 2% lift
# --------------------------------------------------------------------------

_POWER_SEED = 7  # the CUPED/TOST/SRM split — designing for the same experiment
# z_{alpha/2} at alpha=0.05 and z_beta at 80% power, injected as IDENTICAL
# decimal literals on both engines (quantile functions differ per libm).
_Z_ALPHA = "1.959963984540054"
_Z_BETA = "0.8416212335729143"
_MDE_REL_TARGET = 0.02  # size the experiment for a 2% lift


def _sql_power() -> str:
    arm = f"({sql_hash60('user_id::VARCHAR', seed=_POWER_SEED)} % 2)"
    return f"""
WITH u AS (
  SELECT user_id, {arm} AS arm,
         CAST(sum(CAST(round(value * 1000000.0) AS BIGINT)) AS BIGINT) AS yq
  FROM events GROUP BY 1, 2
),
g AS (
  SELECT CAST(count(*) FILTER (WHERE arm = 0) AS DOUBLE) AS n0,
         CAST(count(*) FILTER (WHERE arm = 1) AS DOUBLE) AS n1,
         CAST(sum(CAST(yq AS HUGEINT)) AS DOUBLE) AS s,
         CAST(sum(CAST(yq AS HUGEINT) * yq) AS DOUBLE) AS ss,
         CAST(sum(CAST(yq AS HUGEINT)) FILTER (WHERE arm = 0) AS DOUBLE) AS s0,
         CAST(sum(CAST(yq AS HUGEINT)) FILTER (WHERE arm = 1) AS DOUBLE) AS s1,
         CAST(sum(CAST(yq AS HUGEINT) * yq) FILTER (WHERE arm = 0) AS DOUBLE)
           AS ss0,
         CAST(sum(CAST(yq AS HUGEINT) * yq) FILTER (WHERE arm = 1) AS DOUBLE)
           AS ss1
  FROM u
),
d AS (
  SELECT n0, n1, s / (n0 + n1) AS mean_y,
         sqrt(((ss0 - s0 * s0 / n0) + (ss1 - s1 * s1 / n1))
              / (n0 + n1 - 2.0)) AS sp
  FROM g
)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       round(mean_y / 1000000.0, 6) AS mean_y,
       round(sp / 1000000.0, 6) AS pooled_sd,
       round(({_Z_ALPHA} + {_Z_BETA}) * sp * sqrt(1.0 / n0 + 1.0 / n1)
             / 1000000.0, 6) AS mde_abs,
       round(({_Z_ALPHA} + {_Z_BETA}) * sp * sqrt(1.0 / n0 + 1.0 / n1)
             / mean_y, 9) AS mde_rel,
       CAST(ceil(2.0 * sp * sp
                 * ({_Z_ALPHA} + {_Z_BETA}) * ({_Z_ALPHA} + {_Z_BETA})
                 / (({_MDE_REL_TARGET} * mean_y) * ({_MDE_REL_TARGET} * mean_y)))
            AS BIGINT) AS n_required_per_arm
FROM d
"""


@register(
    "stats_power_mde",
    oracle=_sql_power(),
    tags=("stats", "experimentation", "power", "mde"),
)
def stats_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power analysis for the seed-7 experiment the CUPED / TOST /
    effect-size / SRM entries read out: the minimum detectable effect
    at the CURRENT per-arm sample sizes (two-sided alpha = 0.05, 80%
    power: MDE = (z_a2 + z_b) · s_p · √(1/n0 + 1/n1)) and the required
    per-arm n to detect a 2% lift of the grand mean (n = 2 s²(z_a2 +
    z_b)²/δ²) — the DESIGN-side readout that decides whether an
    experiment is worth running before any effect is estimated.

    Exactness: the same exact HUGEINT/decimal moment machinery as the
    TOST entry (per-user micro-unit totals, FILTERed arm moments);
    the two z-quantiles are injected as IDENTICAL decimal literals on
    both engines (quantile functions are libm-dependent); MDE and the
    sample size are single double expressions.

    Scale shape: one groupBy-user shuffle (map-side combined), ONE
    8-statistic FILTERed aggregate, row-local algebra on a 1-row
    frame."""
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
                hash60(F.col("user_id").cast("string"), seed=_POWER_SEED),
                F.lit(2),
            ).alias("arm"),
            "yq",
        )
    )
    yd = F.col("yq").cast("decimal(38,0)")
    g = u.agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("double").alias("n0"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("double").alias("n1"),
        F.sum(yd).cast("double").alias("s"),
        F.sum(yd * F.col("yq")).cast("double").alias("ss"),
        F.sum(F.when(F.col("arm") == 0, yd)).cast("double").alias("s0"),
        F.sum(F.when(F.col("arm") == 1, yd)).cast("double").alias("s1"),
        F.sum(F.when(F.col("arm") == 0, yd * F.col("yq"))).cast("double").alias("ss0"),
        F.sum(F.when(F.col("arm") == 1, yd * F.col("yq"))).cast("double").alias("ss1"),
    )
    mean_y = F.col("s") / (F.col("n0") + F.col("n1"))
    sp = F.sqrt(
        (
            (F.col("ss0") - F.col("s0") * F.col("s0") / F.col("n0"))
            + (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1"))
        )
        / (F.col("n0") + F.col("n1") - 2.0)
    )
    d = g.select("n0", "n1", mean_y.alias("mean_y"), sp.alias("sp"))
    zsum = F.lit(float(_Z_ALPHA)) + F.lit(float(_Z_BETA))
    mde = zsum * F.col("sp") * F.sqrt(1.0 / F.col("n0") + 1.0 / F.col("n1"))
    delta = F.lit(_MDE_REL_TARGET) * F.col("mean_y")
    return d.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(F.col("mean_y") / 1000000.0, 6).alias("mean_y"),
        F.round(F.col("sp") / 1000000.0, 6).alias("pooled_sd"),
        F.round(mde / 1000000.0, 6).alias("mde_abs"),
        F.round(mde / F.col("mean_y"), 9).alias("mde_rel"),
        F.ceil(2.0 * F.col("sp") * F.col("sp") * zsum * zsum / (delta * delta))
        .cast("bigint")
        .alias("n_required_per_arm"),
    )


# --------------------------------------------------------------------------
# Train/eval trigram novelty (generalization-gap readout)
# --------------------------------------------------------------------------

_NOV_EVAL_FRACTION = 0.1
_NOV_SEED = 1  # the split_train_eval seed: contamination checks align


def _sql_novelty() -> str:
    gate = sql_gate("doc_id::VARCHAR", seed=_NOV_SEED)
    thresh = int(_NOV_EVAL_FRACTION * RESOLUTION)
    toks = tx.sql_tokens("text")
    g60 = sql_hash60("g")
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN {gate} < {thresh} THEN 'eval' ELSE 'train' END AS split,
         {toks} AS t
  FROM documents
),
tri AS (
  SELECT lang, split,
         {g60} AS g60
  FROM (
    SELECT lang, split,
           unnest(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
             AS g
    FROM toks WHERE len(t) >= 3
  )
),
train_set AS (SELECT DISTINCT g60 FROM tri WHERE split = 'train'),
eval_set AS (SELECT DISTINCT lang, g60 FROM tri WHERE split = 'eval')
SELECT e.lang,
       CAST(count(*) AS BIGINT) AS eval_trigrams,
       CAST(count(*) FILTER (WHERE t.g60 IS NULL) AS BIGINT) AS novel_trigrams,
       round(count(*) FILTER (WHERE t.g60 IS NULL) / CAST(count(*) AS DOUBLE), 9)
         AS novelty_rate
FROM eval_set e LEFT JOIN train_set t USING (g60)
GROUP BY e.lang ORDER BY e.lang
"""


@register(
    "text_ngram_novelty",
    oracle=_sql_novelty(),
    tags=("text", "ngram", "contamination", "generalization"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram novelty of the eval split against the train split (10%
    eval by the seed-1 hash gate — the ``split_train_eval`` gate, so
    novelty and contamination reports describe the same holdout): the
    fraction of distinct eval trigrams NEVER seen in training, per
    language. Low novelty = the eval set is memorizable from train
    (contamination's soft sibling); high novelty = the eval genuinely
    tests generalization. The standard pre-training report next to
    `pipeline_contamination_check`'s exact 8-gram hit test.

    Scale shape: trigrams are 60-bit HASHED row-locally before any
    shuffle (the dedup discipline — the shuffle carries 8-byte ints,
    never text); both splits reduce to DISTINCT hash sets (map-side
    combined); the membership test is one left join on the hash. The
    train set at 100 TB is corpus-sized, so the join shuffles
    hash-partitioned ints — no broadcast assumed.

    Exactness: counts are exact BIGINTs; the rate is one integer
    ratio. 60-bit collisions understate novelty by ~n/2^60 — the same
    accepted bias every hashed-dedup entry documents."""
    docs = train_eval_split(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        eval_fraction=_NOV_EVAL_FRACTION,
        seed=_NOV_SEED,
    )
    toks = docs.select("lang", "split", tx.tokens("text").alias("t"))
    t = F.col("t")
    tri = toks.filter(F.size(t) >= 3).select(
        "lang",
        "split",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(t, i),
                    F.element_at(t, i + 1),
                    F.element_at(t, i + 2),
                ),
            )
        ).alias("g"),
    ).select("lang", "split", hash60(F.col("g")).alias("g60"))
    train_set = (
        tri.filter(F.col("split") == "train").select("g60").distinct()
    )
    eval_set = (
        tri.filter(F.col("split") == "eval").select("lang", "g60").distinct()
    )
    joined = eval_set.join(
        train_set.withColumn("seen", F.lit(1)), "g60", "left"
    )
    return (
        joined.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("eval_trigrams"),
            F.count(F.when(F.col("seen").isNull(), 1))
            .cast("bigint")
            .alias("novel_trigrams"),
        )
        .select(
            "lang",
            "eval_trigrams",
            "novel_trigrams",
            F.round(
                F.col("novel_trigrams") / F.col("eval_trigrams").cast("double"),
                9,
            ).alias("novelty_rate"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Lognormal fit + KS goodness-of-fit on the prefix-sum path
# --------------------------------------------------------------------------


def _sql_lognormal_ks() -> str:
    phi = _PHI.format(z="(v / 1e9 - mu) / sigma")
    return f"""
WITH q AS (
  SELECT CAST(round(ln(CAST(round(l_extendedprice * 100.0) AS BIGINT)) * 1e9)
              AS BIGINT) AS v
  FROM lineitem
),
dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(count(*)) OVER (ORDER BY v) AS BIGINT) AS cum
  FROM q GROUP BY v
),
fit AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
           / count(*) / 1e9 AS mu,
         sqrt((CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE) / 1e18
               - count(*) * (CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
                             / count(*) / 1e9)
                          * (CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
                             / count(*) / 1e9))
              / (count(*) - 1)) AS sigma
  FROM q
),
ks AS (
  SELECT v, n, mu, sigma,
         greatest(abs(cum / n - {phi}),
                  abs((cum - cnt) / n - {phi})) AS d
  FROM dom, fit
)
SELECT CAST(n AS BIGINT) AS n, round(mu, 9) AS mu, round(sigma, 9) AS sigma,
       round(d, 9) AS ks_stat,
       round(v / 1e9, 9) AS ks_at_log_value
FROM ks ORDER BY d DESC, v LIMIT 1
"""


@register(
    "stats_lognormal_fit_ks",
    oracle=_sql_lognormal_ks(),
    tags=("stats", "distribution-fit", "ks", "scale-path"),
)
def stats_lognormal_fit_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal fit of extended price by log-moment matching (mu,
    sigma of ln cents) plus the one-sample Kolmogorov-Smirnov distance
    between the empirical CDF and the FITTED lognormal — the
    distribution-fitting readout a pricing/latency pipeline runs
    ('is this heavy tail lognormal enough to model?').
    ``stats_ks_test`` compares two samples; this compares sample vs
    model, which needs the exact ECDF at every distinct value.

    Exactness: log values are nano-quantized integers; the fit moments
    accumulate them in HUGEINT/decimal(38,0) (sum of squares ~1e27 —
    exact); the model CDF is the Bowling logistic closed form with
    identical expression text; the KS distance takes the sup over BOTH
    one-sided gaps (cum/n and (cum-cnt)/n) at every distinct value,
    and the argmax is a TakeOrdered over the (d desc, v) total order.

    Scale shape: the ECDF comes from the distributed distinct-domain
    prefix sum (``value_counts_cum``: range-repartitioned, partitioned
    windows, broadcast offsets — the _cuts machinery); the 1-row fit
    broadcasts onto the domain frame. The oracle's global window is
    the semantic spec only."""
    li = _t(spark, sf_dir, "lineitem")
    q = li.select(
        F.round(
            F.log(F.round(F.col("l_extendedprice") * 100.0).cast("bigint").cast("double"))
            * 1e9
        )
        .cast("bigint")
        .alias("v")
    ).localCheckpoint(eager=True)  # feeds the domain AND the fit moments
    dom, _n = value_counts_cum(q, F.col("v"))
    vd = F.col("v").cast("decimal(38,0)")
    fit = q.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
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
    z = (F.col("v") / 1e9 - F.col("mu")) / F.col("sigma")
    cdf = 1.0 / (1.0 + F.exp(F.lit(-1.5976) * z - F.lit(0.07056) * z * z * z))
    ks = dom.crossJoin(F.broadcast(fit)).select(
        "v",
        "n",
        "mu",
        "sigma",
        F.greatest(
            F.abs(F.col("cum") / F.col("n") - cdf),
            F.abs((F.col("cum") - F.col("cnt")) / F.col("n") - cdf),
        ).alias("d"),
    )
    return (
        # argmax on the RAW d/v (matching the oracle's ORDER BY d DESC, v)
        # BEFORE the 9-dp rounding projection, so two domain values whose
        # d round to the same figure cannot select different rows per
        # engine (ADVICE r6).
        ks.orderBy(F.desc("d"), "v")
        .limit(1)
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("mu"), 9).alias("mu"),
            F.round(F.col("sigma"), 9).alias("sigma"),
            F.round(F.col("d"), 9).alias("ks_stat"),
            F.round(F.col("v") / 1e9, 9).alias("ks_at_log_value"),
        )
    )

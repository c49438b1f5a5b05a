"""Round-3 twentieth tranche: full-batch logistic-regression training
(deterministic gradient descent), KMV/theta-sketch distinct-intersection
estimation, and classifier calibration bins with expected calibration
error.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs with
identical semantics; every transcendental is evaluated on a 9 dp-quantized
argument and re-rounded at 9 dp (cross-libm parity), every sum is
micro-quantized, every rank has a total-order tie-break."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import text as tx
from .datapipe.hashing import hash60, sql_hash60
from .functions import dsum


# --------------------------------------------------------------------------
# Logistic regression via deterministic full-batch gradient descent
# --------------------------------------------------------------------------
# Features (all row-local, all 9 dp):
#   x1 = English-stopword ratio          x2 = mean token length
#   x3 = type-token ratio                label y = (lang = 'en')
# 8 full-batch GD steps, lr = 1.0, zero init. Each step is ONE aggregate
# over the feature frame (grad_j = Σ (p - y)·x_j, micro-quantized), and
# the weight state is a 1-row broadcast — the MLlib shape: per-iteration
# driver state is O(#features), never O(rows).

_LR_STEPS = 8
_LR_LR = 1.0
_LR_STOP = "('the', 'a', 'of', 'and', 'is')"


def _sql_logreg() -> str:
    toks = tx.sql_tokens("text")
    feats = f"""
feats AS (
  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
         1.0 AS x0,
         round(len(list_filter({toks}, t -> t IN {_LR_STOP}))
                 / CAST(len({toks}) AS DOUBLE), 9) AS x1,
         round(len(array_to_string({toks}, '')) / CAST(len({toks}) AS DOUBLE), 9) AS x2,
         round(len(list_distinct({toks})) / CAST(len({toks}) AS DOUBLE), 9) AS x3
  FROM documents
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM feats),
w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    q = "(CAST(SUM(CAST(round(({t}) * 1000000.0) AS HUGEINT)) AS DOUBLE) / 1000000.0)"
    steps = []
    for s in range(1, _LR_STEPS + 1):
        p = (
            "round(1.0 / (1.0 + exp(-round(b + w1 * x1 + w2 * x2 + w3 * x3, 9))), 9)"
        )
        steps.append(f"""
g{s} AS (
  SELECT {q.format(t=f"({p} - y)")} AS gb,
         {q.format(t=f"({p} - y) * x1")} AS g1,
         {q.format(t=f"({p} - y) * x2")} AS g2,
         {q.format(t=f"({p} - y) * x3")} AS g3
  FROM feats CROSS JOIN w{s-1}
),
w{s} AS (
  SELECT round(b - {_LR_LR} * gb / n, 9) AS b,
         round(w1 - {_LR_LR} * g1 / n, 9) AS w1,
         round(w2 - {_LR_LR} * g2 / n, 9) AS w2,
         round(w3 - {_LR_LR} * g3 / n, 9) AS w3
  FROM g{s} CROSS JOIN w{s-1} CROSS JOIN n
)""")
    p_fin = "round(1.0 / (1.0 + exp(-round(b + w1 * x1 + w2 * x2 + w3 * x3, 9))), 9)"
    return f"""
WITH {feats},
{",".join(steps)}
SELECT b, w1, w2, w3,
       CAST(sum(CASE WHEN ({p_fin} >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(min(n.n) AS BIGINT) AS n_rows,
       round({q.format(t=f"-(y * round(ln({p_fin}), 9) + (1.0 - y) * round(ln(1.0 - {p_fin}), 9))")}
               / min(n.n), 9) AS log_loss
FROM feats CROSS JOIN w{_LR_STEPS} CROSS JOIN n
GROUP BY b, w1, w2, w3
"""


@register(
    "ml_logreg_gd",
    oracle=_sql_logreg(),
    tags=("ml", "classify", "iterative"),
)
def ml_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression trained by 8 deterministic full-batch gradient
    steps (lr=1, zero init) on three row-local text features, predicting
    lang='en'. Per step: one micro-quantized aggregate over the persisted
    feature frame computes the 4 gradients; the weight vector is a 1-row
    broadcast. The sigmoid runs on a 9 dp-quantized logit and is
    re-rounded at 9 dp, so the whole trajectory is bit-identical across
    engines (the exp/ln libm parity convention). Output: final weights,
    training accuracy numerator, and mean log-loss — one row."""
    docs = _t(spark, sf_dir, "documents")
    ts = tx.tokens("text")
    stop = F.filter(ts, lambda t: t.isin("the", "a", "of", "and", "is"))
    nf = F.size(ts).cast("double")
    feats = docs.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.round(F.size(stop) / nf, 9).alias("x1"),
        F.round(F.length(F.array_join(ts, "")) / nf, 9).alias("x2"),
        F.round(F.size(F.array_distinct(ts)) / nf, 9).alias("x3"),
    ).localCheckpoint(eager=True)
    n = feats.count()  # materialized by the checkpoint; exact scalar

    w = {"b": 0.0, "w1": 0.0, "w2": 0.0, "w3": 0.0}
    for _ in range(_LR_STEPS):
        z = F.round(
            F.lit(w["b"])
            + F.lit(w["w1"]) * F.col("x1")
            + F.lit(w["w2"]) * F.col("x2")
            + F.lit(w["w3"]) * F.col("x3"),
            9,
        )
        p = F.round(1.0 / (1.0 + F.exp(-z)), 9)
        g = feats.agg(
            dsum(p - F.col("y")).alias("gb"),
            dsum((p - F.col("y")) * F.col("x1")).alias("g1"),
            dsum((p - F.col("y")) * F.col("x2")).alias("g2"),
            dsum((p - F.col("y")) * F.col("x3")).alias("g3"),
        ).collect()[0]
        # O(#features) driver state per iteration — the MLlib shape; the
        # 9 dp re-round matches the oracle's CTE chain exactly
        w = {
            "b": round(w["b"] - _LR_LR * g["gb"] / n, 9),
            "w1": round(w["w1"] - _LR_LR * g["g1"] / n, 9),
            "w2": round(w["w2"] - _LR_LR * g["g2"] / n, 9),
            "w3": round(w["w3"] - _LR_LR * g["g3"] / n, 9),
        }
    z = F.round(
        F.lit(w["b"])
        + F.lit(w["w1"]) * F.col("x1")
        + F.lit(w["w2"]) * F.col("x2")
        + F.lit(w["w3"]) * F.col("x3"),
        9,
    )
    p = F.round(1.0 / (1.0 + F.exp(-z)), 9)
    nll = -(
        F.col("y") * F.round(F.log(p), 9)
        + (1.0 - F.col("y")) * F.round(F.log(1.0 - p), 9)
    )
    return feats.agg(
        F.lit(w["b"]).alias("b"),
        F.lit(w["w1"]).alias("w1"),
        F.lit(w["w2"]).alias("w2"),
        F.lit(w["w3"]).alias("w3"),
        F.sum(
            F.when((p >= 0.5) == (F.col("y") == 1.0), 1).otherwise(0)
        ).alias("n_correct"),
        F.count(F.lit(1)).alias("n_rows"),
        F.round(dsum(nll) / F.lit(float(n)), 9).alias("log_loss"),
    )


# --------------------------------------------------------------------------
# KMV (theta) sketch: distinct counts + intersection estimates per pair
# --------------------------------------------------------------------------

_KMV_K = 64
_TWO60 = float(1 << 60)


def _sql_kmv() -> str:
    h = sql_hash60("CAST(user_id AS VARCHAR)")
    return f"""
WITH hashes AS (
  SELECT DISTINCT event_type, {h} AS h
  FROM events
),
ranked AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
  FROM hashes
),
kmv AS (SELECT event_type, h, r FROM ranked WHERE r <= {_KMV_K}),
theta AS (
  SELECT event_type, max(h) AS kth, CAST(count(*) AS BIGINT) AS k_eff
  FROM kmv GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         least(a.kth, b.kth) AS theta_star,
         a.kth AS kth_a, b.kth AS kth_b, a.k_eff AS ka, b.k_eff AS kb
  FROM theta a JOIN theta b ON a.event_type < b.event_type
),
common AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM kmv x
  JOIN kmv y ON x.h = y.h AND x.event_type < y.event_type
  JOIN pairs p ON p.type_a = x.event_type AND p.type_b = y.event_type
              AND x.h < p.theta_star
  GROUP BY 1, 2
),
exact AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS exact_inter
  FROM hashes x JOIN hashes y ON x.h = y.h AND x.event_type < y.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       round((p.ka - 1) * {_TWO60} / p.kth_a, 9) AS est_a,
       round((p.kb - 1) * {_TWO60} / p.kth_b, 9) AS est_b,
       round(COALESCE(c.n_common, 0) * {_TWO60} / p.theta_star, 9) AS est_inter,
       COALESCE(e.exact_inter, 0) AS exact_inter
FROM pairs p
LEFT JOIN common c ON c.type_a = p.type_a AND c.type_b = p.type_b
LEFT JOIN exact e ON e.type_a = p.type_a AND e.type_b = p.type_b
ORDER BY p.type_a, p.type_b
"""


@register(
    "sketch_kmv_intersection",
    oracle=_sql_kmv(),
    tags=("sketch", "approx", "distinct"),
)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / theta) sketches over per-event-type user
    sets: distinct-count estimates ((k-1)/θ with θ = kth-smallest hash /
    2^60) and pairwise INTERSECTION estimates (common sketch hashes below
    θ* = min(θ_a, θ_b), scaled by 1/θ*) — the set-operation capability
    HLL lacks. Sketches are k rows/group of a deterministic md5-derived
    hash, so the oracle replays them exactly; the exact intersection
    rides along as the audit column (the expensive side at scale — the
    sketch is the 100 TB path: constant bytes/group, mergeable,
    shuffle-free compare). The audited accuracy stays within the
    published ~1/sqrt(k) envelope (pinned in the unit test)."""
    ev = _t(spark, sf_dir, "events")
    hashes = (
        ev.select("event_type", hash60(F.col("user_id").cast("string")).alias("h"))
        .distinct()
    )
    wr = Window.partitionBy("event_type").orderBy("h")
    kmv = (
        hashes.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") <= _KMV_K)
        .select("event_type", "h")
        .localCheckpoint(eager=True)
    )
    theta = kmv.groupBy("event_type").agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("k_eff")
    )
    ta = theta.select(
        F.col("event_type").alias("type_a"), F.col("kth").alias("kth_a"), F.col("k_eff").alias("ka")
    )
    tb = theta.select(
        F.col("event_type").alias("type_b"), F.col("kth").alias("kth_b"), F.col("k_eff").alias("kb")
    )
    pairs = ta.join(tb, F.col("type_a") < F.col("type_b")).withColumn(
        "theta_star", F.least("kth_a", "kth_b")
    )
    ka = kmv.select(F.col("event_type").alias("type_a"), "h")
    kb = kmv.select(F.col("event_type").alias("type_b"), F.col("h").alias("hb"))
    common = (
        ka.join(kb, (F.col("h") == F.col("hb")) & (F.col("type_a") < F.col("type_b")))
        .join(F.broadcast(pairs.select("type_a", "type_b", "theta_star")), ["type_a", "type_b"])
        .filter(F.col("h") < F.col("theta_star"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ha = hashes.select(F.col("event_type").alias("type_a"), "h")
    hb = hashes.select(F.col("event_type").alias("type_b"), F.col("h").alias("hb"))
    exact = (
        ha.join(hb, (F.col("h") == F.col("hb")) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    return (
        pairs.join(F.broadcast(common), ["type_a", "type_b"], "left")
        .join(F.broadcast(exact), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.round((F.col("ka") - 1) * _TWO60 / F.col("kth_a"), 9).alias("est_a"),
            F.round((F.col("kb") - 1) * _TWO60 / F.col("kth_b"), 9).alias("est_b"),
            F.round(
                F.coalesce(F.col("n_common"), F.lit(0)) * _TWO60 / F.col("theta_star"), 9
            ).alias("est_inter"),
            F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
        )
        .orderBy("type_a", "type_b")
    )


# --------------------------------------------------------------------------
# Calibration bins + expected calibration error (ECE)
# --------------------------------------------------------------------------

_CAL_BINS = 10


def _sql_calibration() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH scored AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         round(len(list_filter({toks}, t -> t IN {_LR_STOP}))
                 / CAST(len({toks}) AS DOUBLE), 9) AS conf
  FROM documents
),
binned AS (
  SELECT y, conf, ntile({_CAL_BINS}) OVER (ORDER BY conf, doc_id) AS bin
  FROM scored
),
per_bin AS (
  SELECT bin,
         CAST(count(*) AS BIGINT) AS n,
         round((CAST(SUM(CAST(round(conf * 1000000.0) AS HUGEINT)) AS DOUBLE)
                  / count(*)) / 1000000.0, 9) AS mean_conf,
         round(sum(y) / CAST(count(*) AS DOUBLE), 9) AS frac_pos
  FROM binned GROUP BY bin
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM per_bin)
SELECT bin, n, mean_conf, frac_pos,
       round(abs(mean_conf - frac_pos), 9) AS gap,
       (CAST(SUM(CAST(round(n * round(abs(mean_conf - frac_pos), 9) * 1000000.0)
                      AS HUGEINT)) OVER () AS DOUBLE) / 1000000.0) / min(nt) OVER () AS ece
FROM per_bin CROSS JOIN tot ORDER BY bin
"""


@register(
    "eval_calibration_bins",
    oracle=_sql_calibration(),
    tags=("eval", "stats", "ml"),
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error for a classifier
    score (stopword ratio as confidence for lang='en'): equal-count bins
    over the (score, doc_id) total order, per-bin mean confidence vs
    empirical positive rate, ECE = Σ n_b/N · |acc_b − conf_b|. The
    companion to eval_roc_auc: ROC ranks, calibration checks the
    probabilities themselves. One window + one small agg; the ECE is a
    constant-state window over {_CAL_BINS} rows. Scale path: the
    round-4 twin ``eval_calibration_bins_cuts`` (exact conf-domain
    cuts, no un-partitioned data window)."""
    docs = _t(spark, sf_dir, "documents")
    ts = tx.tokens("text")
    stop = F.filter(ts, lambda t: t.isin("the", "a", "of", "and", "is"))
    scored = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(F.size(stop) / F.size(ts).cast("double"), 9).alias("conf"),
    )
    binned = scored.withColumn(
        "bin", F.ntile(_CAL_BINS).over(Window.orderBy("conf", "doc_id"))
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            (
                F.sum(F.round(F.col("conf") * 1000000.0).cast("long")).cast("double")
                / F.count(F.lit(1))
            )
            / 1000000.0,
            9,
        ).alias("mean_conf"),
        F.round(F.sum("y") / F.count(F.lit(1)).cast("double"), 9).alias("frac_pos"),
    )
    wall = Window.partitionBy(F.lit(1))
    gap = F.round(F.abs(F.col("mean_conf") - F.col("frac_pos")), 9)
    return (
        per_bin.withColumn("gap", gap)
        .withColumn(
            "ece",
            (
                F.sum(
                    F.round(F.col("n") * F.col("gap") * 1000000.0).cast("long")
                ).over(wall).cast("double")
                / 1000000.0
            )
            / F.sum("n").over(wall),
        )
        .orderBy("bin")
    )

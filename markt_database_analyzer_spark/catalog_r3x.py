"""Round-3 twenty-fifth tranche: per-class confusion-matrix evaluation
over the Naive Bayes classifier, longest daily-activity streaks
(gaps-and-islands), and deterministic curriculum ordering for training.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs
with identical semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .catalog_r3q import _sql_naive_bayes, classify_naive_bayes_langid
from .datapipe import text as tx
from .datapipe.hashing import hash60, sql_hash60


# --------------------------------------------------------------------------
# Confusion matrix + per-class precision / recall / F1
# --------------------------------------------------------------------------

def _sql_confusion() -> str:
    return f"""
WITH preds AS ({_sql_naive_bayes()}),
classes AS (
  SELECT actual AS cls FROM preds UNION SELECT predicted FROM preds
),
per_class AS (
  SELECT c.cls,
         CAST(sum(CASE WHEN p.actual = c.cls AND p.predicted = c.cls THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN p.predicted = c.cls AND p.actual != c.cls THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN p.actual = c.cls AND p.predicted != c.cls THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM classes c CROSS JOIN preds p
  GROUP BY c.cls
)
SELECT cls, tp, fp, fn,
       round(CASE WHEN tp + fp = 0 THEN 0.0 ELSE tp / CAST(tp + fp AS DOUBLE) END, 9) AS precision,
       round(CASE WHEN tp + fn = 0 THEN 0.0 ELSE tp / CAST(tp + fn AS DOUBLE) END, 9) AS recall,
       round(CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
                  ELSE 2.0 * tp / CAST(2 * tp + fp + fn AS DOUBLE) END, 9) AS f1
FROM per_class ORDER BY cls
"""


@register(
    "eval_confusion_matrix",
    oracle=_sql_confusion(),
    tags=("eval", "classify", "ml"),
)
def eval_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 over the Naive Bayes language
    classifier's held-out predictions — the evaluation table every
    classifier ships with (F1 in its 2TP/(2TP+FP+FN) form avoids the
    0/0 of undefined precision x recall). Composes the NB entry's plan
    directly (one classifier run, one 5-class aggregate); counts are
    exact integers, metrics integer ratios at 9 dp."""
    preds = classify_naive_bayes_langid(spark, sf_dir)
    classes = (
        preds.select(F.col("actual").alias("cls"))
        .union(preds.select("predicted"))
        .distinct()
    )
    joined = classes.crossJoin(F.broadcast(preds.select("actual", "predicted")))
    per_class = joined.groupBy("cls").agg(
        F.sum(
            F.when((F.col("actual") == F.col("cls")) & (F.col("predicted") == F.col("cls")), 1).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when((F.col("predicted") == F.col("cls")) & (F.col("actual") != F.col("cls")), 1).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when((F.col("actual") == F.col("cls")) & (F.col("predicted") != F.col("cls")), 1).otherwise(0)
        ).alias("fn"),
    )
    prec = F.when(F.col("tp") + F.col("fp") == 0, 0.0).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fp")).cast("double")
    )
    rec = F.when(F.col("tp") + F.col("fn") == 0, 0.0).otherwise(
        F.col("tp") / (F.col("tp") + F.col("fn")).cast("double")
    )
    f1 = F.when(2 * F.col("tp") + F.col("fp") + F.col("fn") == 0, 0.0).otherwise(
        2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double")
    )
    return per_class.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.round(prec, 9).alias("precision"),
        F.round(rec, 9).alias("recall"),
        F.round(f1, 9).alias("f1"),
    ).orderBy("cls")


# --------------------------------------------------------------------------
# Longest daily-activity streaks (gaps-and-islands)
# --------------------------------------------------------------------------

_SQL_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
ranked AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS grp
  FROM days
),
streaks AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
  FROM ranked GROUP BY user_id, grp
)
SELECT user_id,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM streaks GROUP BY user_id ORDER BY user_id
"""


@register(
    "events_dau_streaks",
    oracle=_SQL_STREAKS,
    tags=("events", "window", "streaks"),
)
def events_dau_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user via the
    gaps-and-islands idiom: distinct activity dates, then date minus
    row_number is CONSTANT within each consecutive run — one window + two
    aggregates, no self-join, no explode-onto-days. The engagement
    metric behind retention/streak features; at 100 TB the window
    partitions by user (users-sized state) and the distinct is the only
    events-sized shuffle."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    ranked = days.withColumn(
        "grp", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = ranked.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.max("len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Curriculum ordering (shortest-first phases, hash-shuffled within phase)
# --------------------------------------------------------------------------

_CURR_PHASES = 3
_CURR_SEED = 7


def _sql_curriculum() -> str:
    toks = tx.sql_tokens("text")
    h = sql_hash60("CAST(doc_id AS VARCHAR)", seed=_CURR_SEED)
    return f"""
WITH scored AS (
  SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens,
         ({h}) AS shuffle_key
  FROM documents
),
phased AS (
  SELECT doc_id, n_tokens, shuffle_key,
         ntile({_CURR_PHASES}) OVER (ORDER BY n_tokens, doc_id) AS phase
  FROM scored
)
SELECT doc_id, n_tokens, CAST(phase AS BIGINT) AS phase,
       CAST(row_number() OVER (PARTITION BY phase ORDER BY shuffle_key, doc_id)
            AS BIGINT) AS order_in_phase
FROM phased ORDER BY phase, order_in_phase
"""


@register(
    "sample_curriculum_order",
    oracle=_sql_curriculum(),
    tags=("sampling", "training", "curriculum"),
)
def sample_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction for training: docs split into
    {_CURR_PHASES} difficulty phases (shortest-first — the
    length-as-difficulty proxy of published curricula) over the
    (n_tokens, doc_id) total order, then DETERMINISTICALLY shuffled
    within each phase by a seeded md5 key — reproducible epoch order
    with no RNG, the same hash-gate discipline as split_train_eval.
    Output: (doc, phase, position) — exactly what a data loader consumes.
    One window pass; per-phase shuffle keys are ints. The phase ntile
    is a total order over docs — at 100 TB phase boundaries come from
    operators/equidepth.py cut points on n_tokens instead (the
    histogram_equi_depth_cuts discipline), keeping assignment
    map-only."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.size(tx.tokens("text")).cast("bigint").alias("n_tokens"),
        hash60(F.col("doc_id").cast("string"), seed=_CURR_SEED).alias("shuffle_key"),
    )
    phased = scored.withColumn(
        "phase",
        F.ntile(_CURR_PHASES).over(Window.orderBy("n_tokens", "doc_id")).cast("bigint"),
    )
    wp = Window.partitionBy("phase").orderBy("shuffle_key", "doc_id")
    return (
        phased.select(
            "doc_id",
            "n_tokens",
            "phase",
            F.row_number().over(wp).cast("bigint").alias("order_in_phase"),
        )
        .orderBy("phase", "order_in_phase")
    )

"""Round-3 twenty-second tranche: Holt double-exponential trend
forecasting as a sequential array fold, a higher-order-function vector
statistics pass, and null-safe join semantics.

The Holt entry demonstrates the third iteration shape in the catalog:
unrolled CTEs (k-means/BFS) for cross-row iteration, localCheckpoint
loops (label propagation) for data-sized state, and now ORDERED ARRAY
FOLDS for per-series recursions whose state is one struct — the fold is
sequential, so both engines execute the identical operation sequence and
plain IEEE arithmetic is already bit-identical (9 dp rounds guard the
one libm call)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import SQL_DAVG, register, _t


# --------------------------------------------------------------------------
# Holt linear-trend exponential smoothing + h-step forecast
# --------------------------------------------------------------------------

_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_H = 7


def _sql_holt() -> str:
    # DuckDB 1.0's list_reduce mis-evaluates struct accumulators whose
    # fields cross-reference (the 't' field sees a half-updated acc), so
    # the oracle replays the identical recursion as a recursive CTE over
    # the day index instead — same math, same 9 dp grid.
    return f"""
WITH RECURSIVE daily AS (
  SELECT row_number() OVER (ORDER BY d) AS i, y FROM (
    SELECT CAST(ts AS DATE) AS d,
           round({SQL_DAVG.format(x='value')}, 9) AS y
    FROM events GROUP BY 1
  )
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
holt AS (
  SELECT i, y AS l, CAST(0.0 AS DOUBLE) AS t FROM daily WHERE i = 1
  UNION ALL
  SELECT d.i,
         round(0.5 * d.y + 0.5 * round(h.l + h.t, 9), 9) AS l,
         round(0.15 * (d.y - h.l) + 0.85 * h.t, 9) AS t
  FROM holt h JOIN daily d ON d.i = h.i + 1
),
fin AS (
  SELECT l, t FROM holt ORDER BY i DESC LIMIT 1
)
SELECT CAST(h AS BIGINT) AS h, n_days,
       l AS level, t AS trend,
       round(l + h * t, 9) AS forecast
FROM fin CROSS JOIN nd CROSS JOIN generate_series(1, {_HOLT_H}) g(h)
ORDER BY h
"""


@register(
    "ts_holt_forecast",
    oracle=_sql_holt(),
    tags=("timeseries", "forecast", "hof"),
)
def ts_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend, α=0.5, β=0.3,
    classic init l₁=y₁, t₁=0) over the daily mean event value, with a
    7-step linear forecast. The recursion runs as a SEQUENTIAL fold over
    the date-ordered daily array (F.aggregate / list_reduce) — state is
    one (level, trend) struct, the fold order is identical on both
    engines, and each step re-rounds at 9 dp, so the whole trajectory is
    bit-stable. The corpus-sized work is one daily groupBy; the fold
    touches #days elements, and at 100 TB the same shape runs per key
    inside a grouped aggregation (one series per group, bounded days)."""
    ev = _t(spark, sf_dir, "events")
    micro = F.sum(F.round(F.col("value") * 1000000.0).cast("long"))
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.round((micro.cast("double") / F.count(F.lit(1))) / 1000000.0, 9).alias("y")
    )
    arr = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "y"))),
            lambda s: F.struct(
                s["y"].alias("y"), s["y"].alias("l"), F.lit(0.0).alias("t")
            ),
        ).alias("a"),
        F.count(F.lit(1)).alias("n_days"),
    )
    # trend update in the substitution form (t' = αβ(y−l) + (β(1−α)+1−β)t,
    # = 0.15/0.85 for α=0.5, β=0.3): the Holt recursion with each state
    # variable referenced once per expression and ONE rounding per field —
    # the exact spec the oracle's recursive CTE replays
    def step(acc, x):
        return F.struct(
            x["y"].alias("y"),
            F.round(
                0.5 * x["y"] + 0.5 * F.round(acc["l"] + acc["t"], 9), 9
            ).alias("l"),
            F.round(
                F.lit(0.15) * (x["y"] - acc["l"]) + F.lit(0.85) * acc["t"], 9
            ).alias("t"),
        )

    fitted = arr.select(
        "n_days",
        F.aggregate(
            F.slice("a", 2, F.size("a") - 1), F.element_at("a", 1), step
        ).alias("s"),
    )
    return (
        fitted.select(
            "n_days", F.col("s.l").alias("level"), F.col("s.t").alias("trend")
        )
        .crossJoin(F.broadcast(
            spark.range(1, _HOLT_H + 1).select(F.col("id").alias("h"))
        ))
        .select(
            "h",
            "n_days",
            "level",
            "trend",
            F.round(F.col("level") + F.col("h") * F.col("trend"), 9).alias("forecast"),
        )
        .orderBy("h")
    )


# --------------------------------------------------------------------------
# Higher-order-function vector statistics (row-local array math)
# --------------------------------------------------------------------------

_SQL_HOF = """
WITH ed AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         len(embedding) AS n
  FROM embeddings WHERE vec_id < 100
),
stats AS (
  SELECT vec_id, n, e,
         list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b) AS norm2,
         list_reduce(e, (a, b) -> a + b) AS s,
         list_aggregate(e, 'max') AS mx
  FROM ed
),
soft AS (
  SELECT vec_id, n, e, norm2, s, mx,
         list_reduce(list_transform(e, x -> round(exp(round(x - mx, 9)), 9)),
                     (a, b) -> a + b) AS expsum,
         list_reduce(list_transform(range(1, n + 1), i -> e[i] * e[n + 1 - i]),
                     (a, b) -> a + b) AS dot_rev
  FROM stats
)
SELECT vec_id,
       round(sqrt(norm2), 9) AS norm,
       round(s / n, 9) AS mean,
       CAST(list_position(e, mx) AS BIGINT) AS argmax_idx,
       mx AS max_val,
       round(1.0 / expsum, 9) AS softmax_top1,
       round(dot_rev, 9) AS dot_reversed
FROM soft ORDER BY vec_id
"""


@register(
    "array_hof_vector_stats",
    oracle=_SQL_HOF,
    tags=("functions", "hof", "embeddings"),
)
def array_hof_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local vector statistics via higher-order array functions only
    (transform / aggregate / zip_with / reverse / array_max /
    array_position): L2 norm, mean, argmax, softmax of the max logit,
    and a reversed-self dot product. Folds are sequential, so plain IEEE
    accumulation is already engine-identical (Spark's extra 0.0 fold
    seed is exact); the single libm call (exp) runs on a 9 dp-quantized
    argument. No explode, no shuffle — pure map-side width, the shape
    that scales to any corpus for per-row feature engineering."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    ed = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        F.size("embedding").alias("n"),
    )
    zero = F.lit(0.0)
    norm2 = F.aggregate(F.transform("e", lambda x: x * x), zero, lambda a, b: a + b)
    ssum = F.aggregate(F.col("e"), zero, lambda a, b: a + b)
    mx = F.array_max("e")
    stats = ed.select("vec_id", "n", "e", norm2.alias("norm2"), ssum.alias("s"), mx.alias("mx"))
    expsum = F.aggregate(
        F.transform("e", lambda x: F.round(F.exp(F.round(x - F.col("mx"), 9)), 9)),
        zero,
        lambda a, b: a + b,
    )
    dot_rev = F.aggregate(
        F.zip_with("e", F.reverse("e"), lambda x, y: x * y), zero, lambda a, b: a + b
    )
    return (
        stats.select(
            "vec_id",
            F.round(F.sqrt("norm2"), 9).alias("norm"),
            F.round(F.col("s") / F.col("n"), 9).alias("mean"),
            F.array_position("e", F.col("mx")).cast("bigint").alias("argmax_idx"),
            F.col("mx").alias("max_val"),
            F.round(1.0 / expsum, 9).alias("softmax_top1"),
            F.round(dot_rev, 9).alias("dot_reversed"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------------------------------
# Null-safe join semantics (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------

_SQL_NULLSAFE = """
WITH src AS (
  SELECT event_id, user_id,
         CASE WHEN value < 5 THEN NULL
              ELSE CAST(floor(value) AS BIGINT) % 7 END AS nk
  FROM events WHERE user_id <= 50
),
a AS (SELECT * FROM src WHERE event_id % 2 = 0),
b AS (SELECT * FROM src WHERE event_id % 2 = 1)
SELECT COALESCE(a.nk, -1) AS key_group,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT a.event_id) AS BIGINT) AS n_left
FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
GROUP BY 1 ORDER BY 1
"""


@register(
    "join_null_safe",
    oracle=_SQL_NULLSAFE,
    tags=("join", "semantics", "null"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (Spark `<=>` / SQL IS NOT DISTINCT FROM):
    NULL keys MATCH each other instead of dropping out — the semantics a
    dedup-by-natural-key or SCD merge needs when business keys are
    sparsely populated. Spark's EqualNullSafe is a hash-partitionable
    join key (null hashes like any value), so the plan stays a real
    hash/SMJ join, never a filter over a cross product — asserted by the
    engine-wide no-BNLJ plan guard. The null population is bounded here
    (user filter) because null-null matches are a deliberate hot group —
    exactly the key you'd salt at scale (operators/skew.py)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    nk = F.when(F.col("value") < 5, F.lit(None).cast("bigint")).otherwise(
        F.floor("value").cast("bigint") % 7
    )
    src = ev.select("event_id", nk.alias("nk"))
    a = src.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("a_id"), F.col("nk").alias("a_nk")
    )
    b = src.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("b_id"), F.col("nk").alias("b_nk")
    )
    return (
        a.join(b, F.col("a_nk").eqNullSafe(F.col("b_nk")))
        .groupBy(F.coalesce("a_nk", F.lit(-1)).alias("key_group"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("a_id").alias("n_left"),
        )
        .orderBy("key_group")
    )

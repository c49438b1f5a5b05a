"""Round-3 thirteenth tranche: LATERAL correlated subqueries and
grouped mode — the last uncovered SQL-surface corners.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs
with identical semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t

_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM {cust} c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


@register(
    "sql_lateral_topk_per_customer",
    oracle=_LATERAL_SQL.format(cust="customer", orders="orders"),
    tags=("lateral", "sql", "topk"),
)
def sql_lateral_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (per-customer top-2 orders by value)
    run as the IDENTICAL SQL text in both engines — the declarative
    twin of the window-based top-k operator (operators/topk.py).
    Catalyst decorrelates the lateral limit into a ranked window join
    rather than executing one subquery per row, which is the property
    that makes the construct usable at fact scale; DuckDB plans its own
    decorrelation, so the hash match pins the construct's semantics,
    not a shared implementation. Completes the SQL-surface set next to
    WITH RECURSIVE and VARIANT."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_src")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_src")
    return spark.sql(_LATERAL_SQL.format(cust="customer_lat_src", orders="orders_lat_src"))


@register(
    "agg_mode_by_user",
    oracle="""
WITH counts AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT user_id, event_type, n,
         CAST(sum(n) OVER (PARTITION BY user_id) AS BIGINT) AS n_total,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rk
  FROM counts
)
SELECT user_id, event_type AS mode_event_type, n AS n_mode, n_total,
       round(CAST(n AS DOUBLE) / n_total, 6) AS share
FROM ranked WHERE rk = 1 ORDER BY user_id
""",
    tags=("aggregate", "mode", "statistics"),
)
def agg_mode_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped MODE (most frequent value) with a deterministic
    tiebreak: counts per (user, event_type), then the top row per user
    ordered by (count desc, value asc) — the statistical-mode
    aggregate the profiling and value_counts entries stop short of,
    plus the modal share. The ranking runs on the counts frame
    (states-per-user cardinality), not on events."""
    counts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("user_id")
    wr = Window.partitionBy("user_id").orderBy(F.desc("n"), "event_type")
    return (
        counts.withColumn("n_total", F.sum("n").over(wp).cast("bigint"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("n").alias("n_mode"),
            "n_total",
            F.round(F.col("n").cast("double") / F.col("n_total"), 6).alias("share"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Rolling WAU via HLL datasketches (the documented scale path)
# --------------------------------------------------------------------------

@register(
    "growth_rolling_wau_hll",
    oracle="""
WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du),
wau AS (
  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau_exact
  FROM days d JOIN du u
    ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
  GROUP BY 1
)
SELECT day, wau_exact, TRUE AS in_bound FROM wau ORDER BY day
""",
    tags=("sketch", "hll", "growth"),
)
def growth_rolling_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling WAU by MERGED HLL sketches — the constant-state scale
    path that growth_rolling_engagement documents: one HLL sketch per
    (user-serving) day cell, hll_union_agg over each trailing window,
    hll_sketch_estimate at the end. Sketch merge is register-wise max —
    commutative and associative — so the estimate is deterministic
    under any partitioning, and per-day state is ~2^12 registers no
    matter how many users exist (the exact plan's distinct-count state
    grows with cardinality). The driver-checked contract follows the
    sketch-entry convention: the exact window count plus the published
    error guarantee as a value column (estimate within 5%+5 of exact —
    lgK=12's 3-sigma envelope), since no external engine can replay
    Spark's datasketches registers bit-for-bit."""
    du = (
        _t(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    max_day = days.agg(F.max("day").alias("max_day"))
    targets = (
        du.crossJoin(F.broadcast(max_day))
        .select(
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.least(
                        F.col("day") + F.expr("INTERVAL 6 DAY"), F.col("max_day")
                    ),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("tday"),
            "user_id",
        )
        .join(days.select(F.col("day").alias("tday")), "tday")
    )
    est = targets.groupBy("tday").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
        F.countDistinct("user_id").alias("wau_exact"),
    )
    bound = F.greatest(F.round(F.col("wau_exact") * 0.05), F.lit(5.0))
    return (
        est.select(
            F.col("tday").alias("day"),
            "wau_exact",
            (F.abs(F.col("est") - F.col("wau_exact")) <= bound).alias("in_bound"),
        )
        .orderBy("day")
    )

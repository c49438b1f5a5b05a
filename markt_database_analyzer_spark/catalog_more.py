"""General-analytics surface completion (SURVEY.md §2's "absent in
reference, built into Spark" rows + §7 Phase 3): pivot, cube,
sessionization, running windows, ranking suite, exact percentiles,
set difference, approximate distinct.

These make the engine a general analytics layer rather than three
hard-coded reports. Portability notes verified empirically:
- Spark exact ``percentile`` == DuckDB ``quantile_cont`` (same linear
  interpolation), bit-equal;
- running window sums accumulate in frame order in both engines,
  bit-equal on identical inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, register, _t
from .functions import dsum


@register(
    "pivot_status_by_priority",
    oracle="""
SELECT o_orderpriority AS priority,
       sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS F,
       sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS O,
       sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS P
FROM orders GROUP BY o_orderpriority ORDER BY priority
""",
    tags=("pivot",),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): order counts per priority × status."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("priority")
    )


@register(
    "cube_segment_nation",
    oracle=f"""
SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
       COALESCE(CAST(c_nationkey AS VARCHAR), 'ALL') AS nation,
       count(*) AS n_customers,
       {SQL_DSUM.format(x='c_acctbal')} AS total_acctbal
FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
ORDER BY segment, nation
""",
    tags=("cube", "A8"),
)
def cube_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cube over the A8-style segment grid — all 2^2 grouping sets in one
    pass (the reference's nested loop generalized)."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.cube("c_mktsegment", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum("c_acctbal").alias("total_acctbal"))
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce(F.col("c_nationkey").cast("string"), F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_acctbal",
        )
        .orderBy("segment", "nation")
    )


@register(
    "sessionize_events",
    oracle="""
WITH gaps AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30 * 60 * 1000000
              OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id) AS session_id
  FROM gaps
)
SELECT user_id, session_id, count(*) AS n_events,
       (max(us) - min(us)) / 60000000.0 AS duration_minutes
FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
""",
    tags=("sessionization", "W1"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute inactivity gap → lag + running sum of
    session starts → per-session aggregates. The batch twin of streaming
    ``session_window``."""
    ev = _t(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "new_session",
        F.when(
            (F.col("us") - F.lag("us").over(w) > 30 * 60 * 1_000_000)
            | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    wsum = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = gaps.withColumn("session_id", F.sum("new_session").over(wsum))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            ((F.max("us") - F.min("us")) / 60000000.0).alias("duration_minutes"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "running_total_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 1000000.0) AS HUGEINT))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / 1000000.0 AS running_total
FROM orders ORDER BY o_custkey, o_orderkey
""",
    tags=("window", "running"),
)
def running_total_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) spend per customer — unbounded-preceding row
    frame; accumulation order made total with the orderkey tiebreak, and
    the accumulation itself quantized to micro-units (windowed dsum) so
    the prefix sums are bit-stable across engines."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    q = F.round(F.col("o_totalprice").cast("double") * 1_000_000.0).cast("decimal(38,0)")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            (F.sum(q).over(w).cast("double") / 1_000_000.0).alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "rank_lead_ntile",
    oracle="""
SELECT o_custkey, o_orderkey,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       lead(o_orderkey) OVER w AS next_orderkey,
       lag(o_orderkey) OVER w AS prev_orderkey,
       ntile(4) OVER w AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY o_custkey, rnk, o_orderkey
""",
    tags=("window", "ranking"),
)
def rank_lead_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-function suite over a total per-group ordering."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
            F.lag("o_orderkey").over(w).alias("prev_orderkey"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


@register(
    "percentiles_by_event_type",
    oracle="""
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("percentile", "A1"),
)
def percentiles_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (bit-equal to quantile_cont). The
    approximate scale path is approx_distinct_parts' sibling:
    percentile_approx, used when exact sort-based percentiles are too
    expensive."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.9).alias("p90"),
            F.percentile("value", 0.99).alias("p99"),
        )
        .orderBy("event_type")
    )


@register(
    "except_customers",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_custkey
""",
    tags=("set-ops",),
)
def except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (EXCEPT DISTINCT)."""
    orders = _t(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(o).orderBy("o_custkey")  # subtract == EXCEPT DISTINCT


@register(
    "approx_distinct_parts",
    oracle=None,  # HLL sketches are engine-specific; rows-only check
    tags=("approx", "sketch"),
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (HyperLogLog++) — the 100 TB path for
    cardinality, where exact countDistinct's shuffle is the bottleneck.
    Sketch values are engine-specific, so this entry is rows-only; the
    test layer bounds its error against the exact count."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .orderBy("l_returnflag")
    )

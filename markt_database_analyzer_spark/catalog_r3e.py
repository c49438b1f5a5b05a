"""Round-3 sixth tranche: exponentially-weighted moving average,
cumulative user-growth accounting, RFM segmentation, and a grouped-agg
pandas UDF (Gini concentration) that completes the UDF surface matrix.

Determinism conventions as everywhere in the catalog: EWMA quantizes
each weighted term to the nano grid (integer sums are order-free), the
Gini UDF and its SQL oracle quantize per-term on the micro grid with a
tie-insensitive coefficient multiset, and every ntile order is made
total with the entity key."""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolves postponed UDF type hints)
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, register, _t
from .functions import dsum


# --------------------------------------------------------------------------
# EWMA smoothing (half-life decay over a bounded row window)
# --------------------------------------------------------------------------

_EWMA_W = 16  # frame rows; alpha = 0.5 so weights are exact powers of two


@register(
    "w_ewma_smoothed",
    oracle=f"""
WITH arrs AS (
  SELECT event_type, ts, event_id, value,
         list(value) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {_EWMA_W - 1} PRECEDING AND CURRENT ROW
         ) AS arr
  FROM events
),
num AS (
  SELECT event_type, ts, event_id, value, len(arr) AS n,
         list_aggregate(
           list_transform(range(1, len(arr) + 1),
             i -> CAST(round(arr[i] * pow(0.5, len(arr) - i) * 1000000000.0)
                       AS BIGINT)),
           'sum') AS s
  FROM arrs
)
SELECT event_type, ts, event_id, value,
       round((CAST(s AS DOUBLE) / 1000000000.0)
             / (2.0 - pow(0.5, n - 1)), 6) AS ewma
FROM num
ORDER BY event_type, ts, event_id
""",
    tags=("window", "ewma", "timeseries"),
)
def w_ewma_smoothed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 0.5, truncated at
    16 rows) per event type. alpha = 1/2 makes every weight an exact
    power of two (lossless double scaling), each weighted term is
    quantized to a nano-grid integer, and the integer sum is
    associative — so the smoothed series is bit-identical under any
    partitioning AND in the SQL replay, which no naive float EWMA
    (sequential recurrence) can claim. The frame is O(W) rows per
    output row; at 100 TB the window is a per-key sort the same shape
    as the reference's centered rolling means (analyse.py:301), with
    the truncation bounding both state and the quantization envelope."""
    # Loop-unrolled lag formulation: the value at lag k carries weight
    # 0.5^k, so the frame is 16 lag() columns over ONE window spec (a
    # single WindowExec, pure codegen) instead of a materialized
    # collect_list array per row — measured 5.3 s -> ~1 s at sf0.1 for
    # the identical quantized terms (same (value, weight) multiset per
    # row, so the integer sum — and the oracle — are unchanged).
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    num = None
    for k in range(_EWMA_W):
        term = F.coalesce(
            F.round(F.lag("value", k).over(w) * F.lit(0.5**k) * F.lit(1e9)).cast(
                "bigint"
            ),
            F.lit(0).cast("bigint"),
        )
        num = term if num is None else num + term
    n = F.least(F.row_number().over(w), F.lit(_EWMA_W))
    return (
        _t(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .withColumn(
            "ewma",
            F.round(
                (num.cast("double") / F.lit(1e9))
                / (F.lit(2.0) - F.pow(F.lit(0.5), n - 1)),
                6,
            ),
        )
        .orderBy("event_type", "ts", "event_id")
    )


# --------------------------------------------------------------------------
# Cumulative user growth (first-seen accounting)
# --------------------------------------------------------------------------

@register(
    "growth_cumulative_users",
    oracle="""
WITH first_seen AS (
  SELECT user_id, min(date_trunc('day', ts)) AS day FROM events GROUP BY 1
),
new_by_day AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM first_seen GROUP BY 1
),
active AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
  FROM events GROUP BY 1
)
SELECT a.day, coalesce(n.n_new, CAST(0 AS BIGINT)) AS n_new,
       CAST(sum(coalesce(n.n_new, 0)) OVER (ORDER BY a.day) AS BIGINT) AS cum_users,
       a.n_active
FROM active a LEFT JOIN new_by_day n USING (day)
ORDER BY a.day
""",
    tags=("growth", "window", "analytics"),
)
def growth_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, the number of first-seen users, the
    running total of users acquired to date, and the day's active
    distinct users — the standard new-vs-active decomposition (the
    cohort entry's marginal). First-seen is one (user → min day) agg;
    the running total is a window over the DAYS-cardinality frame, so
    the only per-event work is two scans' worth of hash aggregation.
    At 100 TB: both aggs partial-combine map-side; the cumulative
    window runs on a frame of ~10^3 rows regardless of corpus size."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("day"))
    new_by_day = first_seen.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    active = ev.groupBy("day").agg(F.countDistinct("user_id").alias("n_active"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        active.join(new_by_day, "day", "left")
        .select(
            "day",
            F.coalesce("n_new", F.lit(0).cast("bigint")).alias("n_new"),
            "n_active",
        )
        .withColumn("cum_users", F.sum("n_new").over(w).cast("bigint"))
        .select("day", "n_new", "cum_users", "n_active")
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quintiles)
# --------------------------------------------------------------------------

@register(
    "segment_rfm_customers",
    oracle=f"""
WITH ref AS (SELECT max(o_orderdate) AS ref_date FROM orders),
rfm AS (
  SELECT o_custkey AS custkey,
         CAST(date_diff('day', max(o_orderdate), (SELECT ref_date FROM ref))
              AS BIGINT) AS r_days,
         CAST(count(*) AS BIGINT) AS f_orders,
         {SQL_DSUM.format(x='o_totalprice')} AS m_value
  FROM orders GROUP BY 1
),
scored AS (
  SELECT custkey, r_days, f_orders, m_value,
         CAST(ntile(5) OVER (ORDER BY r_days DESC, custkey) AS BIGINT) AS r_score,
         CAST(ntile(5) OVER (ORDER BY f_orders, custkey) AS BIGINT) AS f_score,
         CAST(ntile(5) OVER (ORDER BY m_value, custkey) AS BIGINT) AS m_score
  FROM rfm
)
SELECT custkey, r_days, f_orders, m_value, r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS segment
FROM scored ORDER BY custkey
""",
    tags=("rfm", "segmentation", "analytics"),
)
def segment_rfm_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order vs the
    corpus reference date), frequency (order count) and monetary
    (quantized revenue), each quintile-scored with ntile over an order
    made TOTAL by the customer key — so bucket boundaries are
    deterministic even through ties, and the composite segment code
    (r*100+f*10+m) hash-matches the SQL replay. The per-customer
    aggregate is one hash agg; the three ntiles are global sorts over
    the customer-cardinality frame; the scale path is the round-4 twin
    ``segment_rfm_customers_cuts`` (exact percentile cut points
    broadcast, map-only scoring)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    rfm = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("f_orders"),
            dsum(F.col("o_totalprice")).alias("m_value"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "custkey",
            F.datediff("ref_date", "last_order").cast("bigint").alias("r_days"),
            "f_orders",
            "m_value",
        )
    )
    scored = rfm.select(
        "*",
        F.ntile(5)
        .over(Window.orderBy(F.desc("r_days"), "custkey"))
        .cast("bigint")
        .alias("r_score"),
        F.ntile(5)
        .over(Window.orderBy("f_orders", "custkey"))
        .cast("bigint")
        .alias("f_score"),
        F.ntile(5)
        .over(Window.orderBy("m_value", "custkey"))
        .cast("bigint")
        .alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"),
    ).orderBy("custkey")


# --------------------------------------------------------------------------
# Grouped-agg pandas UDF: Gini concentration per group (U5 surface)
# --------------------------------------------------------------------------

@register(
    "udf_grouped_agg_gini",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority AS priority, o_totalprice AS x,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
),
sums AS (
  SELECT priority, CAST(min(n) AS BIGINT) AS n,
         SUM(CAST(round((2 * rn - n - 1) * x * 1000000.0) AS HUGEINT)) AS num,
         SUM(CAST(round(x * 1000000.0) AS HUGEINT)) AS den
  FROM ranked GROUP BY priority
)
SELECT priority, n,
       round(CAST(num AS DOUBLE) / (n * CAST(den AS DOUBLE)), 9) AS gini
FROM sums ORDER BY priority
""",
    tags=("udf", "grouped-agg", "gini"),
)
def udf_grouped_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (the U5 cell of the UDF matrix: scalar /
    grouped-map / mapInPandas / UDTF / grouped-agg): per-priority Gini
    concentration of order values, computed vectorized in numpy inside
    an Arrow-batched aggregate. Both the UDF and the SQL oracle
    evaluate Σ (2·rank − n − 1)·x on the micro grid — the coefficient
    multiset over any tie block is fixed, so the per-term quantized sum
    is rank-tiebreak-insensitive and the two engines agree exactly.
    Scale: grouped-agg ships one group per Arrow batch — fine for
    group-cardinality aggregates; the relational twin (the `sums` CTE
    shape) is the 100 TB path and is what the oracle runs."""
    import numpy as np

    @F.pandas_udf("double")
    def gini_q(x: pd.Series) -> float:
        v = np.sort(x.to_numpy(dtype="float64"))
        n = v.size
        rn = np.arange(1, n + 1, dtype="float64")
        # per-term int64 is safe (|coef·x·1e6| < 2^63) but the SUM is not
        # (n≈3e4 price-scale terms ≈ 1e20) — accumulate as Python ints,
        # matching the oracle's HUGEINT accumulator
        num = int(np.rint((2.0 * rn - n - 1.0) * v * 1e6).astype("int64").astype(object).sum())
        den = int(np.rint(v * 1e6).astype("int64").astype(object).sum())
        return round(float(num) / (n * float(den)), 9)

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("x"),
    )
    # a grouped-agg pandas UDF cannot share an Aggregate with JVM
    # aggregates — counts come from a twin agg joined on the (tiny) key
    counts = orders.groupBy("priority").agg(F.count(F.lit(1)).alias("n"))
    ginis = orders.groupBy("priority").agg(gini_q(F.col("x")).alias("gini"))
    return (
        counts.join(ginis, "priority")
        .select("priority", "n", "gini")
        .orderBy("priority")
    )

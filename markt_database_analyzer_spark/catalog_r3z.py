"""Round-3 twenty-seventh tranche: point-in-time (temporal validity)
join — the feature-store correctness primitive — and local-peak
detection on the hourly series.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs
with identical semantics; the PIT pick is made TOTAL (time, then
sequence) so both engines choose the same state row even on equal
timestamps."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .operators.asof import asof_join_last


# --------------------------------------------------------------------------
# Point-in-time join (temporal validity / feature-store correctness)
# --------------------------------------------------------------------------

_SQL_PIT = """
WITH states AS (
  SELECT o_custkey AS cust, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS vf,
         CAST(o_orderkey AS BIGINT) AS seq, o_orderpriority AS prio
  FROM orders
),
facts AS (
  SELECT o.o_custkey AS cust, epoch_us(CAST(l.l_shipdate AS TIMESTAMP)) AS t,
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS rev_cents
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
u AS (
  SELECT cust, t AS _t, 1 AS _side, NULL::BIGINT AS _seq, NULL::VARCHAR AS _v,
         rev_cents
  FROM facts
  UNION ALL BY NAME
  SELECT cust, vf AS _t, 0 AS _side, seq AS _seq, prio AS _v,
         NULL::BIGINT AS rev_cents
  FROM states
),
resolved AS (
  SELECT cust, rev_cents, _side,
         last_value(_v IGNORE NULLS) OVER (
           PARTITION BY cust ORDER BY _t, _side, _seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prio_asof
  FROM u
)
SELECT prio_asof AS priority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(rev_cents) AS BIGINT) AS rev_cents
FROM resolved WHERE _side = 1
GROUP BY prio_asof ORDER BY priority
"""


@register(
    "join_point_in_time",
    oracle=_SQL_PIT,
    tags=("join", "asof", "temporal"),
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join — feature-store correctness: each lineitem
    "trade" is attributed to the customer's order-priority STATE that
    was valid at ship time (the latest state change at or before it),
    never a later one (no leakage from the future). Runs on the
    union-sentinel as-of merge (operators/asof.py: one window, one
    shuffle, no interval explosion); the state pick is total via
    (valid_from, order-key sequence), so equal-date state changes
    resolve identically on both engines — the oracle replays the SAME
    merge rather than a native ASOF whose tie rule is unspecified.
    Output: revenue attribution by point-in-time priority."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    states = o.select(
        F.col("o_custkey").alias("cust"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("vf"),
        F.col("o_orderkey").cast("long").alias("seq"),
        F.col("o_orderpriority").alias("prio"),
    )
    facts = (
        li.join(o.select("o_orderkey", "o_custkey"), li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("t"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            ).cast("long").alias("rev_cents"),
        )
    )
    joined = asof_join_last(
        facts,
        states,
        key="cust",
        left_time="t",
        right_time="vf",
        value_col="prio",
        right_seq="seq",
    )
    return (
        joined.groupBy(F.col("prio_asof").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("rev_cents").alias("rev_cents"),
        )
        .orderBy("priority")
    )


# --------------------------------------------------------------------------
# Local-peak detection on the hourly series
# --------------------------------------------------------------------------

_SQL_PEAKS = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         round((CAST(SUM(CAST(round(value * 1000000.0) AS HUGEINT)) AS DOUBLE)
                / count(*)) / 1000000.0, 9) AS y
  FROM events GROUP BY 1
),
ctx AS (
  SELECT h, y,
         lag(y) OVER (ORDER BY h) AS y_prev,
         lead(y) OVER (ORDER BY h) AS y_next
  FROM hourly
),
thr AS (SELECT round(quantile_cont(y, 0.75), 9) AS p75 FROM hourly)
SELECT h AS hour_ts, y, round(y - p75, 9) AS above_p75
FROM ctx CROSS JOIN thr
WHERE y_prev IS NOT NULL AND y_next IS NOT NULL
  AND y > y_prev AND y > y_next AND y >= p75
ORDER BY hour_ts
"""


@register(
    "ts_peak_detection",
    oracle=_SQL_PEAKS,
    tags=("timeseries", "window", "peaks"),
)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection on the hourly mean series: a peak is
    strictly above both neighbors AND at or above the exact global p75
    (the prominence floor that silences micro-wiggles) — the alerting
    primitive behind 'traffic spiked at 14:00'. Series state is
    hours-sized; the threshold is a 1-row broadcast; endpoints are
    excluded (no one-sided peaks)."""
    ev = _t(spark, sf_dir, "events")
    micro = F.sum(F.round(F.col("value") * 1000000.0).cast("long"))
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.round((micro.cast("double") / F.count(F.lit(1))) / 1000000.0, 9).alias("y")
    )
    w = Window.orderBy("h")
    ctx = hourly.select(
        "h",
        "y",
        F.lag("y").over(w).alias("y_prev"),
        F.lead("y").over(w).alias("y_next"),
    )
    thr = hourly.agg(F.round(F.percentile("y", 0.75), 9).alias("p75"))
    return (
        ctx.crossJoin(F.broadcast(thr))
        .filter(
            F.col("y_prev").isNotNull()
            & F.col("y_next").isNotNull()
            & (F.col("y") > F.col("y_prev"))
            & (F.col("y") > F.col("y_next"))
            & (F.col("y") >= F.col("p75"))
        )
        .select(
            F.col("h").alias("hour_ts"),
            "y",
            F.round(F.col("y") - F.col("p75"), 9).alias("above_p75"),
        )
        .orderBy("hour_ts")
    )

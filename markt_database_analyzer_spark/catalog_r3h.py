"""Round-3 ninth tranche: class-balanced sampling, CUSUM changepoint
detection, interval-concurrency accounting, and ABC/Pareto
classification.

Every entry follows the catalog contract: a PySpark program plus a
DuckDB oracle replaying identical semantics (same md5 hash family,
integer-exact gates and running sums — no float in any decision)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, register, _t
from .datapipe.hashing import hash60, sql_hash60
from .functions import dsum


# --------------------------------------------------------------------------
# Class-balanced sampling (downsample every class to the minority size)
# --------------------------------------------------------------------------

@register(
    "sample_balanced_classes",
    oracle=f"""
WITH counts AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
tgt AS (SELECT min(n) AS target FROM counts),
gated AS (
  SELECT d.lang,
         (({sql_hash60("'bal|' || CAST(doc_id AS VARCHAR)")}) % 1000000)
           * c.n < t.target * 1000000 AS keep
  FROM documents d JOIN counts c USING (lang) CROSS JOIN tgt t
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_before,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_after
FROM gated GROUP BY lang ORDER BY lang
""",
    tags=("sampling", "class-balance", "ml-prep"),
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language class is gated to
    ~the minority-class size with a deterministic integer Bernoulli
    gate — keep iff (hash60(doc) mod 1e6) · n_class < target · 1e6, an
    ALL-INTEGER inequality (no float rate, no RNG), so the selected set
    is reproducible row-for-row across runs, partitionings, and
    engines. Class counts broadcast; the gate is map-only. This is the
    imbalance-correction step before classifier training, the
    per-class generalization of the hash-gate sampler
    (sample_hash_documents)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tgt = counts.agg(F.min("n").alias("target"))
    u = hash60(F.concat(F.lit("bal|"), F.col("doc_id").cast("string"))) % F.lit(
        1_000_000
    )
    gated = (
        docs.join(F.broadcast(counts), "lang")
        .crossJoin(F.broadcast(tgt))
        .select("lang", (u * F.col("n") < F.col("target") * 1_000_000).alias("keep"))
    )
    return (
        gated.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_after"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# CUSUM changepoint detection
# --------------------------------------------------------------------------

@register(
    "events_changepoint_cusum",
    oracle="""
WITH m AS (
  SELECT event_type,
         (CAST(SUM(CAST(round(value * 1000000.0) AS HUGEINT)) AS DOUBLE)
          / COUNT(value) / 1000000.0) AS mu,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
dev AS (
  SELECT e.event_type, e.ts, e.event_id, m.n,
         CAST(sum(CAST(round((e.value - m.mu) * 1000000.0) AS BIGINT))
              OVER (PARTITION BY e.event_type ORDER BY e.ts, e.event_id)
              AS BIGINT) AS s_int
  FROM events e JOIN m USING (event_type)
),
ranked AS (
  SELECT event_type, n, ts, event_id, s_int,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(s_int) DESC, ts, event_id) AS rk
  FROM dev
)
SELECT event_type, n, ts AS cp_ts, event_id AS cp_event_id,
       round(CAST(s_int AS DOUBLE) / 1000000.0, 6) AS max_dev
FROM ranked WHERE rk = 1 ORDER BY event_type
""",
    tags=("changepoint", "cusum", "timeseries"),
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (Page 1954): per series, the running
    sum of mean-centered deviations peaks (in absolute value) at the
    most likely mean-shift point. Deviations are quantized to micro-
    unit integers BEFORE the running sum, so the cumulative path — and
    therefore the argmax — is exact and identical in any engine or
    partitioning; the argmax pick is made total with (ts, event_id)
    tiebreaks. One broadcast of per-series means, one window pass, one
    rank — the same cost envelope as the z-score anomaly entry, but
    detecting LOCATION of change rather than pointwise outliers."""
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    from .functions import davg

    m = ev.groupBy("event_type").agg(
        davg(F.col("value")).alias("mu"), F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    dev = ev.join(F.broadcast(m), "event_type").withColumn(
        "s_int",
        F.sum(F.round((F.col("value") - F.col("mu")) * 1_000_000.0).cast("bigint"))
        .over(w)
        .cast("bigint"),
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("s_int")).desc(), "ts", "event_id"
    )
    return (
        dev.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "n",
            F.col("ts").alias("cp_ts"),
            F.col("event_id").alias("cp_event_id"),
            F.round(F.col("s_int").cast("double") / 1_000_000.0, 6).alias("max_dev"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Interval concurrency (open orders per day, event-difference method)
# --------------------------------------------------------------------------

@register(
    "intervals_open_orders_daily",
    oracle="""
WITH span AS (
  SELECT o.o_orderkey,
         date_trunc('day', o.o_orderdate) AS open_day,
         date_trunc('day', max(l.l_shipdate)) + INTERVAL 1 DAY AS close_day
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
deltas AS (
  SELECT open_day AS day, 1 AS d FROM span
  UNION ALL
  SELECT close_day AS day, -1 AS d FROM span
),
daily AS (
  SELECT day,
         CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_opened,
         CAST(sum(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed,
         CAST(sum(d) AS BIGINT) AS delta
  FROM deltas GROUP BY day
)
SELECT day, n_opened, n_closed,
       CAST(sum(delta) OVER (ORDER BY day) AS BIGINT) AS open_count
FROM daily ORDER BY day
""",
    tags=("intervals", "concurrency", "sweep-line"),
)
def intervals_open_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval concurrency by the sweep-line / event-difference method:
    each order contributes +1 at its open day and −1 the day after its
    last shipment, and the running sum of day-bucketed deltas IS the
    number of concurrently open orders — O(intervals) work instead of
    exploding each interval onto every day it covers (the naive plan is
    O(intervals × avg_days)). The running sum spans the days-cardinality
    frame only. This is how hypertable 'active sessions/objects over
    time' reports must be computed at 100 TB; CAST-to-BIGINT on both
    engines pins the r1 HUGEINT lesson."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    span = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.date_trunc("day", "o_orderdate").alias("open_day"))
        .agg(
            (F.date_trunc("day", F.max("l_shipdate")) + F.expr("INTERVAL 1 DAY")).alias(
                "close_day"
            )
        )
    )
    deltas = span.select(F.col("open_day").alias("day"), F.lit(1).alias("d")).unionByName(
        span.select(F.col("close_day").alias("day"), F.lit(-1).alias("d"))
    )
    daily = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("d") == 1, 1).otherwise(0)).alias("n_opened"),
        F.sum(F.when(F.col("d") == -1, 1).otherwise(0)).alias("n_closed"),
        F.sum("d").alias("delta"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.withColumn("open_count", F.sum("delta").over(w).cast("bigint"))
        .select("day", "n_opened", "n_closed", "open_count")
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# ABC / Pareto classification (cumulative revenue share)
# --------------------------------------------------------------------------

@register(
    "parts_abc_pareto",
    oracle=f"""
WITH rev AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(round(l_extendedprice * (1 - l_discount) * 1000000.0)
                  AS HUGEINT)) AS r_int
  FROM lineitem GROUP BY 1
),
tot AS (SELECT CAST(sum(r_int) AS DOUBLE) AS t FROM rev),
ranked AS (
  SELECT partkey, r_int,
         CAST(sum(r_int) OVER (ORDER BY r_int DESC, partkey) AS DOUBLE) AS cum
  FROM rev
),
classed AS (
  SELECT partkey,
         CASE WHEN cum / t.t <= 0.8 THEN 'A'
              WHEN cum / t.t <= 0.95 THEN 'B'
              ELSE 'C' END AS abc,
         CAST(r_int AS DOUBLE) / 1000000.0 AS revenue
  FROM ranked CROSS JOIN tot t
)
SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
       {SQL_DSUM.format(x="revenue")} AS class_revenue
FROM classed GROUP BY abc ORDER BY abc
""",
    tags=("pareto", "abc", "analytics"),
)
def parts_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, cumulative
    share computed on EXACT micro-unit integers (running sum of
    quantized revenues — so the 80%/95% class boundaries are decided on
    identical rationals in both engines, never on float accumulation
    order), then per-class counts and revenue. The global ranking
    window is item-cardinality (catalog-sized, not fact-sized); the
    100 TB path pre-aggregates revenue per part first — exactly what
    this plan does — and the classic '20% of parts carry 80% of
    revenue' report falls out of the class table."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"),
        (
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000.0
            ).cast("decimal(38,0)")
        ).alias("micro"),
    )
    rev = li.groupBy("partkey").agg(F.sum("micro").alias("r_int"))
    tot = rev.agg(F.sum("r_int").cast("double").alias("t"))
    w = Window.orderBy(F.col("r_int").desc(), "partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.withColumn("cum", F.sum("r_int").over(w).cast("double"))
    share = F.col("cum") / F.col("t")
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "partkey",
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C").alias("abc"),
        (F.col("r_int").cast("double") / F.lit(1_000_000.0)).alias("revenue"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum(F.col("revenue")).alias("class_revenue"),
        )
        .orderBy("abc")
    )

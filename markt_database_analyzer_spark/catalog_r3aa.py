"""Round-3 twenty-eighth tranche: multi-column exact distinct counting in
one logical pass, and last-observation-carried-forward (LOCF) gap fill —
the step-function companion to the linear-interpolation gapfill entry.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs
with identical semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t


# --------------------------------------------------------------------------
# Multi-column exact distinct counts, one pass
# --------------------------------------------------------------------------

_SQL_MULTI_DISTINCT = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(count(DISTINCT CAST(floor(value / 10) AS BIGINT)) AS BIGINT) AS n_value_decades
FROM events GROUP BY event_type ORDER BY event_type
"""


@register(
    "agg_multi_distinct",
    oracle=_SQL_MULTI_DISTINCT,
    tags=("agg", "distinct", "expand"),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Several EXACT count-distincts over different columns in one
    logical aggregation — Catalyst compiles this to a single Expand node
    (one row fan-out per distinct column) + a two-phase aggregate, so
    the scan happens once and the shuffle carries (group, column-tag,
    value) triples instead of one full pass per metric. The approximate
    alternative at extreme scale is approx_distinct_parts (HLL); this is
    the exact form dashboards reconcile against."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct(F.col("ts").cast("date")).alias("n_days"),
            F.countDistinct(
                F.floor(F.col("value") / 10).cast("bigint")
            ).alias("n_value_decades"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# LOCF gap fill (step-function forward fill over an hourly spine)
# --------------------------------------------------------------------------

_LOCF_MAX_USER = 50

_SQL_LOCF = f"""
WITH bounds AS (
  SELECT min(date_trunc('hour', ts)) AS h0, max(date_trunc('hour', ts)) AS h1
  FROM events
),
spine AS (
  SELECT u.user_id, h.h
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id <= {_LOCF_MAX_USER}) u
  CROSS JOIN (
    SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
  ) h
),
obs AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         round((CAST(SUM(CAST(round(value * 1000000.0) AS HUGEINT)) AS DOUBLE)
                / count(*)) / 1000000.0, 9) AS y
  FROM events WHERE user_id <= {_LOCF_MAX_USER}
  GROUP BY 1, 2
),
joined AS (
  SELECT s.user_id, s.h, o.y
  FROM spine s LEFT JOIN obs o ON o.user_id = s.user_id AND o.h = s.h
)
SELECT user_id, h AS hour_ts, y AS observed,
       last_value(y IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
       (y IS NULL) AS was_gap
FROM joined
ORDER BY user_id, hour_ts
"""


@register(
    "gapfill_locf_hourly",
    oracle=_SQL_LOCF,
    tags=("timeseries", "gapfill", "window"),
)
def gapfill_locf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap fill over a per-user hourly
    spine: missing hours inherit the most recent observed hourly mean
    (step-function semantics — correct for state-like metrics, where
    the linear interpolation of gapfill_interpolate_hourly would invent
    intermediate states). One spine join + one ignore-nulls window per
    user; leading gaps stay NULL (nothing to carry). The spine is
    users × hours — bounded; observations aggregate before the join so
    the window never sees raw events."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    users = (
        ev.filter(F.col("user_id") <= _LOCF_MAX_USER).select("user_id").distinct()
    )
    spine = users.crossJoin(F.broadcast(hours))
    micro = F.sum(F.round(F.col("value") * 1000000.0).cast("long"))
    obs = (
        ev.filter(F.col("user_id") <= _LOCF_MAX_USER)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.round((micro.cast("double") / F.count(F.lit(1))) / 1000000.0, 9).alias("y")
        )
    )
    joined = spine.join(obs, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("hour_ts"),
        F.col("y").alias("observed"),
        F.last("y", ignorenulls=True).over(w).alias("filled"),
        F.col("y").isNull().alias("was_gap"),
    ).orderBy("user_id", "hour_ts")

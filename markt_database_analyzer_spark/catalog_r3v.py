"""Round-3 twenty-third tranche: k-core decomposition (iterative graph
peeling), time-weighted averages over irregular samples, and Theil-Sen
robust slope estimation.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs
with identical semantics; iteration counts fixed and replayed (peeling),
integrals as exact wide-integer products, medians with a pinned
lower-median convention."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DAVG, register, _t

# --------------------------------------------------------------------------
# k-core decomposition by iterative peeling
# --------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 8
_KCORE_MIN_W = 2  # same co-purchase weight threshold as link prediction


def _sql_kcore() -> str:
    rounds = []
    for r in range(1, _KCORE_ROUNDS + 1):
        rounds.append(f"""
a{r} AS MATERIALIZED (
  SELECT node FROM (
    SELECT e.src AS node, count(*) AS d
    FROM edges e
    JOIN a{r-1} s ON s.node = e.src
    JOIN a{r-1} t ON t.node = e.dst
    GROUP BY e.src
  ) WHERE d >= {_KCORE_K}
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, (SELECT count(*) FROM a{r-1}) - (SELECT count(*) FROM a{r}) AS n_removed, (SELECT count(*) FROM a{r}) AS n_remaining"
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return f"""
WITH pairs AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_KCORE_MIN_W}
),
edges AS MATERIALIZED (
  SELECT x AS src, y AS dst FROM pairs UNION ALL SELECT y, x FROM pairs
),
a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
{",".join(rounds)}
SELECT CAST(round AS BIGINT) AS round, CAST(n_removed AS BIGINT) AS n_removed,
       CAST(n_remaining AS BIGINT) AS n_remaining
FROM ({unions}) ORDER BY round
"""


@register(
    "graph_kcore",
    oracle=_sql_kcore(),
    tags=("graph", "iterative", "kcore"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_KCORE_K}-core decomposition of the thresholded co-purchase graph
    by iterative peeling: each round recomputes degrees over the
    SURVIVING subgraph and removes nodes below k — the standard
    community-density primitive (a node is in the k-core iff it keeps k
    neighbors after everyone weaker is removed). {_KCORE_ROUNDS} fixed
    rounds (monotone: once stable, further rounds are no-ops — the
    bounded-iteration contract BFS also uses), localCheckpoint per round
    so round r is one degree aggregate + one semi-join over the current
    frontier, never a replay. Output: per-round removal counts and the
    final core size."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey")
    a = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("pa"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("l_partkey"))
        .groupBy(F.col("pa").alias("x"), F.col("l_partkey").alias("y"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _KCORE_MIN_W)
        .select("x", "y")
    )
    edges = (
        pairs.select(F.col("x").alias("src"), F.col("y").alias("dst"))
        .unionByName(pairs.select(F.col("y").alias("src"), F.col("x").alias("dst")))
        .localCheckpoint(eager=True)
    )
    alive = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    history = []
    prev_n = alive.count()
    for r in range(1, _KCORE_ROUNDS + 1):
        deg = (
            edges.join(alive.select(F.col("node").alias("src")), "src")
            .join(alive.select(F.col("node").alias("dst")), "dst")
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        alive = (
            deg.filter(F.col("d") >= _KCORE_K)
            .select(F.col("src").alias("node"))
            .localCheckpoint(eager=True)
        )
        n = alive.count()  # O(1) driver state per round — the MLlib shape
        history.append((r, prev_n - n, n))
        prev_n = n
    return spark.createDataFrame(
        history, "round bigint, n_removed bigint, n_remaining bigint"
    ).orderBy("round")


# --------------------------------------------------------------------------
# Time-weighted average over irregular samples
# --------------------------------------------------------------------------

_TWA_MAX_USER = 200

_SQL_TWA = f"""
WITH s AS (
  SELECT user_id, epoch_us(ts) AS t, value,
         CAST(round(value * 1000000.0) AS BIGINT) AS vm
  FROM events WHERE user_id <= {_TWA_MAX_USER}
),
seg AS (
  SELECT user_id, value, vm, t,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, vm) AS t_next
  FROM s
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CASE WHEN t_next IS NULL THEN 0
                           ELSE CAST(vm AS HUGEINT) * (t_next - t) END) AS DOUBLE)
               / CAST(sum(CASE WHEN t_next IS NULL THEN 0 ELSE t_next - t END) AS DOUBLE)
               / 1000000.0, 9) AS twa,
       round({SQL_DAVG.format(x='value')}, 9) AS arith_avg
FROM seg
GROUP BY user_id
HAVING count(*) >= 2
ORDER BY user_id
"""


@register(
    "ts_time_weighted_avg",
    oracle=_SQL_TWA,
    tags=("timeseries", "window", "agg"),
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user over IRREGULAR samples: each value
    holds until the next observation (left-step integration), so
    twa = Σ v_i·(t_{i+1}−t_i) / (t_n−t_1) — the correct mean for metrics
    sampled on events, where the arithmetic mean over-weights busy
    periods (returned alongside for contrast). The integral is an exact
    wide-integer sum (micro-value × µs-duration products in
    Decimal128/HUGEINT — the product overflows int64 by design), one
    window + one aggregate; total-ordered by (t, value) so duplicate
    timestamps are deterministic."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") <= _TWA_MAX_USER)
    s = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "value",
        F.round(F.col("value") * 1000000.0).cast("long").alias("vm"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "vm")
    seg = s.withColumn("t_next", F.lead("t").over(w))
    dur = F.when(F.col("t_next").isNull(), F.lit(0)).otherwise(
        F.col("t_next") - F.col("t")
    )
    prod = F.when(
        F.col("t_next").isNull(), F.lit(0).cast("decimal(38,0)")
    ).otherwise(
        F.col("vm").cast("decimal(38,0)") * (F.col("t_next") - F.col("t"))
    )
    micro = F.sum(F.round(F.col("value") * 1000000.0).cast("long"))
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(prod).cast("double") / F.sum(dur).cast("double") / 1000000.0, 9
            ).alias("twa"),
            F.round((micro.cast("double") / F.count(F.lit(1))) / 1000000.0, 9).alias(
                "arith_avg"
            ),
        )
        .filter(F.col("n_events") >= 2)
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Theil-Sen robust slope (median of pairwise slopes)
# --------------------------------------------------------------------------

_SQL_THEILSEN = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
         round({SQL_DAVG.format(x='value')}, 9) AS y
  FROM events GROUP BY 1, 2
),
slopes AS (
  SELECT a.event_type,
         round((b.y - a.y) / (b.d - a.d), 9) AS slope
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
ranked AS (
  SELECT event_type, slope,
         row_number() OVER (PARTITION BY event_type ORDER BY slope) AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM slopes
)
SELECT event_type,
       CAST(min(n) AS BIGINT) AS n_pairs,
       min(CASE WHEN r = (n + 1) // 2 THEN slope END) AS theilsen_slope
FROM ranked GROUP BY event_type ORDER BY event_type
"""


@register(
    "stats_theilsen_slope",
    oracle=_SQL_THEILSEN,
    tags=("stats", "regression", "robust"),
)
def stats_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimate per event type: the median of all
    pairwise slopes of the DAILY mean series — up to ~29% contamination
    tolerance where OLS breaks on one outlier. The pair enumeration runs
    on the pre-aggregated daily frame (30 points → 435 pairs per group,
    never the raw events; the published large-n variant subsamples
    pairs), slopes are ratios of exact quantities rounded at 9 dp, and
    the median uses the catalog's lower-median convention (rank
    (n+1)//2 over a total order)."""
    ev = _t(spark, sf_dir, "events")
    micro = F.sum(F.round(F.col("value") * 1000000.0).cast("long"))
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
    ).agg(
        F.round((micro.cast("double") / F.count(F.lit(1))) / 1000000.0, 9).alias("y")
    )
    a = daily.select(
        F.col("event_type"), F.col("d").alias("da"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("event_type"), F.col("d").alias("db"), F.col("y").alias("yb")
    )
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("da") < F.col("db"))
        .select(
            "event_type",
            F.round((F.col("yb") - F.col("ya")) / (F.col("db") - F.col("da")), 9).alias(
                "slope"
            ),
        )
    )
    wp = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(wp.orderBy("slope")).alias("r"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.min("n").alias("n_pairs"),
            F.min(
                F.when(
                    F.col("r") == F.floor((F.col("n") + 1) / 2), F.col("slope")
                )
            ).alias("theilsen_slope"),
        )
        .orderBy("event_type")
    )

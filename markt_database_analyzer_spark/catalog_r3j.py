"""Round-3 eleventh tranche: star-schema denormalization, a composed
daily-KPI analytics pipeline, winsorized robust means, and end-to-end
fuzzy entity resolution (blocked match → connected components →
canonical survivor).

Every entry follows the catalog contract: a PySpark program plus a
DuckDB oracle replaying identical semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DAVG, SQL_DSUM, register, _t
from .catalog_r3b import _FUZZY_SN_WINDOW, fuzzy_block_candidates
from .datapipe import clustering as cl
from .functions import davg, dsum


# --------------------------------------------------------------------------
# Star-schema denormalization (multi-dim broadcast join)
# --------------------------------------------------------------------------

@register(
    "join_star_denormalize",
    oracle=f"""
SELECT r.r_name AS region, l.l_returnflag AS returnflag,
       CAST(count(*) AS BIGINT) AS n,
       {SQL_DSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2 ORDER BY 1, 2
""",
    tags=("star-join", "denormalize", "warehouse"),
)
def join_star_denormalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full star-schema traversal in ONE plan: the fact table walks
    customer → nation → region with every dimension broadcast, so the
    only exchange in the whole query is the fact⨝orders co-key join and
    the final 2-key aggregate — the canonical warehouse denormalization
    (and the plan a materialized wide table would be written from).
    Catalyst chains the three broadcast hash joins into a single
    whole-stage-codegen pipeline over the fact scan; at 100 TB the
    orders side is the bucketing candidate (test_bucketed_join_is_
    shuffle_free) and the dims stay broadcast at any fact size."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("l_returnflag").alias("returnflag")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(rev).alias("revenue"))
        .orderBy("region", "returnflag")
    )


# --------------------------------------------------------------------------
# Composed daily-KPI analytics pipeline (two facts, one lazy plan)
# --------------------------------------------------------------------------

@register(
    "pipeline_analytics_daily",
    oracle=f"""
WITH ev AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_active,
         {SQL_DAVG.format(x='value')} AS avg_value
  FROM events GROUP BY 1
),
od AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         CAST(count(*) AS BIGINT) AS n_orders,
         {SQL_DSUM.format(x='o_totalprice')} AS revenue
  FROM orders GROUP BY 1
)
SELECT coalesce(ev.day, od.day) AS day,
       coalesce(ev.n_events, CAST(0 AS BIGINT)) AS n_events,
       coalesce(ev.n_active, CAST(0 AS BIGINT)) AS n_active,
       ev.avg_value,
       coalesce(od.n_orders, CAST(0 AS BIGINT)) AS n_orders,
       coalesce(od.revenue, 0.0) AS revenue
FROM ev FULL OUTER JOIN od ON ev.day = od.day
ORDER BY day
""",
    tags=("pipeline", "kpi", "composed"),
)
def pipeline_analytics_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-KPI dashboard frame as ONE lazy plan over two fact
    tables: event volume / distinct actives / mean value from events,
    order count / revenue from orders, stitched with a full outer join
    on the day (zero-filled counts, null-kept averages — the reference's
    spine-join discipline, analyse.py:214-224, across two sources).
    Each side collapses to days-cardinality before the join, so the
    stitch is trivially broadcastable; this is the composed-report
    pattern every reference analysis ends with, generalized to
    multiple facts."""
    ev = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_active"),
            davg(F.col("value")).alias("avg_value"),
        )
    )
    od = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )
    return (
        ev.join(od, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
            F.coalesce("n_active", F.lit(0).cast("bigint")).alias("n_active"),
            "avg_value",
            F.coalesce("n_orders", F.lit(0).cast("bigint")).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Winsorized robust mean (rank-based P5/P95 clipping)
# --------------------------------------------------------------------------

@register(
    "stats_winsorized_mean",
    oracle=f"""
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1),
rk AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
  FROM ev
),
cuts AS (
  SELECT r.event_type,
         min(CASE WHEN r.rn = greatest(CAST(ceil(0.05 * c.n) AS BIGINT), 1)
                  THEN r.value END) AS lo,
         min(CASE WHEN r.rn = CAST(ceil(0.95 * c.n) AS BIGINT)
                  THEN r.value END) AS hi
  FROM rk r JOIN cnt c USING (event_type)
  GROUP BY 1
)
SELECT e.event_type, min(c2.n) AS n, min(k.lo) AS lo, min(k.hi) AS hi,
       {SQL_DAVG.format(x='greatest(least(e.value, k.hi), k.lo)')} AS winsorized_mean,
       {SQL_DAVG.format(x='e.value')} AS raw_mean
FROM ev e JOIN cuts k USING (event_type) JOIN cnt c2 USING (event_type)
GROUP BY e.event_type ORDER BY e.event_type
""",
    tags=("robust-stats", "winsorize", "aggregate"),
)
def stats_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: clip at the exact rank-selected 5th /
    95th percentile values (⌈0.05n⌉-th and ⌈0.95n⌉-th order statistics
    — rank selection, so no engine's quantile interpolation convention
    is involved), then the quantized mean of the clipped column next to
    the raw mean. The robust-location counterpart of the MAD entry
    (scale path: the round-4 twin ``stats_winsorized_mean_cuts``); cut
    points are group-cardinality and broadcast back into a map-only
    clip. At 100 TB the cut points come from percentile_approx instead
    (equi-depth machinery), same contract."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value").filter(
        F.col("value").isNotNull()
    )
    cnt = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    rk = ev.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("value"))
    )
    cuts = (
        rk.join(F.broadcast(cnt), "event_type")
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(
                    F.col("rn")
                    == F.greatest(
                        F.ceil(F.lit(0.05) * F.col("n")).cast("bigint"), F.lit(1)
                    ),
                    F.col("value"),
                )
            ).alias("lo"),
            F.min(
                F.when(
                    F.col("rn") == F.ceil(F.lit(0.95) * F.col("n")).cast("bigint"),
                    F.col("value"),
                )
            ).alias("hi"),
        )
    )
    clipped = F.greatest(F.least(F.col("value"), F.col("hi")), F.col("lo"))
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .join(F.broadcast(cnt), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").alias("n"),
            F.min("lo").alias("lo"),
            F.min("hi").alias("hi"),
            davg(clipped).alias("winsorized_mean"),
            davg(F.col("value")).alias("raw_mean"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Fuzzy entity resolution end-to-end (match → cluster → canonicalize)
# --------------------------------------------------------------------------

_FUZZY_PAIRS_SQL = f"""
WITH pp AS (
  SELECT p_partkey, p_name, p_size, string_split(p_name, ' ')[2] AS blk,
         row_number() OVER (PARTITION BY string_split(p_name, ' ')[2], p_size
                            ORDER BY p_partkey) AS rnk
  FROM part
)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
FROM pp a JOIN pp b
  ON a.blk = b.blk AND a.p_size = b.p_size
 AND b.rnk - a.rnk BETWEEN 1 AND {_FUZZY_SN_WINDOW}
WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
"""


@register(
    "er_fuzzy_canonicalize",
    oracle=f"""
WITH RECURSIVE fpairs AS ({_FUZZY_PAIRS_SQL}),
edges AS (SELECT id_a AS src, id_b AS dst FROM fpairs
          UNION SELECT id_b, id_a FROM fpairs),
walk(id, lab) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.src, w.lab FROM edges e JOIN walk w ON w.id = e.dst
),
comp AS (SELECT id, min(lab) AS cluster_id FROM walk GROUP BY id),
sized AS (
  SELECT c.id, c.cluster_id, s.cluster_size
  FROM comp c JOIN (
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
    FROM comp GROUP BY 1
  ) s USING (cluster_id)
)
SELECT p.p_partkey AS doc_id,
       coalesce(s.cluster_id, p.p_partkey) AS cluster_id,
       coalesce(s.cluster_size, CAST(1 AS BIGINT)) AS cluster_size,
       (p.p_partkey = coalesce(s.cluster_id, p.p_partkey)) AS keep
FROM part p LEFT JOIN sized s ON p.p_partkey = s.id
ORDER BY doc_id
""",
    tags=("entity-resolution", "connected-components", "fuzzy"),
)
def er_fuzzy_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end to end: blocked edit-distance matching
    (the join_fuzzy_blocked candidate generator) → connected components
    over the match graph (iterative min-label propagation,
    datapipe.clustering — the same resolver the LSH dedup pipeline
    uses) → one canonical survivor per cluster (minimum key). The
    component frame covers only matched entities, so it broadcasts back
    onto the full catalog. The oracle walks the identical match graph
    with DuckDB's recursive transitive closure — two genuinely
    independent connected-components implementations agreeing on every
    cluster id and size. Candidate matching uses the shared
    sorted-neighborhood-capped generator (catalog_r3b
    fuzzy_block_candidates, W=20) since r4 — O(n*W)
    verify work; output unchanged at fixture scale (max block 13)."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_size",
        F.split(F.col("p_name"), " ").getItem(1).alias("blk"),
    )
    pairs = fuzzy_block_candidates(p).select(
        F.col("a_key").alias("id_a"), F.col("b_key").alias("id_b")
    )
    out = cl.resolve_duplicate_clusters(
        p.select("p_partkey"), pairs, id_col="p_partkey"
    )
    return out.orderBy("doc_id")

"""Round-6 additions, part 13: zone-map pruning statistics (data-layout
effectiveness) and largest-triangle-one-bucket series downsampling.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle SQL) pairs with identical semantics — exact-integer zone
statistics and triangle areas (epoch-day x micro-cent grid), total
orderings at every row selection — hash-compared at sf0.01 by the
driver.

Reference parity: the reference (analyse.py) has no layout surface;
these extend the systems family (``layout_zorder_stats``,
``histogram_equi_depth``) and the plot-sink pipeline (SURVEY.md §2 S5:
a downsampled series is what the reference's figures actually draw).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t

# --------------------------------------------------------------------------
# Zone-map pruning statistics: natural vs clustered layout
# --------------------------------------------------------------------------

_ZM_ZONES = 64
# (predicate id, lo, hi) — NULL bound = unbounded. Literal date ranges
# mirror the min/max zone-map test a parquet reader runs per row group.
_ZM_PREDICATES = [
    ("recent_years", "2000-01-01", None),
    ("first_year", None, "1995-12-31"),
    ("mid_1998_quarter", "1998-04-01", "1998-06-30"),
]


def _sql_zone_maps() -> str:
    preds = ", ".join(
        f"('{pid}', "
        + (f"DATE '{lo}'" if lo else "NULL")
        + ", "
        + (f"DATE '{hi}'" if hi else "NULL")
        + ")"
        for pid, lo, hi in _ZM_PREDICATES
    )
    return f"""
WITH src AS (
  SELECT l_orderkey, CAST(l_shipdate AS DATE) AS d FROM lineitem
),
bounds AS (
  SELECT CAST(min(l_orderkey) AS BIGINT) AS klo,
         CAST(max(l_orderkey) AS BIGINT) AS khi,
         min(d) AS dlo, max(d) AS dhi
  FROM src
),
zoned AS (
  SELECT 'natural' AS layout,
         CAST(least(CAST(floor((s.l_orderkey - b.klo) * {_ZM_ZONES}.0
                               / (b.khi - b.klo + 1)) AS BIGINT),
                    {_ZM_ZONES - 1}) AS BIGINT) AS zone,
         s.d
  FROM src s, bounds b
  UNION ALL
  SELECT 'clustered' AS layout,
         CAST(least(CAST(floor((s.d - b.dlo) * {_ZM_ZONES}.0
                               / (b.dhi - b.dlo + 1)) AS BIGINT),
                    {_ZM_ZONES - 1}) AS BIGINT) AS zone,
         s.d
  FROM src s, bounds b
),
zones AS (
  SELECT layout, zone, CAST(count(*) AS BIGINT) AS n_rows,
         min(d) AS zmin, max(d) AS zmax
  FROM zoned GROUP BY 1, 2
),
preds(pid, lo, hi) AS (VALUES {preds}),
eval AS (
  SELECT z.layout, p.pid, z.n_rows,
         CASE WHEN (p.lo IS NOT NULL AND z.zmax < p.lo)
                OR (p.hi IS NOT NULL AND z.zmin > p.hi)
              THEN 1 ELSE 0 END AS pruned
  FROM zones z CROSS JOIN preds p
)
SELECT layout, pid AS predicate,
       CAST(count(*) AS BIGINT) AS zones_total,
       CAST(sum(pruned) AS BIGINT) AS zones_pruned,
       CAST(sum(CASE WHEN pruned = 1 THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_skipped,
       round(sum(CASE WHEN pruned = 1 THEN n_rows ELSE 0 END)
             / CAST(sum(n_rows) AS DOUBLE), 9) AS skip_fraction
FROM eval GROUP BY 1, 2 ORDER BY 1, 2
"""


@register(
    "stats_zone_map_pruning",
    oracle=_sql_zone_maps(),
    tags=("layout", "systems", "pruning", "zone-map"),
)
def stats_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max rowgroup statistics) pruning effectiveness for
    date predicates under two physical layouts: 'natural' (zones = 64
    equal-width l_orderkey ranges — insertion order) vs 'clustered'
    (zones = 64 equal-width l_shipdate ranges — the layout a
    sort/cluster-by-shipdate write produces). For each literal
    predicate, a zone is skippable iff zone_max < lo or zone_min > hi —
    EXACTLY the test a parquet reader runs against rowgroup stats, so
    skip_fraction is the scan-cost reduction data clustering buys. On
    TPC-H-shaped data the natural layout prunes ~nothing (shipdate is
    uncorrelated with orderkey) while the clustered layout prunes
    nearly 1 - selectivity — the quantified argument for Z-ORDER /
    cluster-by maintenance jobs (`layout_zorder_stats`' companion).

    Exactness: zone ids are integer-floor bucket arithmetic over the
    broadcast 1-row corpus bounds; zone stats are exact (count,
    min-date, max-date); the predicate table is a literal VALUES spine.
    Scale shape: one map-only zone assignment per layout + one
    map-side-combined groupBy to the 128-row zone frame; every
    downstream frame is (zones x predicates)-sized."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("d")
    )
    bounds = li.agg(
        F.min("l_orderkey").cast("bigint").alias("klo"),
        F.max("l_orderkey").cast("bigint").alias("khi"),
        F.min("d").alias("dlo"),
        F.max("d").alias("dhi"),
    )
    src = li.crossJoin(F.broadcast(bounds))
    natural = src.select(
        F.lit("natural").alias("layout"),
        F.least(
            F.floor(
                (F.col("l_orderkey") - F.col("klo"))
                * float(_ZM_ZONES)
                / (F.col("khi") - F.col("klo") + 1)
            ).cast("bigint"),
            F.lit(_ZM_ZONES - 1),
        )
        .cast("bigint")
        .alias("zone"),
        "d",
    )
    clustered = src.select(
        F.lit("clustered").alias("layout"),
        F.least(
            F.floor(
                F.datediff(F.col("d"), F.col("dlo"))
                * float(_ZM_ZONES)
                / (F.datediff(F.col("dhi"), F.col("dlo")) + 1)
            ).cast("bigint"),
            F.lit(_ZM_ZONES - 1),
        )
        .cast("bigint")
        .alias("zone"),
        "d",
    )
    zones = (
        natural.unionAll(clustered)
        .groupBy("layout", "zone")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("d").alias("zmin"),
            F.max("d").alias("zmax"),
        )
    )
    preds = spark.createDataFrame(
        [
            (pid, lo, hi)
            for pid, lo, hi in _ZM_PREDICATES
        ],
        "pid STRING, lo STRING, hi STRING",
    ).select(
        "pid", F.col("lo").cast("date").alias("lo"), F.col("hi").cast("date").alias("hi")
    )
    ev = zones.crossJoin(F.broadcast(preds)).select(
        "layout",
        "pid",
        "n_rows",
        F.when(
            (F.col("lo").isNotNull() & (F.col("zmax") < F.col("lo")))
            | (F.col("hi").isNotNull() & (F.col("zmin") > F.col("hi"))),
            1,
        )
        .otherwise(0)
        .alias("pruned"),
    )
    return (
        ev.groupBy("layout", F.col("pid").alias("predicate"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("zones_total"),
            F.sum("pruned").cast("bigint").alias("zones_pruned"),
            F.sum(F.when(F.col("pruned") == 1, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_skipped"),
            F.round(
                F.sum(F.when(F.col("pruned") == 1, F.col("n_rows")).otherwise(0))
                / F.sum("n_rows").cast("double"),
                9,
            ).alias("skip_fraction"),
        )
        .orderBy("layout", "predicate")
    )


# --------------------------------------------------------------------------
# Largest-triangle-one-bucket downsampling of the daily revenue series
# --------------------------------------------------------------------------

_LTOB_BUCKET_DAYS = 40  # ~2400 fixture days -> ~60 plotted points


def _sql_ltob() -> str:
    return f"""
WITH daily AS (
  SELECT CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
b AS (SELECT CAST(min(x) AS BIGINT) AS x0 FROM daily),
bucketed AS (
  SELECT CAST((d.x - b.x0) // {_LTOB_BUCKET_DAYS} AS BIGINT) AS bkt, d.x, d.y
  FROM daily d, b
),
anchors AS (
  SELECT bkt,
         CAST(round(CAST(sum(x) AS DOUBLE) / count(*) * 1000000.0) AS BIGINT)
           AS axq,
         CAST(round(CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) / count(*)) AS BIGINT)
           AS ayq,
         CAST(min(x) AS BIGINT) AS first_x, CAST(max(x) AS BIGINT) AS last_x,
         CAST(count(*) AS BIGINT) AS n
  FROM bucketed GROUP BY bkt
),
ctx AS (
  SELECT bkt, axq, ayq, n,
         lag(axq) OVER (ORDER BY bkt) AS pxq,
         lag(ayq) OVER (ORDER BY bkt) AS pyq,
         lead(axq) OVER (ORDER BY bkt) AS nxq,
         lead(ayq) OVER (ORDER BY bkt) AS nyq
  FROM anchors
),
scored AS (
  SELECT p.bkt, p.x, p.y,
         abs(CAST(c.pxq - c.nxq AS HUGEINT) * (p.y - c.pyq)
             - CAST(c.pxq - p.x * 1000000 AS HUGEINT) * (c.nyq - c.pyq))
           AS area2,
         c.n
  FROM bucketed p JOIN ctx c USING (bkt)
  WHERE c.pxq IS NOT NULL AND c.nxq IS NOT NULL
),
picked AS (
  SELECT bkt, x, y FROM (
    SELECT bkt, x, y,
           row_number() OVER (PARTITION BY bkt ORDER BY area2 DESC, x) AS rn
    FROM scored
  ) WHERE rn = 1
),
endpoints AS (
  SELECT CAST(-1 AS BIGINT) AS bkt, x, y FROM daily
  WHERE x = (SELECT min(x) FROM daily)
  UNION ALL
  SELECT CAST(1 << 40 AS BIGINT) AS bkt, x, y FROM daily
  WHERE x = (SELECT max(x) FROM daily)
)
SELECT x AS epoch_day, round(y / 100.0, 2) AS revenue
FROM (SELECT * FROM picked UNION ALL SELECT * FROM endpoints)
ORDER BY x
"""


@register(
    "ts_downsample_ltob",
    oracle=_sql_ltob(),
    tags=("timeseries", "plot", "downsample"),
)
def ts_downsample_ltob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-triangle-one-bucket downsampling (the parallelizable
    variant of Steinarsson's LTTB) of the daily revenue series to ~60
    plot points: per 40-day bucket, keep the point forming the largest
    triangle with the NEIGHBOR-bucket mean anchors — the downsampler
    that preserves visual extrema where naive bucket means flatten
    them. The global first/last days are kept verbatim (plot endpoint
    contract). This is the series the plot sink (SURVEY §2 S5) would
    actually draw at 100 TB — rendering every day is neither possible
    nor useful.

    Exactness: days are exact epoch-day integers, revenue exact cents;
    bucket anchors are micro-quantized means; the doubled triangle
    area |_(px-nx)(y-py) - (px-x)(ny-py)_| is then EXACT integer
    arithmetic (HUGEINT/decimal), so the per-bucket argmax — a
    row_number over (area desc, x) — is deterministic on both engines.

    Scale shape: one map-side-combined daily aggregate is the only
    data-sized stage (the theilsen/Sharpe discipline); anchors, lag/
    lead context, scoring, and the per-bucket rank all run on the
    day-grain (~2.4k rows) and bucket-grain (~60 rows) frames. The
    rank window partitions by bucket."""
    li = _t(spark, sf_dir, "lineitem")
    daily = li.groupBy(
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("x")
    ).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("y")
    ).localCheckpoint(eager=True)  # feeds buckets, both endpoints
    b = daily.agg(F.min("x").cast("bigint").alias("x0"))
    bucketed = daily.crossJoin(F.broadcast(b)).select(
        F.floor((F.col("x") - F.col("x0")) / _LTOB_BUCKET_DAYS)
        .cast("bigint")
        .alias("bkt"),
        "x",
        "y",
    )
    anchors = bucketed.groupBy("bkt").agg(
        F.round(F.sum("x").cast("double") / F.count(F.lit(1)) * 1000000.0)
        .cast("bigint")
        .alias("axq"),
        F.round(
            F.sum(F.col("y").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("ayq"),
        F.min("x").cast("bigint").alias("first_x"),
        F.max("x").cast("bigint").alias("last_x"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.orderBy("bkt")
    ctx = anchors.select(
        "bkt",
        "axq",
        "ayq",
        "n",
        F.lag("axq").over(w).alias("pxq"),
        F.lag("ayq").over(w).alias("pyq"),
        F.lead("axq").over(w).alias("nxq"),
        F.lead("ayq").over(w).alias("nyq"),
    )
    scored = (
        bucketed.join(F.broadcast(ctx), "bkt")
        .filter(F.col("pxq").isNotNull() & F.col("nxq").isNotNull())
        .select(
            "bkt",
            "x",
            "y",
            F.abs(
                (F.col("pxq") - F.col("nxq")).cast("decimal(38,0)")
                * (F.col("y") - F.col("pyq"))
                - (F.col("pxq") - F.col("x") * 1000000).cast("decimal(38,0)")
                * (F.col("nyq") - F.col("pyq"))
            ).alias("area2"),
        )
    )
    wr = Window.partitionBy("bkt").orderBy(F.desc("area2"), "x")
    picked = (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("bkt", "x", "y")
    )
    lo = daily.orderBy("x").limit(1).select(F.lit(-1).cast("bigint").alias("bkt"), "x", "y")
    hi = daily.orderBy(F.desc("x")).limit(1).select(
        F.lit(1 << 40).cast("bigint").alias("bkt"), "x", "y"
    )
    return (
        picked.unionAll(lo)
        .unionAll(hi)
        .select(
            F.col("x").alias("epoch_day"),
            F.round(F.col("y") / 100.0, 2).alias("revenue"),
        )
        .orderBy("epoch_day")
    )

"""Round-3 fifteenth tranche: rank/distribution statistics (two-sample
KS, Mann-Whitney U, weighted median), time-series autocorrelation,
cluster-quality silhouette, the mapInArrow UDF surface, and dynamic
pivot.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs
with identical semantics. The rank statistics all follow the same
discipline: per-distinct-value counts first (bounded cardinality), then
exact integer arithmetic on running sums — the statistic is a ratio of
integers, so both engines agree bit-for-bit before any rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DAVG, register, _t
from .functions.aggregates import davg

_KS_A, _KS_B = "click", "view"


def _sql_ks() -> str:
    return f"""
WITH pv AS (
  SELECT value,
         CAST(count(*) FILTER (WHERE event_type = '{_KS_A}') AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE event_type = '{_KS_B}') AS BIGINT) AS c2
  FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
  GROUP BY value
),
run AS (
  SELECT value,
         sum(c1) OVER (ORDER BY value) AS r1,
         sum(c2) OVER (ORDER BY value) AS r2
  FROM pv
),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM pv)
SELECT n1, n2,
       CAST(max(abs(r1 * n2 - r2 * n1)) AS BIGINT) AS d_num,
       round(CAST(max(abs(r1 * n2 - r2 * n1)) AS DOUBLE) / (n1 * n2), 9) AS ks_d,
       (CAST(max(abs(r1 * n2 - r2 * n1)) AS DOUBLE) / (n1 * n2))
         > 1.358 * sqrt(CAST(n1 + n2 AS DOUBLE) / (n1 * n2)) AS reject_95
FROM run, tot
GROUP BY n1, n2
"""


@register(
    "stats_ks_test",
    oracle=_sql_ks(),
    tags=("stats", "hypothesis-test", "rank"),
)
def stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between two event types' value
    distributions. D = sup|F1 - F2| is computed as an exact integer —
    max|r1*n2 - r2*n1| over the per-distinct-value running counts,
    divided by n1*n2 only at the end — so both engines agree on the
    statistic bit-for-bit; the 95% decision uses the asymptotic critical
    value 1.358*sqrt((n1+n2)/(n1*n2)). The only ordered window runs over
    the per-distinct-value frame (|values| ~ thousands, never row
    count); at 100 TB the ECDF running sums become two-level
    range-partitioned prefix sums over the same bounded frame. The
    1-row totals broadcast is the funnel scalar idiom."""
    pv = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_A, _KS_B))
        .groupBy("value")
        .agg(
            F.count(F.when(F.col("event_type") == _KS_A, 1)).alias("c1"),
            F.count(F.when(F.col("event_type") == _KS_B, 1)).alias("c2"),
        )
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    run = pv.select(
        F.sum("c1").over(w).alias("r1"), F.sum("c2").over(w).alias("r2")
    )
    tot = pv.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    j = run.crossJoin(F.broadcast(tot))
    diff = F.abs(F.col("r1") * F.col("n2") - F.col("r2") * F.col("n1"))
    agg = j.groupBy("n1", "n2").agg(F.max(diff).alias("d_num"))
    ks = F.col("d_num").cast("double") / (F.col("n1") * F.col("n2"))
    crit = F.lit(1.358) * F.sqrt(
        (F.col("n1") + F.col("n2")).cast("double") / (F.col("n1") * F.col("n2"))
    )
    return agg.select(
        "n1",
        "n2",
        "d_num",
        F.round(ks, 9).alias("ks_d"),
        (ks > crit).alias("reject_95"),
    )


def _sql_mwu() -> str:
    return f"""
WITH pv AS (
  SELECT value,
         CAST(count(*) FILTER (WHERE event_type = '{_KS_A}') AS BIGINT) AS c1,
         CAST(count(*) FILTER (WHERE event_type = '{_KS_B}') AS BIGINT) AS c2,
         CAST(count(*) AS BIGINT) AS c
  FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
  GROUP BY value
),
rk AS (
  SELECT c1, c2, c,
         coalesce(sum(c) OVER (ORDER BY value
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_excl
  FROM pv
),
s AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(c1 * (2 * cum_excl + c + 1)) AS BIGINT) AS two_r1,
         CAST(sum(c * c * c - c) AS BIGINT) AS ties
  FROM rk
)
SELECT n1, n2,
       (CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE)) / 2 AS u1,
       CAST(n1 AS DOUBLE) * n2 - (CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE)) / 2 AS u2,
       round(
         ((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE)) / 2
          - CAST(n1 AS DOUBLE) * n2 / 2)
         / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                * ((n1 + n2 + 1)
                   - CAST(ties AS DOUBLE)
                     / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))),
         6
       ) AS z_stat
FROM s
"""


@register(
    "stats_mannwhitney_u",
    oracle=_sql_mwu(),
    tags=("stats", "hypothesis-test", "rank"),
)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) with midrank tie handling and
    the tie-corrected normal approximation. Average ranks are carried as
    the exact integer 2*rank (2*cum_excl + c + 1), so the rank sum, both
    U statistics and the tie term Σ(c³-c) are exact integers; the z
    statistic is one identical IEEE expression over those integers in
    both engines, rounded at 6 dp for presentation. Shape: one
    per-distinct-value aggregation, one ordered window over that bounded
    frame, one final 1-row aggregate — no scalar broadcast needed."""
    pv = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_A, _KS_B))
        .groupBy("value")
        .agg(
            F.count(F.when(F.col("event_type") == _KS_A, 1)).alias("c1"),
            F.count(F.when(F.col("event_type") == _KS_B, 1)).alias("c2"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, -1)
    rk = pv.select(
        "c1",
        "c2",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum_excl"),
    )
    s = rk.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cum_excl") + F.col("c") + 1)).alias("two_r1"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("ties"),
    )
    u1 = (F.col("two_r1") - F.col("n1") * (F.col("n1") + 1)).cast("double") / 2
    n1d = F.col("n1").cast("double")
    mu = n1d * F.col("n2") / 2
    var = (
        n1d
        * F.col("n2")
        / 12
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("ties").cast("double")
            / ((F.col("n1") + F.col("n2")).cast("double") * (F.col("n1") + F.col("n2") - 1))
        )
    )
    return s.select(
        "n1",
        "n2",
        u1.alias("u1"),
        (n1d * F.col("n2") - u1).alias("u2"),
        F.round((u1 - mu) / F.sqrt(var), 6).alias("z_stat"),
    )


_ACF_MAX_LAG = 6


def _sql_acf() -> str:
    leads = ", ".join(
        f"lead(x, {k}) OVER (ORDER BY h) AS x{k}" for k in range(1, _ACF_MAX_LAG + 1)
    )
    nums = ",\n    ".join(
        f"CAST(sum(CAST(round((x - xbar) * (x{k} - xbar) * 1e9) AS BIGINT)) AS BIGINT)"
        f" AS num{k}"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    rows = "\nUNION ALL\n".join(
        f"SELECT {k} AS lag, round(CAST(num{k} AS DOUBLE) / denom, 9) AS acf FROM s"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    davg_x = SQL_DAVG.format(x="value")
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, {davg_x} AS x
  FROM events GROUP BY 1
),
m AS (SELECT {SQL_DAVG.format(x='x')} AS xbar FROM hourly),
led AS (
  SELECT x, xbar, {leads}
  FROM hourly, m
),
s AS (
  SELECT
    CAST(sum(CAST(round((x - xbar) * (x - xbar) * 1e9) AS BIGINT)) AS BIGINT) AS denom,
    {nums}
  FROM led
)
{rows}
ORDER BY lag
"""


@register(
    "ts_autocorrelation",
    oracle=_sql_acf(),
    tags=("timeseries", "acf", "window"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1..6) of the hourly mean-value
    series. The series is an aggregate first (720 points at sf0.01 —
    the ordered window runs over series cardinality, never raw events);
    one window sort produces all six leads. Each product term
    (x_t - x̄)(x_{t+k} - x̄) is quantized to nano-units before summing,
    so numerator and denominator are exact integers and the ACF is a
    ratio both engines compute identically. The global series mean is
    the 1-row scalar broadcast idiom. At 100 TB the hourly pre-agg is
    the shuffle; the series itself stays tiny in any realistic horizon
    (10 years ≈ 90k points)."""
    hourly = (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(davg("value").alias("x"))
    )
    m = hourly.agg(davg("x").alias("xbar"))
    w = Window.orderBy("h")
    led = hourly.crossJoin(F.broadcast(m)).select(
        "x",
        "xbar",
        *[F.lead("x", k).over(w).alias(f"x{k}") for k in range(1, _ACF_MAX_LAG + 1)],
    )

    def qprod(a, b):
        return F.sum(F.round((a - F.col("xbar")) * (b - F.col("xbar")) * 1e9).cast("bigint"))

    s = led.agg(
        qprod(F.col("x"), F.col("x")).alias("denom"),
        *[
            qprod(F.col("x"), F.col(f"x{k}")).alias(f"num{k}")
            for k in range(1, _ACF_MAX_LAG + 1)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.round(
                    F.col(f"num{k}").cast("double") / F.col("denom"), 9
                ).alias("acf"),
            )
            for k in range(1, _ACF_MAX_LAG + 1)
        ]
    )
    return (
        s.select(F.explode(rows).alias("r"))
        .select("r.lag", "r.acf")
        .orderBy("lag")
    )


def _sql_silhouette() -> str:
    return f"""
WITH x AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS xd
  FROM embeddings
),
cent AS (
  SELECT label AS clabel, dim, {SQL_DAVG.format(x='xd')} AS cd
  FROM x GROUP BY label, dim
),
cnorm AS (
  SELECT clabel,
         CAST(sum(CAST(round(cd * cd * 1e9) AS BIGINT)) AS BIGINT) AS cq
  FROM cent GROUP BY clabel
),
vnorm AS (
  SELECT vec_id,
         CAST(sum(CAST(round(xd * xd * 1e9) AS BIGINT)) AS BIGINT) AS xq
  FROM x GROUP BY vec_id
),
dots AS (
  SELECT x.vec_id, x.label, c.clabel,
         CAST(sum(CAST(round(x.xd * c.cd * 1e9) AS BIGINT)) AS BIGINT) AS dq
  FROM x JOIN cent c USING (dim)
  GROUP BY x.vec_id, x.label, c.clabel
),
dist AS (
  SELECT d.vec_id, d.label, d.clabel,
         1.0 - (CAST(d.dq AS DOUBLE) / 1e9)
               / (sqrt(CAST(v.xq AS DOUBLE) / 1e9) * sqrt(CAST(c.cq AS DOUBLE) / 1e9))
           AS cdist
  FROM dots d JOIN vnorm v USING (vec_id) JOIN cnorm c USING (clabel)
),
ab AS (
  SELECT vec_id, label,
         min(cdist) FILTER (WHERE clabel = label) AS a,
         min(cdist) FILTER (WHERE clabel <> label) AS b
  FROM dist GROUP BY vec_id, label
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       round({SQL_DAVG.format(x='(b - a) / greatest(a, b)')}, 6) AS mean_silhouette
FROM ab GROUP BY label ORDER BY label
"""


@register(
    "embeddings_silhouette_simplified",
    oracle=_sql_silhouette(),
    tags=("embeddings", "clustering", "quality"),
)
def embeddings_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette score per label over the embeddings table —
    the standard clustering-quality metric with centroid distances in
    place of the O(n²) pairwise form (the only version that exists at
    scale): a = cosine distance to the own-label centroid, b = min
    distance to any other centroid, s = (b-a)/max(a,b). Centroids are a
    (labels × dims) frame built from one posexplode aggregation and
    joined back broadcast; every dot-product term is quantized to
    nano-units so distances are ratios of exact integers. At 100 TB the
    per-vector work is corpus × k × dims with the centroid side
    broadcast — embarrassingly parallel, no all-pairs anywhere."""
    x = (
        _t(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            "label",
            F.posexplode("embedding").alias("dim0", "xf"),
        )
        .select(
            "vec_id",
            "label",
            (F.col("dim0") + 1).alias("dim"),
            F.col("xf").cast("double").alias("xd"),
        )
    )
    cent = x.groupBy(F.col("label").alias("clabel"), "dim").agg(
        davg("xd").alias("cd")
    )
    cnorm = cent.groupBy("clabel").agg(
        F.sum(F.round(F.col("cd") * F.col("cd") * 1e9).cast("bigint")).alias("cq")
    )
    vnorm = x.groupBy("vec_id").agg(
        F.sum(F.round(F.col("xd") * F.col("xd") * 1e9).cast("bigint")).alias("xq")
    )
    dots = (
        x.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(F.round(F.col("xd") * F.col("cd") * 1e9).cast("bigint")).alias("dq")
        )
    )
    dist = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(cnorm), "clabel")
        .select(
            "vec_id",
            "label",
            "clabel",
            (
                F.lit(1.0)
                - (F.col("dq").cast("double") / 1e9)
                / (
                    F.sqrt(F.col("xq").cast("double") / 1e9)
                    * F.sqrt(F.col("cq").cast("double") / 1e9)
                )
            ).alias("cdist"),
        )
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("cdist"))).alias("a"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("cdist"))).alias("b"),
    )
    s = (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
    return (
        ab.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(davg(s), 6).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


def _sql_weighted_median() -> str:
    return """
WITH pv AS (
  SELECT l_returnflag AS flag, l_extendedprice AS price,
         CAST(sum(CAST(round(l_quantity * 1000000.0) AS BIGINT)) AS BIGINT) AS w
  FROM lineitem GROUP BY 1, 2
),
run AS (
  SELECT flag, price, w,
         sum(w) OVER (PARTITION BY flag ORDER BY price) AS cumw,
         sum(w) OVER (PARTITION BY flag) AS totw
  FROM pv
)
SELECT flag, min(price) AS weighted_median_price
FROM run WHERE 2 * cumw >= totw
GROUP BY flag ORDER BY flag
"""


@register(
    "stats_weighted_median",
    oracle=_sql_weighted_median(),
    tags=("stats", "percentile", "weighted"),
)
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (quantity-weighted price per return flag): the
    smallest value whose cumulative weight reaches half the total.
    Weights are exact micro-unit integers, the pick is a rank selection
    (no interpolation convention to disagree on), and the ordered window
    runs over the per-(flag, distinct price) frame, not raw rows. The
    lower-median convention (2*cumw >= totw, min value) is pinned in
    both engines."""
    pv = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("price"))
        .agg(
            F.sum(F.round(F.col("l_quantity") * 1000000.0).cast("bigint")).alias("w")
        )
    )
    wrun = Window.partitionBy("flag").orderBy("price").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("flag")
    run = pv.select(
        "flag",
        "price",
        F.sum("w").over(wrun).alias("cumw"),
        F.sum("w").over(wtot).alias("totw"),
    )
    return (
        run.filter(2 * F.col("cumw") >= F.col("totw"))
        .groupBy("flag")
        .agg(F.min("price").alias("weighted_median_price"))
        .orderBy("flag")
    )


def _sql_map_in_arrow() -> str:
    return """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1
            END AS BIGINT) AS n_tokens_ws
FROM documents ORDER BY doc_id
"""


@register(
    "udf_map_in_arrow",
    oracle=_sql_map_in_arrow(),
    tags=("udf", "arrow", "mapInArrow"),
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (Spark 4's zero-copy batch UDF surface — the lowest-
    overhead Python hook, no pandas conversion): per-batch pyarrow
    compute kernels produce length and whitespace-token counts. The
    token formula (trimmed length minus space-stripped length, plus one)
    is chosen because both pyarrow and SQL express it exactly, so the
    Python path is value-oracled, unlike typical UDF escapes. Completes
    the UDF matrix: scalar pandas_udf (U1), applyInPandas (U2),
    mapInPandas (U3), UDTF (U4), grouped-agg (U5), mapInArrow (U6).
    Partition-preserving, no shuffle; Arrow batches flow through
    unchanged row order and the final orderBy is presentation only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for b in it:
            t = b.column("text")
            trimmed = pc.utf8_trim_whitespace(t)
            tlen = pc.utf8_length(trimmed)
            stripped = pc.utf8_length(pc.replace_substring(trimmed, " ", ""))
            n_tok = pc.if_else(
                pc.equal(tlen, 0),
                pa.scalar(0, pa.int64()),
                pc.add(pc.subtract(tlen, stripped), 1),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.cast(pc.utf8_length(t), pa.int64()),
                    pc.cast(n_tok, pa.int64()),
                ],
                ["doc_id", "n_chars", "n_tokens_ws"],
            )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        batches, "doc_id long, n_chars long, n_tokens_ws long"
    ).orderBy("doc_id")


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def _sql_pivot_dynamic() -> str:
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}"
        for t in _PIVOT_TYPES
    )
    return f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       {cols}
FROM events GROUP BY 1 ORDER BY day
"""


@register(
    "pivot_dynamic_event_types",
    oracle=_sql_pivot_dynamic(),
    tags=("pivot", "dynamic"),
)
def pivot_dynamic_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot: the column list is DISCOVERED from the data (a
    distinct scan of the pivot key — a small-dimension collect, the one
    place a driver-side collect is the designed behavior, same as
    Spark's own two-phase pivot when values are omitted), then the
    pivot itself runs as conditional aggregation. Passing the explicit
    value list to ``pivot()`` keeps the plan single-pass at 100 TB;
    counts are zero-filled so the wide schema is total."""
    ev = _t(spark, sf_dir, "events")
    values = sorted(
        r[0] for r in ev.select("event_type").distinct().collect()
    )
    wide = (
        ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .pivot("event_type", values)
        .count()
    )
    return wide.select(
        "day", *[F.coalesce(F.col(v), F.lit(0)).alias(v) for v in values]
    ).orderBy("day")

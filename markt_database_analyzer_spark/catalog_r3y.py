"""Round-3 twenty-sixth tranche: 2-D skyline (Pareto front) via
range-frame windows, Zipf's-law exponent fit over the term-frequency
distribution, the named-WINDOW SQL surface, and a data-freshness gate.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs
with identical semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, register, _t
from .datapipe import text as tx


# --------------------------------------------------------------------------
# 2-D skyline / Pareto front (minimize price, maximize size)
# --------------------------------------------------------------------------

_SKY_MAX_PART = 2000

_SQL_SKYLINE = f"""
WITH p AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part WHERE p_partkey <= {_SKY_MAX_PART}
),
m AS (
  SELECT p_partkey, price_cents, size,
         max(size) OVER (ORDER BY price_cents
                         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_strict,
         max(size) OVER (ORDER BY price_cents
                         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_incl
  FROM p
)
SELECT p_partkey, price_cents, size
FROM m
WHERE (m_strict IS NULL OR m_strict < size) AND m_incl <= size
ORDER BY price_cents, p_partkey
"""


@register(
    "parts_skyline_2d",
    oracle=_SQL_SKYLINE,
    tags=("skyline", "window", "pareto"),
)
def parts_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto front): the parts not dominated on
    (minimize price, maximize size) — dominance = cheaper-or-equal AND
    bigger-or-equal with one strict. The classic O(n²) dominance
    anti-join collapses to TWO RANGE-frame window maxima over the
    integer-cent price order: dominated iff some strictly-cheaper part
    is at least as big (m_strict >= size) or some cheaper-or-equal part
    is strictly bigger (m_incl > size). One sort, linear pass — the 2-D
    special case every skyline paper starts from; higher dimensions fall
    back to the blocked dominance join. RANGE frames need the integer
    key (cents), not the raw double."""
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= _SKY_MAX_PART)
        .select(
            "p_partkey",
            F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
            F.col("p_size").cast("bigint").alias("size"),
        )
    )
    w = Window.orderBy("price_cents")
    m_strict = F.max("size").over(w.rangeBetween(Window.unboundedPreceding, -1))
    m_incl = F.max("size").over(w.rangeBetween(Window.unboundedPreceding, 0))
    return (
        p.withColumn("m_strict", m_strict)
        .withColumn("m_incl", m_incl)
        .filter(
            (F.col("m_strict").isNull() | (F.col("m_strict") < F.col("size")))
            & (F.col("m_incl") <= F.col("size"))
        )
        .select("p_partkey", "price_cents", "size")
        .orderBy("price_cents", "p_partkey")
    )


# --------------------------------------------------------------------------
# Zipf's-law exponent fit (log-log OLS over term ranks)
# --------------------------------------------------------------------------

def _sql_zipf() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH tf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest({toks}) AS tok FROM documents)
  GROUP BY tok
),
ranked AS (
  SELECT tok, freq,
         row_number() OVER (ORDER BY freq DESC, tok) AS rank
  FROM tf
),
pts AS (
  SELECT round(ln(rank), 9) AS x, round(ln(freq), 9) AS y FROM ranked
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         {SQL_DSUM.format(x='x')} AS sx,
         {SQL_DSUM.format(x='y')} AS sy,
         {SQL_DSUM.format(x='x * y')} AS sxy,
         {SQL_DSUM.format(x='x * x')} AS sxx
  FROM pts
)
SELECT n AS vocab_size,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
       round(-((n * sxy - sx * sy) / (n * sxx - sx * sx)), 9) AS zipf_exponent,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 9) AS intercept
FROM stats
"""


@register(
    "text_zipf_fit",
    oracle=_sql_zipf(),
    tags=("text", "stats", "zipf"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent for the corpus: OLS of ln(freq) on ln(rank)
    over the term-frequency table — the one-number summary of vocabulary
    skew (natural language sits near s≈1; a synthetic or templated
    corpus shows up immediately as a flat slope). One token groupBy, one
    global rank window over VOCABULARY rows (never corpus rows), and a
    closed-form OLS on 9 dp-rounded logs with micro-quantized sums."""
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select(F.explode(tx.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = tf.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("freq"), "tok"))
    )
    pts = ranked.select(
        F.round(F.log("rank"), 9).alias("x"), F.round(F.log("freq"), 9).alias("y")
    )

    def dsum(c):
        return F.sum(F.round(c * 1000000.0).cast("long")).cast("double") / 1000000.0

    stats = pts.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return stats.select(
        F.col("n").alias("vocab_size"),
        F.round(slope, 9).alias("slope"),
        F.round(-slope, 9).alias("zipf_exponent"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 9).alias("intercept"),
    )


# --------------------------------------------------------------------------
# Named WINDOW clause (SQL surface parity)
# --------------------------------------------------------------------------

_SQL_NAMED_WINDOW = """
SELECT o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(row_number() OVER w AS BIGINT) AS order_seq,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT)
         AS running_cents
FROM orders
WHERE o_custkey <= 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, order_seq
"""


@register(
    "sql_named_window",
    oracle=_SQL_NAMED_WINDOW,
    tags=("sql", "window", "surface"),
)
def sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The named-WINDOW SQL surface: one WINDOW clause shared by several
    window functions — IDENTICAL query text executes on Spark SQL and
    DuckDB (the sql_group_by_all / LATERAL precedent), proving the
    engine's SQL front-end covers the clause. Semantics: per-customer
    order sequence + running integer-cent revenue over a total order."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SQL_NAMED_WINDOW)


# --------------------------------------------------------------------------
# Data freshness gate
# --------------------------------------------------------------------------

_FRESH_SLA_MIN = 60.0

_SQL_FRESHNESS = f"""
WITH per_type AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_events,
         max(epoch_us(ts)) AS last_us
  FROM events GROUP BY event_type
),
ref AS (SELECT max(last_us) AS now_us FROM per_type)
SELECT event_type, n_events,
       make_timestamp(last_us) AS last_event_ts,
       round((now_us - last_us) / 60000000.0, 6) AS staleness_min,
       ((now_us - last_us) / 60000000.0) > {_FRESH_SLA_MIN} AS violates_sla
FROM per_type CROSS JOIN ref
ORDER BY event_type
"""


@register(
    "dq_freshness_lag",
    oracle=_SQL_FRESHNESS,
    tags=("dq", "freshness", "monitoring"),
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline freshness gate: per-source staleness of the latest event
    against the dataset's own high-water mark (a wall-clock-free
    reference — the comparison every ingestion monitor runs, made
    deterministic for the differential). Exact integer-µs lags; the SLA
    flag trips at {_FRESH_SLA_MIN} minutes. One grouped max + a 1-row
    broadcast — constant state at any scale."""
    ev = _t(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.unix_micros("ts")).alias("last_us"),
    )
    ref = per_type.agg(F.max("last_us").alias("now_us"))
    lag_min = (F.col("now_us") - F.col("last_us")) / 60000000.0
    return (
        per_type.crossJoin(F.broadcast(ref))
        .select(
            "event_type",
            "n_events",
            F.timestamp_micros("last_us").alias("last_event_ts"),
            F.round(lag_min, 6).alias("staleness_min"),
            (lag_min > _FRESH_SLA_MIN).alias("violates_sla"),
        )
        .orderBy("event_type")
    )

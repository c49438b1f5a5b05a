"""Relational engine surface: join shapes, SQL parity forms, sources, UDFs.

Consolidated in round 9 from the round-named catalog shards (the
original per-round files are in git history; entry source text is
unchanged). Every entry registers in REGISTRY with a DuckDB oracle
unless documented otherwise; reference parity citations live in the
entry docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from .catalog import SQL_DAVG, SQL_DSUM, register, _t
from .functions import davg, dsum
from .catalog import SQL_DSUM, register, _t
from .functions import dsum
from .operators.scd import scd2_versions
from pyspark.sql import DataFrame, SparkSession
from .datapipe.hashing import hash60, sql_hash60
from pyspark.sql import Column, DataFrame, SparkSession, Window
from .catalog import register, _t
import pandas as pd  # noqa: F401  (resolves postponed UDF type hints)
from .catalog import SQL_DAVG, register, _t
from .functions.aggregates import davg
from .datapipe import dedup as dd
from .operators.asof import asof_join_last
from .datapipe.hashing import sql_hash60
from .catalog import SQL_DAVG, _t, register
from .functions import davg


@register(
    "pysource_range_catalog",
    oracle=f"""
WITH src AS (
  SELECT x AS doc_id,
         list_extract(['en', 'de', 'fr', 'es', 'zh'], CAST(x % 5 AS INTEGER) + 1) AS lang,
         (x % 97) / 97.0 AS score
  FROM (SELECT unnest(generate_series(0, 9999)) AS x)
)
SELECT lang, count(*) AS n_docs, {SQL_DSUM.format(x='score')} AS sum_score
FROM src GROUP BY lang ORDER BY lang
""",
    tags=("source", "pysource", "ingest"),
)
def pysource_range_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 Python DataSource API as the engine's pluggable ingest
    edge (sources/pysource.py): schema declaration, option parsing, and
    REAL partition planning — 8 InputPartitions become 8 concurrent
    tasks, the unit of scale-out for any Python-readable feed (the
    reference's scrape pipeline would plug in here instead of the
    hard-coded SQLite file, analyse.py:8). Rows are modular-arithmetic
    deterministic, so DuckDB replays the source exactly with
    generate_series; the aggregate on top proves the source composes
    with the relational layer like any parquet scan. ``sf_dir`` is
    unused — the source is the fixture."""
    from .sources.pysource import register_synthetic_docs

    register_synthetic_docs(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", "10000")
        .option("partitions", "8")
        .load()
    )
    return (
        df.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), dsum(F.col("score")).alias("sum_score"))
        .orderBy("lang")
    )


@register(
    "scd2_user_state_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, event_type)
),
changes AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id,
       CAST(row_number() OVER w2 AS BIGINT) AS version_no,
       event_type,
       ts AS valid_from,
       lead(ts) OVER w2 AS valid_to,
       (lead(ts) OVER w2 IS NULL) AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id, event_type)
ORDER BY user_id, version_no
""",
    tags=("scd", "window", "warehouse"),
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: treat events as a per-user
    state changelog (event_type = the tracked attribute), collapse
    consecutive runs, and emit one validity interval per version with
    valid_from/valid_to/is_current. The warehouse-general form of the
    reference's per-listing state-over-time handling (analyse.py's
    per-key trajectory ordering). Two windows over the SAME (key, order)
    partitioning -> Catalyst plans one shuffle; the order is made total
    with (ts, event_id, event_type) tiebreaks so both engines collapse
    identical runs."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    out = scd2_versions(
        ev, key="user_id", attr="event_type", order_by=["ts", "event_id", "event_type"]
    )
    return out.sortWithinPartitions("user_id", "version_no")


_ROLLUP_GRAIN_SQL = """
  SELECT '{g}' AS grain, date_trunc('{g}', ts) AS bucket_start,
         CAST(count(*) AS BIGINT) AS n, {total} AS total
  FROM events GROUP BY 2"""
@register(
    "rollup_hier_timegrain",
    oracle=(
        "WITH g AS ("
        + " UNION ALL ".join(
            _ROLLUP_GRAIN_SQL.format(g=g, total=SQL_DSUM.format(x="value"))
            for g in ("hour", "day", "month")
        )
        + """)
SELECT grain, bucket_start, n, total, round(total / n, 6) AS avg_value
FROM g ORDER BY grain, bucket_start"""
    ),
    tags=("rollup", "timeseries", "hierarchical"),
)
def rollup_hier_timegrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: hour partials from
    the raw scan, then DAY re-aggregated from the hourly partials and
    MONTH from the daily ones — the raw table is scanned ONCE and each
    coarser grain aggregates ~24x/~30x fewer rows than a direct
    group-by. At 100 TB this is the difference between three full scans
    and one: the cascade's day/month stages shuffle only bucket-count
    rows. Exactness under re-aggregation is guaranteed by the micro-unit
    grid (hour totals are exact multiples of 1e-6, so re-quantizing them
    is lossless); the oracle computes each grain directly from raw rows
    and must match bit-for-bit."""
    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "value"
    )
    hourly = ev.groupBy("hour").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total")
    )
    daily = hourly.groupBy(F.date_trunc("day", F.col("hour")).alias("day")).agg(
        F.sum("n").alias("n"), dsum(F.col("total")).alias("total")
    )
    monthly = daily.groupBy(F.date_trunc("month", F.col("day")).alias("month")).agg(
        F.sum("n").alias("n"), dsum(F.col("total")).alias("total")
    )

    def shape(df: DataFrame, grain: str, bucket: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.col(bucket).alias("bucket_start"),
            "n",
            "total",
        )

    out = (
        shape(hourly, "hour", "hour")
        .unionByName(shape(daily, "day", "day"))
        .unionByName(shape(monthly, "month", "month"))
    )
    return out.select(
        "grain",
        "bucket_start",
        "n",
        "total",
        F.round(F.col("total") / F.col("n"), 6).alias("avg_value"),
    ).sortWithinPartitions("grain", "bucket_start")


_BLOOM_M, _BLOOM_K = 4096, 4
def _sql_bloom_pos_union(key_expr: str, src: str, extra: str = "") -> str:
    return " UNION ALL ".join(
        f"SELECT {extra}{'' if not extra else ', '}"
        f"({sql_hash60(key_expr, seed=r)}) % {_BLOOM_M} AS pos FROM {src}"
        for r in range(_BLOOM_K)
    )
@register(
    "filter_bloom_semijoin",
    oracle=f"""
WITH build AS (
  SELECT CAST(c_custkey AS VARCHAR) AS k FROM customer
  WHERE c_mktsegment = 'BUILDING'
),
bits AS (
  SELECT DISTINCT pos FROM ({_sql_bloom_pos_union("k", "build")})
),
probe AS (SELECT CAST(c_custkey AS VARCHAR) AS k, c_custkey FROM customer),
probe_pos AS (
  SELECT DISTINCT k, pos FROM ({_sql_bloom_pos_union("k", "probe", extra="k")})
),
hits AS (
  SELECT p.k,
         CAST(count(*) AS BIGINT) AS npos,
         CAST(count(b.pos) AS BIGINT) AS nhit
  FROM probe_pos p LEFT JOIN bits b USING (pos)
  GROUP BY p.k
),
verdict AS (
  SELECT h.k, (h.nhit = h.npos) AS in_filter,
         (pr.k IS NOT NULL) AS is_member
  FROM hits h
  LEFT JOIN (SELECT DISTINCT k FROM build) pr ON h.k = pr.k
)
SELECT in_filter, is_member, CAST(count(*) AS BIGINT) AS n
FROM verdict GROUP BY 1, 2 ORDER BY in_filter, is_member
""",
    tags=("bloom", "semijoin", "pruning"),
)
def filter_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning built from pure expressions: the
    build side (one customer segment) sets k=4 md5-seeded positions in
    an m=4096-bit filter; the probe side keeps rows whose positions are
    ALL set. This is the runtime-row-level-filtering pattern (Spark's
    InjectRuntimeFilter / Bloom-pushdown) made engine-portable: the
    filter state is a <=m-row distinct-position frame, broadcastable at
    any build-side size, and the probe never shuffles. The output
    contingency (in_filter x is_member) demonstrates the one-sided
    guarantee — the (false, true) cell CANNOT exist (no false
    negatives), which the oracle hash-proves; (true, false) counts are
    the measured false positives."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("k"), "c_mktsegment"
    )
    build = cust.filter(F.col("c_mktsegment") == "BUILDING").select("k")

    def positions(df: DataFrame) -> DataFrame:
        return df.select(
            "k",
            F.explode(
                F.array_distinct(
                    F.array(
                        *[
                            hash60(F.col("k"), seed=r) % F.lit(_BLOOM_M)
                            for r in range(_BLOOM_K)
                        ]
                    )
                )
            ).alias("pos"),
        )

    bits = positions(build).select("pos").distinct()
    probe_pos = positions(cust.select("k").distinct())
    hits = (
        probe_pos.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("npos"),
            F.count("hit").alias("nhit"),
        )
    )
    verdict = hits.join(
        build.distinct().withColumn("m", F.lit(1)), "k", "left"
    ).select(
        (F.col("nhit") == F.col("npos")).alias("in_filter"),
        F.col("m").isNotNull().alias("is_member"),
    )
    return (
        verdict.groupBy("in_filter", "is_member")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("in_filter", "is_member")
    )


@register(
    "join_interval_overlap",
    oracle=f"""
WITH a AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         min(epoch_us(ts)) AS a_start, max(epoch_us(ts)) AS a_end
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT event_type,
         min(epoch_us(ts)) AS b_start, max(epoch_us(ts)) AS b_end
  FROM events GROUP BY event_type, date_trunc('week', ts)
)
SELECT b.event_type,
       CAST(count(*) AS BIGINT) AS n_pairs,
       {SQL_DSUM.format(x='(least(a.a_end, b.b_end) - greatest(a.a_start, b.b_start)) / 3600000000.0')} AS total_overlap_hours
FROM a JOIN b ON a.a_start <= b.b_end AND b.b_start <= a.a_end
GROUP BY 1 ORDER BY 1
""",
    tags=("interval", "join", "temporal"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via day-bucket blocking: side A is each
    user's daily activity span (contained in one day by construction),
    side B is each event type's weekly span, EXPLODED onto the days it
    covers — so overlap candidates come from an equi-join on the day
    bucket, never from an inequality join. Each true overlap meets in
    exactly one bucket (A spans a single day), so the bucketed join is
    LOSSLESS vs the theta join, which is what the DuckDB oracle runs
    (its IEJoin) — the hash match is the losslessness proof at every
    SF. This is the published bucket/bin interval-join design (e.g.
    interval trees flattened to grid blocking) that survives 100 TB:
    shuffle keys are (day), both sides prune to bucket-local pairs."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", F.unix_micros("ts").alias("us")
    )
    a = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.min("us").alias("a_start"), F.max("us").alias("a_end")
    )
    b = (
        ev.groupBy("event_type", F.date_trunc("week", "ts").alias("week"))
        .agg(
            F.min("us").alias("b_start"),
            F.max("us").alias("b_end"),
            F.min("ts").alias("b_start_ts"),
            F.max("ts").alias("b_end_ts"),
        )
        .select(
            "event_type",
            "b_start",
            "b_end",
            F.explode(
                F.sequence(
                    F.date_trunc("day", "b_start_ts"),
                    F.date_trunc("day", "b_end_ts"),
                    F.expr("interval 1 day"),
                )
            ).alias("day"),
        )
    )
    pairs = a.join(b, "day").filter(
        (F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end"))
    )
    overlap_h = (
        F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
    ) / F.lit(3600000000.0)
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            dsum(overlap_h).alias("total_overlap_hours"),
        )
        .orderBy("event_type")
    )


@register(
    "assoc_rules_parts",
    oracle="""
WITH baskets AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
ic AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM baskets GROUP BY p),
nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM baskets),
co AS (
  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS co
  FROM baskets a JOIN baskets b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
)
SELECT pa, pb, co,
       round(CAST(co AS DOUBLE) / nn.n, 9) AS support,
       round(CAST(co AS DOUBLE) / ia.c, 9) AS confidence,
       round((CAST(co AS DOUBLE) * nn.n) / (CAST(ia.c AS DOUBLE) * ib.c), 9) AS lift
FROM co
JOIN ic ia ON co.pa = ia.p
JOIN ic ib ON co.pb = ib.p
CROSS JOIN nn
WHERE co >= 3
ORDER BY lift DESC, pa, pb LIMIT 30
""",
    tags=("association-rules", "market-basket", "analytics"),
)
def assoc_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: pair
    co-occurrence by self-joining the distinct (order, part) projection
    on the order key — candidate pairs are generated per basket (cost
    Σ basket²), never across baskets — then support / confidence / lift
    from broadcast item counts. This is the A-Priori candidate-pair
    step expressed relationally; the min-support gate (co >= 3) is the
    same pruning the published algorithm applies. At 100 TB the basket
    self-join co-partitions both sides on the order key (single
    shuffle), and oversized baskets are the skew knob (cap or salt)."""
    baskets = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    ic = baskets.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    nn = baskets.agg(F.countDistinct("o").alias("n"))
    a = baskets.select("o", F.col("p").alias("pa"))
    b = baskets.select("o", F.col("p").alias("pb"))
    co = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 3)
    )
    ia = ic.select(F.col("p").alias("pa"), F.col("c").alias("ca"))
    ib = ic.select(F.col("p").alias("pb"), F.col("c").alias("cb"))
    return (
        co.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(nn))
        .select(
            "pa",
            "pb",
            "co",
            F.round(F.col("co").cast("double") / F.col("n"), 9).alias("support"),
            F.round(F.col("co").cast("double") / F.col("ca"), 9).alias("confidence"),
            F.round(
                (F.col("co").cast("double") * F.col("n"))
                / (F.col("ca").cast("double") * F.col("cb")),
                9,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "pa", "pb")
        .limit(30)
    )


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


_REC_SQL = """
WITH RECURSIVE d(custkey, depth) AS (
  SELECT c_custkey, 0 FROM {src} WHERE c_custkey = 1
  UNION ALL
  SELECT c.c_custkey, d.depth + 1
  FROM {src} c JOIN d ON c.c_custkey {intdiv} 2 = d.custkey
  WHERE c.c_custkey > 1
)
SELECT CAST(depth AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS n,
       min(custkey) AS min_key, max(custkey) AS max_key
FROM d GROUP BY depth ORDER BY depth
"""
@register(
    "sql_recursive_tree_depth",
    oracle=_REC_SQL.format(src="customer", intdiv="//"),
    tags=("recursive-cte", "sql", "hierarchy"),
)
def sql_recursive_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE) walking the implicit
    binary-heap hierarchy over customer keys (parent(k) = k div 2):
    per-level node counts and key ranges, the org-chart / BOM traversal
    shape. Each recursion step is one equi-join of the full relation
    against the previous frontier — exactly how Catalyst executes the
    UnionLoop — and depth is bounded by log2(max key), so the plan is
    ~14 joins at sf1 scale, each frontier-sized. The oracle runs the
    IDENTICAL query under DuckDB's recursive-CTE engine (only the
    integer-division spelling differs), making this a cross-engine
    differential of the recursion semantics themselves."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    cust.createOrReplaceTempView("customer_tree_src")
    return spark.sql(_REC_SQL.format(src="customer_tree_src", intdiv="DIV"))


@register(
    "f_variant_props_shred",
    oracle="""
SELECT event_type,
       CAST(count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS n_valid,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("variant", "semi-structured", "spark4"),
)
def f_variant_props_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured ingestion (Spark 4): props parse
    once into the binary VARIANT encoding and typed paths shred out via
    variant_get — the open-table-format pattern for schema-flexible
    columns, replacing per-access JSON string re-parsing (the
    get_json_object path that `f_json_props` covers). Extraction,
    typing, and aggregation all stay JVM-side; the oracle replays the
    same shred with DuckDB's JSON extraction, so the differential pins
    that VARIANT's numeric typing agrees with text-JSON semantics."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("k").alias("n_valid"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "pysource_stream_counts",
    oracle=f"""
WITH src AS (
  SELECT x AS doc_id,
         list_extract(['en', 'de', 'fr', 'es', 'zh'], CAST(x % 5 AS INTEGER) + 1) AS lang,
         (x % 97) / 97.0 AS score
  FROM (SELECT unnest(generate_series(0, 9999)) AS x)
)
SELECT lang, count(*) AS n_docs, {SQL_DSUM.format(x='score')} AS sum_score
FROM src GROUP BY lang ORDER BY lang
""",
    tags=("source", "pysource", "streaming"),
)
def pysource_stream_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING half of the custom Python DataSource
    (sources/pysource.py SyntheticDocsStreamReader): position offsets,
    2 micro-batches of 5000 rows each, and exact readBetweenOffsets
    replay — the contract a queue-backed feed implements for
    checkpoint recovery. The same aggregation as the batch-source
    entry runs over the stream in complete mode and must produce the
    identical result the DuckDB generate_series oracle computes:
    batching is invisible to the aggregate, which is the
    exactly-once-equivalence the offset protocol exists to provide.
    ``sf_dir`` is unused — the source is the fixture."""
    from .sources.pysource import register_synthetic_docs
    from .streaming.jobs import run_stream_to_memory

    register_synthetic_docs(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("n", "10000")
        .option("batch", "5000")
        .load()
    )
    agg = stream.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), dsum(F.col("score")).alias("sum_score")
    )
    return run_stream_to_memory(agg, "complete", available_now=False).orderBy("lang")


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
        .sortWithinPartitions("day")
    )


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
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("l_returnflag").alias("returnflag")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(rev).alias("revenue"))
        .orderBy("region", "returnflag")
    )


_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM {cust} c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""
@register(
    "sql_lateral_topk_per_customer",
    oracle=_LATERAL_SQL.format(cust="customer", orders="orders"),
    tags=("lateral", "sql", "topk"),
)
def sql_lateral_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (per-customer top-2 orders by value)
    run as the IDENTICAL SQL text in both engines — the declarative
    twin of the window-based top-k operator (operators/topk.py).
    Catalyst decorrelates the lateral limit into a ranked window join
    rather than executing one subquery per row, which is the property
    that makes the construct usable at fact scale; DuckDB plans its own
    decorrelation, so the hash match pins the construct's semantics,
    not a shared implementation. Completes the SQL-surface set next to
    WITH RECURSIVE and VARIANT."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_src")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat_src")
    return spark.sql(_LATERAL_SQL.format(cust="customer_lat_src", orders="orders_lat_src"))


_GBA_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(l_quantity * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)
         / 1000000.0 AS sum_qty
FROM {t}
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY ALL
ORDER BY ALL
"""
@register(
    "sql_group_by_all",
    oracle=_GBA_SQL.format(t="lineitem"),
    tags=("sql", "surface"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 4 and DuckDB both implement the
    DuckDB-popularized shorthand) — run as the IDENTICAL SQL text in
    both engines, like the LATERAL and recursive-CTE entries: the hash
    match pins that the shorthand resolves to the same grouping/ordering
    set. The aggregate itself is the deterministic micro-unit sum, so
    values are bit-equal, not just shape-equal."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gba_src")
    return spark.sql(_GBA_SQL.format(t="lineitem_gba_src"))


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
    ).sortWithinPartitions("doc_id")


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


_PIPE_SQL = """
FROM {t}
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
|> EXTEND CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000.0)
               AS DECIMAL(38,0)) AS revq
|> AGGREGATE CAST(count(*) AS BIGINT) AS n_rows,
             CAST(SUM(revq) AS DOUBLE) / 1000000.0 AS revenue
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""
_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000.0)
                     AS HUGEINT)) AS DOUBLE) / 1000000.0 AS revenue
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
@register(
    "sql_pipe_syntax_revenue",
    oracle=_PIPE_ORACLE,
    tags=("sql", "surface", "pipe"),
)
def sql_pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax (FROM … |> WHERE … |> EXTEND … |>
    AGGREGATE — the composable query form from the 'SQL Has Problems'
    pipe-syntax proposal): the same deterministic revenue aggregate as
    the classic form, declared as a pipeline. DuckDB has no pipe parser,
    so the oracle is the semantically identical classic SQL — the hash
    match pins that the pipe program lowers to the same plan semantics.
    Catalyst compiles pipes to the ordinary logical plan, so there is
    no runtime cost to the surface."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe_src")
    return spark.sql(_PIPE_SQL.format(t="lineitem_pipe_src"))


_SQL_HOF = """
WITH ed AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
         len(embedding) AS n
  FROM embeddings WHERE vec_id < 100
),
stats AS (
  SELECT vec_id, n, e,
         list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b) AS norm2,
         list_reduce(e, (a, b) -> a + b) AS s,
         list_aggregate(e, 'max') AS mx
  FROM ed
),
soft AS (
  SELECT vec_id, n, e, norm2, s, mx,
         list_reduce(list_transform(e, x -> round(exp(round(x - mx, 9)), 9)),
                     (a, b) -> a + b) AS expsum,
         list_reduce(list_transform(range(1, n + 1), i -> e[i] * e[n + 1 - i]),
                     (a, b) -> a + b) AS dot_rev
  FROM stats
)
SELECT vec_id,
       round(sqrt(norm2), 9) AS norm,
       round(s / n, 9) AS mean,
       CAST(list_position(e, mx) AS BIGINT) AS argmax_idx,
       mx AS max_val,
       round(1.0 / expsum, 9) AS softmax_top1,
       round(dot_rev, 9) AS dot_reversed
FROM soft ORDER BY vec_id
"""
@register(
    "array_hof_vector_stats",
    oracle=_SQL_HOF,
    tags=("functions", "hof", "embeddings"),
)
def array_hof_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local vector statistics via higher-order array functions only
    (transform / aggregate / zip_with / reverse / array_max /
    array_position): L2 norm, mean, argmax, softmax of the max logit,
    and a reversed-self dot product. Folds are sequential, so plain IEEE
    accumulation is already engine-identical (Spark's extra 0.0 fold
    seed is exact); the single libm call (exp) runs on a 9 dp-quantized
    argument. No explode, no shuffle — pure map-side width, the shape
    that scales to any corpus for per-row feature engineering."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    ed = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        F.size("embedding").alias("n"),
    )
    zero = F.lit(0.0)
    norm2 = F.aggregate(F.transform("e", lambda x: x * x), zero, lambda a, b: a + b)
    ssum = F.aggregate(F.col("e"), zero, lambda a, b: a + b)
    mx = F.array_max("e")
    stats = ed.select("vec_id", "n", "e", norm2.alias("norm2"), ssum.alias("s"), mx.alias("mx"))
    expsum = F.aggregate(
        F.transform("e", lambda x: F.round(F.exp(F.round(x - F.col("mx"), 9)), 9)),
        zero,
        lambda a, b: a + b,
    )
    dot_rev = F.aggregate(
        F.zip_with("e", F.reverse("e"), lambda x, y: x * y), zero, lambda a, b: a + b
    )
    return (
        stats.select(
            "vec_id",
            F.round(F.sqrt("norm2"), 9).alias("norm"),
            F.round(F.col("s") / F.col("n"), 9).alias("mean"),
            F.array_position("e", F.col("mx")).cast("bigint").alias("argmax_idx"),
            F.col("mx").alias("max_val"),
            F.round(1.0 / expsum, 9).alias("softmax_top1"),
            F.round(dot_rev, 9).alias("dot_reversed"),
        )
        .orderBy("vec_id")
    )


_SQL_NULLSAFE = """
WITH src AS (
  SELECT event_id, user_id,
         CASE WHEN value < 5 THEN NULL
              ELSE CAST(floor(value) AS BIGINT) % 7 END AS nk
  FROM events WHERE user_id <= 50
),
a AS (SELECT * FROM src WHERE event_id % 2 = 0),
b AS (SELECT * FROM src WHERE event_id % 2 = 1)
SELECT COALESCE(a.nk, -1) AS key_group,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT a.event_id) AS BIGINT) AS n_left
FROM a JOIN b ON a.nk IS NOT DISTINCT FROM b.nk
GROUP BY 1 ORDER BY 1
"""
@register(
    "join_null_safe",
    oracle=_SQL_NULLSAFE,
    tags=("join", "semantics", "null"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (Spark `<=>` / SQL IS NOT DISTINCT FROM):
    NULL keys MATCH each other instead of dropping out — the semantics a
    dedup-by-natural-key or SCD merge needs when business keys are
    sparsely populated. Spark's EqualNullSafe is a hash-partitionable
    join key (null hashes like any value), so the plan stays a real
    hash/SMJ join, never a filter over a cross product — asserted by the
    engine-wide no-BNLJ plan guard. The null population is bounded here
    (user filter) because null-null matches are a deliberate hot group —
    exactly the key you'd salt at scale (operators/skew.py)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") <= 50)
    nk = F.when(F.col("value") < 5, F.lit(None).cast("bigint")).otherwise(
        F.floor("value").cast("bigint") % 7
    )
    src = ev.select("event_id", nk.alias("nk"))
    a = src.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("a_id"), F.col("nk").alias("a_nk")
    )
    b = src.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("b_id"), F.col("nk").alias("b_nk")
    )
    return (
        a.join(b, F.col("a_nk").eqNullSafe(F.col("b_nk")))
        .groupBy(F.coalesce("a_nk", F.lit(-1)).alias("key_group"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("a_id").alias("n_left"),
        )
        .orderBy("key_group")
    )


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


def _scratch(sf_dir: str, tag: str) -> str:
    import hashlib

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/mda_r4_{tag}_{h}"
@register(
    "source_orc_roundtrip",
    oracle=f"""
SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n,
       {SQL_DSUM.format(x='o_totalprice')} AS revenue
FROM orders GROUP BY 1 ORDER BY 1
""",
    tags=("source", "orc", "format"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as a first-class at-rest format: write the orders projection
    to ORC (zlib, Spark's builtin vectorized writer), re-read it, and
    aggregate — the oracle checks the round trip preserved every value
    bit-for-bit by replaying the aggregate from the original parquet.
    ORC matters operationally as the interchange format with
    Hive-lineage warehouses; the same predicate pushdown / column
    pruning / partition discipline as the parquet path applies (Spark's
    OrcScan reports PushedFilters exactly like ParquetScan). Scratch
    lives under /tmp keyed by sf_dir; the write is part of the measured
    entry by design — a format claim without the sink half is only half
    a claim."""
    path = _scratch(sf_dir, "orc")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("revenue"))
        .orderBy("priority")
    )

_CSV_BAD_MOD = 97
@register(
    "source_csv_coercion",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(CASE WHEN event_id % {_CSV_BAD_MOD} = 0 THEN 1 END) AS BIGINT)
         AS n_corrupt,
       {SQL_DAVG.format(x='CASE WHEN event_id % {m} != 0 THEN value END').format(m=_CSV_BAD_MOD)}
         AS avg_value
FROM events
""".replace("{m}", str(_CSV_BAD_MOD)),
    tags=("source", "csv", "coercion", "format"),
)
def source_csv_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-CSV ingest with the reference's errors='coerce' discipline
    (analyse.py's pandas coercion, re-expressed as PERMISSIVE mode +
    explicit schema): a CSV derived from events carries 'N/A' in the
    value column for every event_id divisible by 97; the
    reader (sources.read_csv) parses with a declared schema, captures
    each unparseable row in _corrupt_record instead of failing the job,
    and nulls only the bad FIELD. Output: total rows, corrupt-row count,
    and the quantized mean of the rows that parsed — the oracle replays
    all three from the original parquet (the corruption rule is
    deterministic), proving the CSV round trip dropped and mangled
    nothing. Spark's shortest-round-trip double formatting makes the
    write→parse cycle value-exact."""
    import pyspark.sql.types as T

    from .sources import read_csv

    path = _scratch(sf_dir, "csv")
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % _CSV_BAD_MOD == 0, F.lit("N/A"))
        .otherwise(F.col("value").cast("string"))
        .alias("value"),
    )
    ev.write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = read_csv(spark, path, schema)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        davg(F.col("value")).alias("avg_value"),
    )

_JSONL_BAD_MOD = 101
@register(
    "source_jsonl_nested",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(CASE WHEN doc_id % {_JSONL_BAD_MOD} = 0 THEN 1 END) AS BIGINT)
         AS n_corrupt,
       CAST(sum(CASE WHEN doc_id % {_JSONL_BAD_MOD} != 0
                     THEN length(text) END) AS BIGINT) AS total_chars
FROM documents
""",
    tags=("source", "jsonl", "nested", "format"),
)
def source_jsonl_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSONL ingest (the training-data interchange format): each
    document is written as one JSON line with a nested payload struct
    ({{"doc_id", "payload": {{"lang", "body"}}}}), every 101st line
    truncated mid-object to simulate upstream corruption. The reader
    (sources.read_jsonl — mandatory explicit schema, no inference pass)
    lands each malformed line in _corrupt_record and shreds the nested
    field path payload.body for the good rows. The oracle replays row /
    corrupt counts and the good-row character total from the original
    parquet — the deterministic-corruption trick that makes a source
    boundary differentially testable without a second JSON engine."""
    import pyspark.sql.types as T

    from .sources import read_jsonl

    path = _scratch(sf_dir, "jsonl")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    line = F.to_json(
        F.struct(
            F.col("doc_id"),
            F.struct(F.col("lang"), F.col("text").alias("body")).alias("payload"),
        )
    )
    dirty = docs.select(
        F.when(
            F.col("doc_id") % _JSONL_BAD_MOD == 0, F.substring(line, 1, 10)
        )
        .otherwise(line)
        .alias("value")
    )
    dirty.write.mode("overwrite").text(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("lang", T.StringType()),
                        T.StructField("body", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    back = read_jsonl(spark, path, schema)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        F.sum(F.length(F.col("payload.body"))).cast("bigint").alias("total_chars"),
    )


_ASOF_TOL_US = 24 * 3600 * 1_000_000  # ±24 hours, in microseconds
def _sql_asof_nearest() -> str:
    return f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts FROM events
  WHERE event_type = 'purchase'
),
e AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
b AS (
  SELECT p.purchase_id, p.user_id, p.ts AS pts,
         e.ts AS bts, e.value AS bv
  FROM p ASOF LEFT JOIN e
    ON p.user_id = e.user_id AND e.ts <= p.ts
),
f AS (
  SELECT p.purchase_id, e.ts AS fts, e.value AS fv
  FROM p ASOF LEFT JOIN e
    ON p.user_id = e.user_id AND e.ts > p.ts
),
j AS (
  SELECT b.purchase_id, b.user_id,
         epoch_us(b.pts) - epoch_us(b.bts) AS bdt,
         epoch_us(f.fts) - epoch_us(b.pts) AS fdt,
         b.bv, f.fv
  FROM b JOIN f USING (purchase_id)
),
pick AS (
  SELECT purchase_id, user_id,
         CASE
           WHEN bdt IS NOT NULL AND bdt <= {_ASOF_TOL_US}
                AND (fdt IS NULL OR fdt > {_ASOF_TOL_US} OR bdt <= fdt)
             THEN bv
           WHEN fdt IS NOT NULL AND fdt <= {_ASOF_TOL_US} THEN fv
           ELSE NULL
         END AS view_value_nearest,
         CASE
           WHEN bdt IS NOT NULL AND bdt <= {_ASOF_TOL_US}
                AND (fdt IS NULL OR fdt > {_ASOF_TOL_US} OR bdt <= fdt)
             THEN bdt
           WHEN fdt IS NOT NULL AND fdt <= {_ASOF_TOL_US} THEN fdt
           ELSE NULL
         END AS dt_us
  FROM j
)
SELECT purchase_id, user_id, view_value_nearest,
       CAST(dt_us AS BIGINT) AS dt_us
FROM pick ORDER BY purchase_id
"""
@register(
    "join_asof_nearest",
    oracle=_sql_asof_nearest(),
    tags=("asof-join", "point-in-time", "tolerance"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join with a ±24-hour tolerance: for each
    purchase event, the same user's 'view' value closest in time in
    EITHER direction (the attribution-window feature join), ties
    preferring the backward (earlier) side — the pandas
    ``merge_asof(direction='nearest', tolerance=...)`` contract that
    ``asof_join_last_event`` (backward-only, unbounded) does not
    cover. Matches farther than the tolerance are NULL; on the fixture
    the gate both matches (~56%) and rejects, so both branches are
    value-checked.

    Implementation: TWO union-sentinel as-of passes over the same
    machinery (`operators.asof` — one shuffle each, no row explosion):
    the backward pass as-is, the forward pass on NEGATED microsecond
    timestamps (first-at-or-after = last-at-or-before under negation;
    equal-time right rows are pre-reduced with max_by(event_id), so no
    per-pass tiebreak is needed). The deltas are exact microseconds;
    the nearest pick and the tolerance gate are one CASE with identical
    text on both engines; the oracle runs DuckDB's NATIVE ASOF twice,
    so the implementations stay genuinely independent.

    Scale shape: two key-partitioned window passes + one equi-join on
    the order key — no inequality join anywhere."""
    events = _t(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("ot"),
    )
    ev = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
        .select(
            "user_id",
            F.unix_micros("ts").alias("et"),
            F.struct(F.unix_micros("ts").alias("ts_us"), F.col("value")).alias("sv"),
        )
        .localCheckpoint(eager=True)  # feeds both directional passes
    )
    back = asof_join_last(
        p, ev, "user_id", "ot", "et", "sv"
    ).withColumnRenamed("sv_asof", "bsv")
    fwd_left = back.withColumn("nt", -F.col("ot"))
    fwd_ev = ev.select(
        "user_id", (-F.col("et")).alias("net"), F.col("sv").alias("sv2")
    )
    both = asof_join_last(
        fwd_left, fwd_ev, "user_id", "nt", "net", "sv2"
    ).withColumnRenamed("sv2_asof", "fsv")
    bdt = F.col("ot") - F.col("bsv.ts_us")
    fdt = F.col("fsv.ts_us") - F.col("ot")
    back_ok = bdt.isNotNull() & (bdt <= _ASOF_TOL_US) & (
        fdt.isNull() | (fdt > _ASOF_TOL_US) | (bdt <= fdt)
    )
    fwd_ok = fdt.isNotNull() & (fdt <= _ASOF_TOL_US)
    return both.select(
        "purchase_id",
        "user_id",
        F.when(back_ok, F.col("bsv.value"))
        .when(fwd_ok, F.col("fsv.value"))
        .alias("view_value_nearest"),
        F.when(back_ok, bdt).when(fwd_ok, fdt).cast("bigint").alias("dt_us"),
    ).sortWithinPartitions("purchase_id")


_PRUNE_LO, _PRUNE_HI = "2024-01-10", "2024-01-16"
def _sql_partition_pruning() -> str:
    davg_v = SQL_DAVG.format(x="value")
    return f"""
SELECT strftime(ts, '%Y-%m-%d') AS event_day, event_type,
       CAST(count(*) AS BIGINT) AS n,
       {davg_v} AS avg_value
FROM events
WHERE strftime(ts, '%Y-%m-%d') BETWEEN '{_PRUNE_LO}' AND '{_PRUNE_HI}'
GROUP BY 1, 2 ORDER BY 1, 2
"""
def _scratch_r7(sf_dir: str, tag: str) -> str:
    import hashlib

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/mda_r7_{tag}_{h}"
@register(
    "source_partition_pruning",
    oracle=_sql_partition_pruning(),
    tags=("source", "layout", "partitioning", "scale"),
)
def source_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned at-rest layout, end to end: write the events
    projection PARTITIONED BY day (``partitionBy`` → one directory per
    day), re-read, and aggregate a one-week slice — the layout decision
    that turns a 100 TB scan into a 23 TB-skipped one: the day filter
    prunes at PLANNING time (``PartitionFilters`` on the scan — whole
    directories never open, vs ``stats_zone_map_pruning``'s row-group
    min/max skipping which still lists every file). The write half is
    part of the entry by design, like ``source_orc_roundtrip``: a
    layout claim without the sink is half a claim. The plan property is
    pinned by ``test_partition_pruning_reaches_scan``.

    Exactness: the oracle replays the same day-string derivation and
    filter from the original parquet; counts are exact BIGINTs, the
    mean is the catalog's micro-quantized davg.

    Scale shape: the write shuffles once on the partition column (a
    day-grain repartition keeps one file per day instead of
    tasks×days small files); the read scans ONLY the 7 matching
    directories; the aggregate is map-side combined on the pruned
    slice."""
    path = _scratch_r7(sf_dir, "part")
    ev = _t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("event_day"),
        "event_type",
        "value",
    )
    # one file per partition directory, not tasks × days
    ev.repartition("event_day").write.mode("overwrite").partitionBy(
        "event_day"
    ).parquet(path)
    back = spark.read.parquet(path)
    # partition-column type inference reads event_day back as DATE; the
    # filter stays on the raw partition column (so it prunes at planning
    # time), and only the OUTPUT re-derives the string form
    return (
        back.where(
            F.col("event_day").between(
                F.lit(_PRUNE_LO).cast("date"), F.lit(_PRUNE_HI).cast("date")
            )
        )
        .groupBy(F.date_format("event_day", "yyyy-MM-dd").alias("event_day"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            davg("value").alias("avg_value"),
        )
        .orderBy("event_day", "event_type")
    )

def _sql_schema_evolution() -> str:
    davg_v = SQL_DAVG.format(x="value")
    return f"""
WITH unioned AS (
  SELECT event_type, value, NULL AS value_eur
  FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT event_type, value, round(value * 0.92, 6) AS value_eur
  FROM events WHERE event_id % 2 = 1
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(value_eur) AS BIGINT) AS n_with_eur,
       {davg_v} AS avg_value,
       {SQL_DAVG.format(x='value_eur')} AS avg_value_eur
FROM unioned GROUP BY 1 ORDER BY 1
"""
@register(
    "source_schema_evolution",
    oracle=_sql_schema_evolution(),
    tags=("source", "schema-evolution", "format"),
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the storage layer, end to end: two parquet
    batches with DIFFERENT schemas — the 'old' batch (even event ids)
    lacks the value_eur column a later pipeline version added to the
    'new' batch (odd ids) — land in one dataset directory and are read
    back with ``mergeSchema=true``, which unions the schemas and
    null-fills the missing column. This is the ingest reality every
    long-lived table faces (producers upgrade mid-stream); the
    aggregate pins that old rows read NULL (count skips them) and new
    rows carry the derived value exactly. Spark's default
    (first-footer schema) would silently DROP the new column when an
    old file is listed first — mergeSchema is the correctness flag,
    paid once at footer-merge planning time.

    Exactness: the oracle replays the union semantics relationally;
    counts are exact BIGINTs; means are the catalog's micro-quantized
    davg (NULL-skipping on both engines).

    Scale shape: write once per batch (day-grain repartition as in
    source_partition_pruning); the merged read prunes/pushes exactly
    like any parquet scan; the aggregate is map-side combined."""
    path = _scratch_r7(sf_dir, "evolve")
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    old = ev.where(F.col("event_id") % 2 == 0).select("event_type", "value")
    new = ev.where(F.col("event_id") % 2 == 1).select(
        "event_type",
        "value",
        F.round(F.col("value") * 0.92, 6).alias("value_eur"),
    )
    old.coalesce(4).write.mode("overwrite").parquet(f"{path}/batch=old")
    new.coalesce(4).write.mode("overwrite").parquet(f"{path}/batch=new")
    back = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/batch=old", f"{path}/batch=new"
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count("value_eur").cast("bigint").alias("n_with_eur"),
            davg("value").alias("avg_value"),
            davg("value_eur").alias("avg_value_eur"),
        )
        .orderBy("event_type")
    )


@register(
    "join_asof_forward",
    oracle="""
WITH e AS (
  SELECT user_id, ts, arg_min(value, event_id) AS value,
         -epoch_us(ts) AS nts
  FROM events GROUP BY user_id, ts
),
o AS (
  SELECT o_orderkey, o_custkey, -epoch_us(o_orderdate) AS nod FROM orders
)
SELECT o.o_orderkey AS o_orderkey, o.o_custkey AS user_id,
       e.value AS value_asof_next
FROM o ASOF LEFT JOIN e ON o.o_custkey = e.user_id AND e.nts <= o.nod
ORDER BY o_orderkey
""",
    tags=("asof-join", "point-in-time", "forward"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each order, the value of that user's
    EARLIEST event at or after the order date — the 'next observation
    after the decision' lookup (label attribution, treatment-response,
    next-touch) that mirrors ``asof_join_last_event``'s point-in-time
    feature lookup. Spark runs the union-sentinel merge flipped to a
    [current, following) frame (operators.asof.asof_join_next — one
    shuffle, no row explosion); the oracle runs DuckDB's NATIVE ASOF
    JOIN on NEGATED epoch timestamps (DuckDB's ASOF is backward-only;
    time negation turns 'earliest at-or-after' into 'latest at-or-
    before'), so the two implementations stay genuinely independent.
    Equal-time right rows pre-reduce with arg_min on event_id (the
    forward mirror of the backward entry's arg_max)."""
    from .operators.asof import asof_join_next

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("user_id"), "o_orderdate"
    )
    events = _t(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    return (
        asof_join_next(
            orders, events, "user_id", "o_orderdate", "ts", "value", right_seq="event_id"
        )
        .select("o_orderkey", "user_id", F.col("value_asof_next"))
        .sortWithinPartitions("o_orderkey")
    )

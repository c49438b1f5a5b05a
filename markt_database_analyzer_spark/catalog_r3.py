"""Round-3 operator tranche: URL-canonical dedup, watermarked streaming
dedup, length-bucketed sequence packing, weighted reservoir sampling,
entropy quality signals, the Python DataSource ingest edge, and
hypertable-style gap-fill interpolation.

Every entry follows the catalog contract: a PySpark program plus a
DuckDB oracle that replays the identical semantics (same hashes, same
rounding grid), hash-compared at sf0.01 by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DAVG, SQL_DSUM, register, _t
from .datapipe import sampling as smp
from .datapipe import text as tx
from .functions import davg, dsum


# --------------------------------------------------------------------------
# URL canonicalization dedup — collapse scheme/www/tracking-param/fragment
# crawl variants to one canonical key BEFORE content dedup runs. The
# testdata carries no URL column, so the entry derives a deterministic
# messy URL per document from (source, doc_id) — both engines construct
# the identical fixture, then exercise the identical canonicalizer.
# --------------------------------------------------------------------------

def _messy_url_spark() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 2 == 0, F.lit("https://")).otherwise(F.lit("http://")),
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".Example.ORG"),
        F.when(d % 11 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/d/"),
        (d % 20).cast("string"),
        F.when(d % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(F.lit("?utm_campaign=x&gclid="), d.cast("string"))).otherwise(F.lit("")),
        F.when(d % 6 == 0, F.concat(F.lit("#s"), (d % 3).cast("string"))).otherwise(F.lit("")),
    )


_MESSY_URL_SQL = """(
  CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END
  || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
  || source || '.Example.ORG'
  || CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END
  || '/d/' || CAST(doc_id % 20 AS VARCHAR)
  || CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END
  || CASE WHEN doc_id % 5 = 0 THEN '?utm_campaign=x&gclid=' || CAST(doc_id AS VARCHAR) ELSE '' END
  || CASE WHEN doc_id % 6 = 0 THEN '#s' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END
)"""


@register(
    "dedup_url_canonical",
    oracle=f"""
WITH urls AS (
  SELECT doc_id, {tx.sql_canonical_url(_MESSY_URL_SQL)} AS canon
  FROM documents
)
SELECT canon, count(*) AS n_variants, min(doc_id) AS survivor
FROM urls GROUP BY canon ORDER BY canon
""",
    tags=("dedup", "url", "text"),
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonical dedup (the CommonCrawl-style pre-content pass):
    canonicalize scheme/www/port/tracking-params/fragment/trailing-slash
    variants (datapipe.text.canonical_url — pure row-local regex in the
    Java∩RE2 subset) and keep the lowest doc_id per canonical key.
    Map-only until the group-by on the canonical string; at 100 TB the
    shuffle key is the canonical URL (bounded bytes/row), never the
    document body, and the same hash-groupBy scales as exact dedup
    (datapipe/dedup.py:66 pattern)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", tx.canonical_url(_messy_url_spark()).alias("canon"))
        .groupBy("canon")
        .agg(F.count(F.lit(1)).alias("n_variants"), F.min("doc_id").alias("survivor"))
        .orderBy("canon")
    )


# --------------------------------------------------------------------------
# Streaming dedup with bounded state (dropDuplicatesWithinWatermark)
# --------------------------------------------------------------------------

@register(
    "streaming_dedup_within_watermark",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
""",
    tags=("streaming", "dedup", "state", "watermark"),
)
def streaming_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production form of streaming dedup for UNBOUNDED key domains:
    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    event-time watermark passes it, so state is bounded by (key arrival
    rate x watermark delay), not the lifetime key count —
    ``streaming_dedup_distinct_pairs`` (plain dropDuplicates) by contrast
    grows state forever. The 30-day delay covers the fixture's full span,
    so the emitted set equals batch DISTINCT and the entry stays in the
    hash-differential gate; in production the delay is the dedup horizon
    SLA. Cites the reference's append-only monitor-log model
    (analyse.py:63-65) — ingestion-time dedup of re-scraped rows."""
    from .streaming import read_events_stream, run_stream_to_memory

    stream = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "30 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return run_stream_to_memory(stream, output_mode="append").orderBy(
        "user_id", "event_type"
    )


# --------------------------------------------------------------------------
# Length-bucketed sequence packing (pad-efficient batching)
# --------------------------------------------------------------------------

_BUCKET_BOUNDS = (16, 32, 64, 128, 256, 512)
_CAPACITY = 512


def _bucket_spark(n: F.Column) -> F.Column:
    expr = F.lit(_CAPACITY)
    for b in reversed(_BUCKET_BOUNDS[:-1]):
        expr = F.when(n <= b, F.lit(b)).otherwise(expr)
    return expr


def _bucket_sql(n: str) -> str:
    case = "CASE "
    for b in _BUCKET_BOUNDS[:-1]:
        case += f"WHEN {n} <= {b} THEN {b} "
    return case + f"ELSE {_CAPACITY} END"


@register(
    "pack_sequences_bucketed",
    oracle=f"""
WITH sized AS (
  SELECT doc_id,
         least(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               t -> t != '')), {_CAPACITY}) AS n_tokens
  FROM documents
),
bucketed AS (
  SELECT doc_id, n_tokens, {_bucket_sql('n_tokens')} AS bucket FROM sized
),
placed AS (
  SELECT doc_id, n_tokens, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1 AS rn
  FROM bucketed
)
SELECT doc_id, n_tokens, bucket,
       CAST(rn // ({_CAPACITY} // bucket) AS BIGINT) AS seq_id,
       CAST(rn % ({_CAPACITY} // bucket) AS BIGINT) AS slot
FROM placed
ORDER BY bucket, seq_id, slot
""",
    tags=("packing", "pipeline", "window"),
)
def pack_sequences_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed sequence packing — the pad-efficiency batching
    used by T5/fairseq-style training loaders: round each document's
    (capped) token count up to a power-of-two bucket, then pack
    ``capacity / bucket`` same-bucket documents per output sequence.
    Unlike greedy running-sum packing (pack_chunks_documents), bucket
    membership is row-local and the within-bucket placement is a plain
    rank — so the only shuffle is on the 6-value bucket key. At 100 TB
    the row_number per bucket becomes per-(bucket, shard) with a shard
    offset (exactly the pack_chunks shard pattern) — the docstring
    contract is the (bucket, seq, slot) assignment, which is
    shard-composable."""
    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.least(tx.token_count_whitespace("text"), F.lit(_CAPACITY)).cast("int").alias("n_tokens"),
    )
    bucketed = sized.withColumn("bucket", _bucket_spark(F.col("n_tokens")))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    # integer division throughout (capacity is a multiple of every
    # bucket) — double division would hit Spark-truncates vs
    # DuckDB-rounds cast divergence
    per_seq = (F.lit(_CAPACITY) / F.col("bucket")).cast("int")
    return (
        bucketed.withColumn("rn", F.row_number().over(w) - 1)
        .select(
            "doc_id",
            "n_tokens",
            "bucket",
            F.floor(F.col("rn") / per_seq).cast("bigint").alias("seq_id"),
            (F.col("rn") % per_seq).cast("bigint").alias("slot"),
        )
        .orderBy("bucket", "seq_id", "slot")
    )


# --------------------------------------------------------------------------
# Weighted reservoir sampling (Efraimidis-Spirakis A-ES), deterministic
# --------------------------------------------------------------------------

@register(
    "sample_weighted_reservoir",
    oracle=f"""
WITH keyed AS (
  SELECT lang, doc_id, n_chars,
         round(-ln(({smp.sql_gate('doc_id', seed=11)} + 1) / {smp.RESOLUTION + 1}.0), 9)
           / n_chars AS es_key
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, n_chars, es_key,
         row_number() OVER (PARTITION BY lang ORDER BY es_key, doc_id) AS pos
  FROM keyed
)
SELECT lang, doc_id, n_chars, pos FROM ranked WHERE pos <= 5
ORDER BY lang, pos
""",
    tags=("sampling", "weighted", "pipeline"),
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted k-per-group sampling via the Efraimidis-Spirakis
    exponential-key construction: key = -ln(u)/w with u a deterministic
    md5-derived uniform and w = n_chars; the k SMALLEST keys per language
    are a weighted-without-replacement sample (longer documents
    proportionally likelier). RNG-free — identical on any engine or
    partitioning — and one shuffle on the group key. The unweighted twin
    is sample_k_per_group; ln rounds at 9 dp (cross-libm parity), the
    division by the integer weight is then exact double arithmetic.
    At 100 TB: same map-only key computation; the per-group top-k
    replaces the window with a min_by(k) map-side combine."""
    docs = _t(spark, sf_dir, "documents")
    u = (smp._gate("doc_id", seed=11) + 1).cast("double") / F.lit(float(smp.RESOLUTION + 1))
    key = F.round(-F.log(u), 9) / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 5)
        .select("lang", "doc_id", "n_chars", "pos")
        .orderBy("lang", "pos")
    )


# --------------------------------------------------------------------------
# Shannon-entropy quality signals
# --------------------------------------------------------------------------

@register(
    "text_entropy_quality",
    oracle=f"""
SELECT doc_id,
       {tx.sql_entropy(tx.sql_char_items('text'))} AS char_entropy,
       {tx.sql_entropy(tx.sql_tokens('text'))} AS word_entropy,
       ({tx.sql_entropy(tx.sql_char_items('text'))} < 3.0) AS low_char_entropy
FROM documents
ORDER BY doc_id
""",
    tags=("text", "quality", "entropy"),
)
def text_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy quality signals: character-level entropy (low =
    repeated-character spam) and word-level entropy (low = boilerplate /
    keyword stuffing) — standard corpus-quality heuristics next to the
    Gopher rules. Entirely row-local array math, O(len x alphabet) per
    document; each p*log2(p) term rounds at 9 dp before the sum so both
    engines hit the identical grid. No shuffle at all until the output
    sort (which exists only for the differential contract)."""
    docs = _t(spark, sf_dir, "documents")
    ch = tx._entropy(tx.char_items("text"))
    wd = tx._entropy(tx.tokens("text"))
    return docs.select(
        "doc_id",
        ch.alias("char_entropy"),
        wd.alias("word_entropy"),
        (ch < 3.0).alias("low_char_entropy"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Python DataSource API ingest edge (Spark 4 custom source)
# --------------------------------------------------------------------------

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


# --------------------------------------------------------------------------
# Hypertable-style gap-fill with linear interpolation
# --------------------------------------------------------------------------

@register(
    "gapfill_interpolate_hourly",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
         {SQL_DAVG.format(x='value')} AS avg_value
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
bounds AS (
  SELECT event_type, min(hour_ts) AS lo, max(hour_ts) AS hi
  FROM hourly GROUP BY event_type
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_ts
  FROM bounds
),
joined AS (
  SELECT s.event_type, s.hour_ts, h.avg_value,
         CAST(epoch(s.hour_ts) / 3600 AS BIGINT) AS hl
  FROM spine s LEFT JOIN hourly h USING (event_type, hour_ts)
),
ctx AS (
  SELECT event_type, hour_ts, avg_value,
         last_value(avg_value IGNORE NULLS) OVER w_prev AS pv,
         last_value(CASE WHEN avg_value IS NOT NULL THEN hl END IGNORE NULLS) OVER w_prev AS pt,
         first_value(avg_value IGNORE NULLS) OVER w_next AS nv,
         first_value(CASE WHEN avg_value IS NOT NULL THEN hl END IGNORE NULLS) OVER w_next AS nt,
         hl
  FROM joined
  WINDOW
    w_prev AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY event_type ORDER BY hour_ts
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, hour_ts, avg_value,
       CASE
         WHEN avg_value IS NOT NULL THEN avg_value
         WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
           round(pv + (nv - pv) * (hl - pt) / (nt - pt), 9)
       END AS interp_value
FROM ctx
ORDER BY event_type, hour_ts
""",
    tags=("timeseries", "gapfill", "window", "spine"),
)
def gapfill_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-fill: per event type, an hourly spine from
    that key's own [min, max] hour (generated, never cross-joined — no
    nested-loop shape), left-joined hourly deterministic means, and
    LINEAR INTERPOLATION across missing hours from the nearest known
    neighbors on each side (ignoreNulls window walk; boundary gaps stay
    null, matching the published time_bucket_gapfill + interpolate
    semantics). Per-key state is two window passes over the key's own
    spine — at 100 TB each key's spine is bounded by its time span, and
    the only shuffle is the (event_type, hour) aggregation."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour_ts"))
        .agg(davg(F.col("value")).alias("avg_value"))
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_ts").alias("lo"), F.max("hour_ts").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour_ts"),
        )
    )
    joined = spine.join(hourly, ["event_type", "hour_ts"], "left").withColumn(
        "hl", (F.col("hour_ts").cast("long") / 3600).cast("bigint")
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_h = F.when(F.col("avg_value").isNotNull(), F.col("hl"))
    ctx = (
        joined.withColumn("pv", F.last("avg_value", ignorenulls=True).over(w_prev))
        .withColumn("pt", F.last(known_h, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("avg_value", ignorenulls=True).over(w_next))
        .withColumn("nt", F.first(known_h, ignorenulls=True).over(w_next))
    )
    interp = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.round(
                F.col("pv")
                + (F.col("nv") - F.col("pv"))
                * (F.col("hl") - F.col("pt"))
                / (F.col("nt") - F.col("pt")),
                9,
            ),
        )
    )
    return ctx.select(
        "event_type", "hour_ts", "avg_value", interp.alias("interp_value")
    ).orderBy("event_type", "hour_ts")

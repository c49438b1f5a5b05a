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
from pyspark.storagelevel import StorageLevel

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
SELECT d.doc_id,
       coalesce(ch.char_entropy, 0.0) AS char_entropy,
       coalesce(wd.word_entropy, 0.0) AS word_entropy,
       (coalesce(ch.char_entropy, 0.0) < 3.0) AS low_char_entropy
FROM documents d
LEFT JOIN {tx.sql_entropy_cte('documents', 'doc_id', tx.sql_char_items('text'), 'char_entropy')} ch
  ON d.doc_id = ch.id
LEFT JOIN {tx.sql_entropy_cte('documents', 'doc_id', tx.sql_tokens('text'), 'word_entropy')} wd
  ON d.doc_id = wd.id
ORDER BY d.doc_id
""",
    tags=("text", "quality", "entropy"),
)
def text_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy quality signals: character-level entropy (low =
    repeated-character spam) and word-level entropy (low = boilerplate /
    keyword stuffing) — standard corpus-quality heuristics next to the
    Gopher rules. Computed via the SCALABLE explode→count→exact-integer-
    term-sum path (datapipe.text.entropy_frame): everything is codegen'd
    aggregation on (doc, symbol) keys, and the nano-quantized term sum
    is order-insensitive, so the result is engine-exact under any
    partitioning. (The row-local higher-order-function variant is
    interpreted per element — measured ~60 s over sf0.1 vs ~2 s for
    this plan — and stays confined to unit fixtures.) Empty docs keep a
    row via the left-joined doc spine with entropy 0."""
    docs = _t(spark, sf_dir, "documents")
    ch = tx.entropy_frame(docs, "doc_id", tx.char_items("text"), "char_entropy")
    wd = tx.entropy_frame(docs, "doc_id", tx.tokens("text"), "word_entropy")
    return (
        docs.select("doc_id")
        .join(ch, "doc_id", "left")
        .join(wd, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("char_entropy", F.lit(0.0)).alias("char_entropy"),
            F.coalesce("word_entropy", F.lit(0.0)).alias("word_entropy"),
            (F.coalesce("char_entropy", F.lit(0.0)) < 3.0).alias("low_char_entropy"),
        )
        .orderBy("doc_id")
    )


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


# --------------------------------------------------------------------------
# CDC snapshot diff (SCD/changelog extraction via full outer join)
# --------------------------------------------------------------------------

@register(
    "cdc_snapshot_diff",
    oracle="""
WITH snap_a AS (
  SELECT o_orderkey, o_totalprice AS price
  FROM orders WHERE o_orderkey % 10 != 3
),
snap_b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 10 != 0
)
SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.o_orderkey IS NULL THEN 'I'
            WHEN b.o_orderkey IS NULL THEN 'D'
            ELSE 'U' END AS op,
       a.price AS old_price, b.price AS new_price
FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR a.price != b.price
ORDER BY o_orderkey
""",
    tags=("cdc", "join", "changelog"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog extraction between two keyed snapshots — the
    engine-side form of SCD/merge pipelines: FULL OUTER join on the key,
    classify INSERT (new side only) / DELETE (old side only) / UPDATE
    (both, payload differs), drop unchanged rows. Snapshots are derived
    deterministically from orders (old drops %10==3 keys, new drops
    %10==0 and bumps %7 prices) so both engines replay the same fixture.
    At 100 TB: one co-partitioned shuffle on the key (bucketed snapshots
    make it exchange-free — sources/sinks.py write_bucketed), and the
    changelog is the only output that moves downstream."""
    orders = _t(spark, sf_dir, "orders")
    snap_a = (
        orders.filter(F.col("o_orderkey") % 10 != 3)
        .select("o_orderkey", F.col("o_totalprice").alias("price"))
    )
    snap_b = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        # +100.0 is exact in binary64 (a 2-dp rounding of a product
        # would hit Spark's decimal-string HALF_UP vs DuckDB's binary
        # rounding divergence)
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 100.0)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    a = snap_a.alias("a")
    b = snap_b.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    return (
        joined.select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
            F.when(F.col("a.o_orderkey").isNull(), F.lit("I"))
            .when(F.col("b.o_orderkey").isNull(), F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("a.price").alias("old_price"),
            F.col("b.price").alias("new_price"),
        )
        .filter(
            F.col("old_price").isNull()
            | F.col("new_price").isNull()
            | (F.col("old_price") != F.col("new_price"))
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Set-similarity join with prefix filtering (AllPairs/PPJoin family)
# --------------------------------------------------------------------------

_JACCARD_T = 0.9  # similarity threshold (rational 9/10 — integer math)


@register(
    "join_set_similarity_prefix",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, list_distinct({tx.sql_tokens('text')}) AS ts
  FROM documents WHERE doc_id % 5 = 0
),
dfx AS (
  SELECT tok, count(*) AS df FROM (SELECT doc_id, unnest(ts) AS tok FROM toks)
  GROUP BY tok
),
exploded AS (
  SELECT doc_id, unnest(ts) AS tok FROM toks
),
ordered AS (
  SELECT e.doc_id, list(e.tok ORDER BY d.df, e.tok) AS ts
  FROM exploded e JOIN dfx d ON e.tok = d.tok
  GROUP BY e.doc_id
),
prefixed AS (
  SELECT doc_id, ts, len(ts) AS n,
         list_slice(ts, 1, len(ts) - ((9 * len(ts) + 9) // 10) + 1) AS prefix
  FROM ordered
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM (SELECT doc_id, unnest(prefix) AS tok FROM prefixed) a
  JOIN (SELECT doc_id, unnest(prefix) AS tok FROM prefixed) b
    ON a.tok = b.tok AND a.doc_id < b.doc_id
),
verified AS (
  SELECT id_a, id_b,
         len(list_intersect(ta.ts, tb.ts)) AS inter,
         ta.n + tb.n - len(list_intersect(ta.ts, tb.ts)) AS uni
  FROM cand
  JOIN prefixed ta ON id_a = ta.doc_id
  JOIN prefixed tb ON id_b = tb.doc_id
)
SELECT id_a, id_b, round(CAST(inter AS DOUBLE) / uni, 9) AS jaccard
FROM verified
WHERE inter * 10 >= 9 * uni
ORDER BY id_a, id_b
""",
    tags=("similarity", "join", "dedup", "prefix-filter"),
)
def join_set_similarity_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join (token-set Jaccard >= 0.9) with the
    AllPairs/PPJoin prefix filter: order each document's distinct tokens
    by GLOBAL document frequency (rarest first — the order that makes
    prefixes selective), keep only the first n - ceil(t*n) + 1 tokens,
    and candidate pairs must share a PREFIX token (theorem: any pair
    above threshold must). The candidate join shuffles (token, doc_id)
    pairs of rare tokens only; the exact Jaccard verify runs on the
    candidate set alone, and the threshold compare is integer
    (inter*10 >= 6*uni) — no float boundary. The prefix-length ceil is
    integer-exact ((6n+9)//10) on both engines. This is the exact
    counterpart of the probabilistic MinHash entry: same output
    contract, no recall loss, for thresholds where prefixes stay
    selective."""
    # 1/5 deterministic sample: the synthetic corpus is pathologically
    # self-similar (tiny shared vocabulary), which defeats ANY candidate
    # filter — at full sf0.1 the >=0.9 pair set alone is ~1M pairs. The
    # operator contract is the filtered-join algebra; the sample bounds
    # the quadratic verify on this corpus (dedup_ngram_jaccard_sample
    # precedent). On realistic corpora the filter, not a sample, is
    # what bounds candidates.
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    toks = docs.select("doc_id", F.array_distinct(tx.tokens("text")).alias("ts"))
    dfx = (
        toks.select(F.explode("ts").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # order tokens rarest-first: join each token to its df, sort by
    # (df, token) via struct sort, project the token back out
    exploded = toks.select("doc_id", F.explode("ts").alias("tok")).join(
        F.broadcast(dfx), "tok"
    )
    ordered = exploded.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("df").alias("d"), F.col("tok").alias("t")))),
            lambda s: s["t"],
        ).alias("ts")
    )
    n = F.size("ts")
    prefix_len = n - ((F.lit(9) * n + 9).cast("long") / 10).cast("int") + 1
    # Persisted: both candidate-join sides and nothing else consume this
    # frame; without persist the df-join + sort-agg subtree runs twice
    # (the shingle-projection precedent at catalog_ext.py:116). Constant
    # bytes/doc (ids + bounded token arrays), MEMORY_AND_DISK spills.
    prefixed = ordered.select(
        "doc_id", "ts", n.alias("n"), F.slice("ts", 1, prefix_len).alias("prefix")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # Cost discipline, measured at sf0.1 (1k docs / 31-token vocab / 141k
    # candidate pairs / ~1M raw prefix collisions):
    #  - the candidate join must carry IDS ONLY. Shipping the token
    #    arrays through it shuffles ~500 MB of duplicate matches (every
    #    pair collides on up to prefix_len^2 tokens) — 5.5s.
    #  - the Jaccard compare must not sit where Catalyst can sink it
    #    into the candidate join condition: there array_intersect is
    #    re-evaluated per collision probe, interpreted — 45s.
    #  - the verify arrays come from `toks`, NOT `prefixed`: the
    #    df-rarest-first ORDERING only matters for prefix selection, and
    #    re-deriving plain token sets is one pruned scan (no df join, no
    #    sort agg), broadcast (<= corpus-distinct sets) onto the 141k
    #    deduped pairs — intersect runs once per pair, in codegen.
    pa = prefixed.select(
        F.col("doc_id").alias("id_a"), F.col("n").alias("na"),
        F.explode("prefix").alias("tok"),
    )
    pb = prefixed.select(
        F.col("doc_id").alias("id_b"), F.col("n").alias("nb"),
        F.explode("prefix").alias("tok"),
    )
    # PPJoin length filter, applied INSIDE the candidate join: J >= 0.9
    # implies 9*max(|a|,|b|) <= 10*min(|a|,|b|), so size-mismatched pairs
    # are pruned before the dedup/verify. Lossless for the >= t output
    # set (J <= min/max), hence the oracle is unchanged.
    cand = (
        pa.join(
            pb,
            (pa["tok"] == pb["tok"])
            & (pa["id_a"] < pb["id_b"])
            & (pa["na"] * 10 >= pb["nb"] * 9)
            & (pb["nb"] * 10 >= pa["na"] * 9),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ta = toks.select(F.col("doc_id").alias("id_a"), F.col("ts").alias("ts_a"))
    tb = toks.select(F.col("doc_id").alias("id_b"), F.col("ts").alias("ts_b"))
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    uni = F.size("ts_a") + F.size("ts_b") - inter
    return (
        cand.join(F.broadcast(ta), "id_a")
        .join(F.broadcast(tb), "id_b")
        .select(
            "id_a",
            "id_b",
            inter.alias("inter"),
            uni.alias("uni"),
        )
        .filter(F.col("inter") * 10 >= F.lit(9) * F.col("uni"))
        .select(
            "id_a",
            "id_b",
            F.round(F.col("inter").cast("double") / F.col("uni"), 9).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# Per-key OLS regression (closed-form, two-pass centered sums)
# --------------------------------------------------------------------------

@register(
    "regression_by_key",
    oracle=f"""
WITH pts AS (
  SELECT event_type, epoch(ts) / 3600.0 AS x, value AS y FROM events
),
means AS (
  SELECT event_type,
         {SQL_DAVG.format(x='x')} AS xbar,
         {SQL_DAVG.format(x='y')} AS ybar,
         count(*) AS n
  FROM pts GROUP BY event_type
),
centered AS (
  SELECT p.event_type,
         {SQL_DSUM.format(x='(p.x - m.xbar) * (p.y - m.ybar)')} AS sxy,
         {SQL_DSUM.format(x='(p.x - m.xbar) * (p.x - m.xbar)')} AS sxx,
         min(m.xbar) AS xbar, min(m.ybar) AS ybar, min(m.n) AS n
  FROM pts p JOIN means m USING (event_type)
  GROUP BY p.event_type
)
SELECT event_type, n,
       round(sxy / sxx, 9) AS slope,
       round(ybar - (sxy / sxx) * xbar, 6) AS intercept
FROM centered
ORDER BY event_type
""",
    tags=("regression", "aggregate", "analytics"),
)
def regression_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (value vs time) via the
    closed-form centered sums — the general form of the reference's
    two-point slope (analyse.py:263-270): slope = Σ(dx·dy)/Σ(dx²) with
    dx, dy centered on per-group means. Two passes: a tiny per-key mean
    aggregate broadcast back into the fact scan, then one hash agg of
    quantized products — no window, no sort, O(1) state per group, which
    is why this scales where per-group curve fitting loops cannot.
    Centering keeps products small (hours-from-mean, not epoch-hours),
    so the 1e-6 quantization grid carries the full signal."""
    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        (F.col("ts").cast("double") / 3600.0).alias("x"),
        F.col("value").alias("y"),
    )
    means = pts.groupBy("event_type").agg(
        davg(F.col("x")).alias("xbar"),
        davg(F.col("y")).alias("ybar"),
        F.count(F.lit(1)).alias("n"),
    )
    dx = F.col("x") - F.col("xbar")
    dy = F.col("y") - F.col("ybar")
    centered = (
        pts.join(F.broadcast(means), "event_type")
        .groupBy("event_type")
        .agg(
            dsum(dx * dy).alias("sxy"),
            dsum(dx * dx).alias("sxx"),
            F.min("xbar").alias("xbar"),
            F.min("ybar").alias("ybar"),
            F.min("n").alias("n"),
        )
    )
    slope = F.col("sxy") / F.col("sxx")
    return centered.select(
        "event_type",
        "n",
        F.round(slope, 9).alias("slope"),
        F.round(F.col("ybar") - slope * F.col("xbar"), 6).alias("intercept"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Ordered funnel analysis (staged conditional minima)
# --------------------------------------------------------------------------

@register(
    "events_funnel_stages",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
       (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_view_click,
       (SELECT count(*) FROM p) AS n_view_click_purchase,
       round((SELECT count(*) FROM p) * 1.0
             / (SELECT count(*) FROM v), 9) AS full_funnel_rate
""",
    tags=("funnel", "analytics", "join"),
)
def events_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase, strictly increasing
    event time): each stage is a conditional-min aggregate over users who
    completed the previous stage, joined back — three key-partitioned
    aggs over progressively SHRINKING user sets, never a per-user sort
    or session reconstruction. The stage frames are user_id keyed
    (broadcastable until the final counts); at 100 TB each stage's
    filter pushes its event_type to the scan, so stage k reads only its
    own event partition if the table is type-partitioned."""
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n_users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    counts = (
        n_users.crossJoin(F.broadcast(v.agg(F.count(F.lit(1)).alias("n_view"))))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_view_click"))))
        .crossJoin(
            F.broadcast(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
        )
    )
    return counts.select(
        "n_users",
        "n_view",
        "n_view_click",
        "n_view_click_purchase",
        F.round(
            F.col("n_view_click_purchase") * F.lit(1.0) / F.col("n_view"), 9
        ).alias("full_funnel_rate"),
    )


# --------------------------------------------------------------------------
# Cohort retention matrix
# --------------------------------------------------------------------------

@register(
    "events_cohort_retention",
    oracle="""
WITH firsts AS (
  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         CAST(date_diff('day', f.cohort_day, date_trunc('day', e.ts)) // 7 AS BIGINT)
           AS week_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day, week_offset, count(*) AS n_users
FROM activity
GROUP BY cohort_day, week_offset
ORDER BY cohort_day, week_offset
""",
    tags=("cohort", "analytics", "window"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    once per (cohort, weeks-since-cohort) cell. The first-seen frame is
    one min-aggregate on user_id (broadcast back into the fact); the
    distinct-per-cell dedup shuffles (user, cohort, week) triples only.
    The classic product-analytics query, expressed so the heavy table is
    touched exactly twice with no window over the raw events."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(
                F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")) / 7
            ).alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "week_offset")
    )


# --------------------------------------------------------------------------
# Equi-depth histogram (ntile)
# --------------------------------------------------------------------------

@register(
    "histogram_equi_depth",
    oracle="""
WITH tiled AS (
  SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bucket
  FROM events
)
SELECT bucket, count(*) AS n, min(value) AS lo, max(value) AS hi
FROM tiled GROUP BY bucket ORDER BY bucket
""",
    tags=("histogram", "window", "analytics"),
)
def histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-count) histogram via ntile over a total order —
    the value-distribution summary whose bucket POPULATIONS are equal
    and bucket WIDTHS carry the density signal (complement of the
    fixed-width B1/B2 binning family). The tiebreak on event_id makes
    the tiling deterministic. ntile's single total order is the fixture
    form; the scale path is the round-4 twin
    ``histogram_equi_depth_cuts`` (operators/equidepth.py exact
    percentile cuts as broadcast literals + map-only assignment)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.orderBy("value", "event_id")
    return (
        ev.select("value", F.ntile(10).over(w).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# Table profiling (per-column stats in one pass)
# --------------------------------------------------------------------------

_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "profile_table_stats",
    oracle=f"""
WITH agg AS (
  SELECT count(*) AS n_rows,
  {", ".join(
      f"count({c}) AS nn_{c}, count(DISTINCT {c}) AS nd_{c}, "
      f"min({c}) AS mn_{c}, max({c}) AS mx_{c}" for c in _PROFILE_COLS
  )}
  FROM lineitem
)
{" UNION ALL ".join(
    f"SELECT '{c}' AS col_name, n_rows, n_rows - nn_{c} AS n_nulls, "
    f"nd_{c} AS n_distinct, mn_{c} AS min_value, mx_{c} AS max_value FROM agg"
    for c in _PROFILE_COLS
)}
ORDER BY col_name
""",
    tags=("profiling", "aggregate", "analytics"),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiling (the engine-side `df.describe`):
    count/nulls/distinct/min/max for every numeric lineitem column in a
    SINGLE aggregate over one scan, then an explode of the 1-row result
    into one row per column. The multi-column countDistinct expands the
    agg (Spark's Expand operator) but still reads the table once — the
    difference between profiling in one job and one job per column. At
    100 TB the exact distinct counts swap for approx_count_distinct
    (approx_distinct_parts pattern) without changing the output
    contract."""
    li = _t(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    one = li.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}")).alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_value"),
                F.col(f"mx_{c}").alias("max_value"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("col_name")
    )

"""Round-3 seventh tranche: foreachBatch upsert sink, seasonal
(hour-of-week) indices, Markov transition matrices, readability
scoring, and session path mining.

Every entry follows the catalog contract: a PySpark program plus a
DuckDB oracle replaying identical semantics."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DAVG, SQL_DSUM, register, _t
from .functions import davg


# --------------------------------------------------------------------------
# foreachBatch idempotent upsert (streaming merge sink)
# --------------------------------------------------------------------------

@register(
    "streaming_foreachbatch_upsert",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       {SQL_DSUM.format(x="value")} AS total
FROM events GROUP BY 1 ORDER BY 1
""",
    tags=("streaming", "foreachbatch", "upsert"),
)
def streaming_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch merge-upsert sink (streaming/jobs.py
    run_foreachbatch_upsert): the events stream is chopped into 4
    micro-batches (maxFilesPerTrigger=1) and each batch's partial
    (n, total) aggregate is MERGED into a versioned parquet state store
    — the production sink pattern for targets without native streaming
    support. Distributive aggregates merge exactly on the micro-unit
    grid, so the final upserted state equals the one-shot batch GROUP
    BY the oracle runs, no matter how the stream was batched. Each
    batch writes its own state version (idempotent replay; a retried
    batch overwrites itself)."""
    from .streaming.jobs import run_foreachbatch_upsert

    work = tempfile.mkdtemp(prefix="mda_upsert_")
    out = run_foreachbatch_upsert(spark, sf_dir, work)
    return out.orderBy("event_type")


# --------------------------------------------------------------------------
# Seasonal hour-of-week index
# --------------------------------------------------------------------------

@register(
    "ts_seasonal_index_how",
    oracle=f"""
WITH cells AS (
  SELECT isodow(ts) AS dow_iso, hour(ts) AS hr,
         CAST(count(*) AS BIGINT) AS n,
         {SQL_DAVG.format(x="value")} AS avg_value
  FROM events GROUP BY 1, 2
),
gl AS (SELECT {SQL_DAVG.format(x="value")} AS g FROM events)
SELECT dow_iso, hr, n, avg_value,
       round(avg_value / gl.g, 6) AS seasonal_index
FROM cells CROSS JOIN gl
ORDER BY dow_iso, hr
""",
    tags=("timeseries", "seasonal", "forecast"),
)
def ts_seasonal_index_how(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonal indices (the seasonal-naive forecast
    baseline): per (ISO weekday, hour) cell mean over the corpus,
    normalized by the global mean — index > 1 marks hot hours. The
    168-cell frame is the model; at 100 TB it is one map-side-combined
    aggregate and the 'forecast' is a broadcast join of the index onto
    any horizon. ISO weekday (Mon=1) is used because engines disagree
    on Sunday-origin day numbering; both sides quantize means on the
    micro grid so the ratio is bit-identical."""
    ev = _t(spark, sf_dir, "events").select(
        (F.weekday("ts") + 1).alias("dow_iso"),
        F.hour("ts").alias("hr"),
        "value",
    )
    cells = ev.groupBy("dow_iso", "hr").agg(
        F.count(F.lit(1)).alias("n"), davg(F.col("value")).alias("avg_value")
    )
    gl = ev.agg(davg(F.col("value")).alias("g"))
    return (
        cells.crossJoin(F.broadcast(gl))
        .select(
            "dow_iso",
            "hr",
            "n",
            "avg_value",
            F.round(F.col("avg_value") / F.col("g"), 6).alias("seasonal_index"),
        )
        .orderBy("dow_iso", "hr")
    )


# --------------------------------------------------------------------------
# First-order Markov transition matrix over event sequences
# --------------------------------------------------------------------------

@register(
    "events_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
cnt AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
),
rowt AS (SELECT src, CAST(sum(n) AS BIGINT) AS row_n FROM cnt GROUP BY 1)
SELECT c.src, c.dst, c.n,
       round(CAST(c.n AS DOUBLE) / r.row_n, 6) AS p
FROM cnt c JOIN rowt r USING (src)
ORDER BY src, dst
""",
    tags=("markov", "sequence", "window"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain over per-user event sequences: lead()
    pairs each event with its successor (total order via (ts,
    event_id)), transition counts hash-aggregate, and row-normalized
    probabilities come from a broadcast of the states-cardinality row
    totals. The transition matrix is states² rows — model-sized — while
    the only event-cardinality work is one window pass; this is the
    user-journey / next-event-prediction building block the funnel and
    path entries compose with."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    cnt = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    rowt = cnt.groupBy("src").agg(F.sum("n").alias("row_n"))
    return (
        cnt.join(F.broadcast(rowt), "src")
        .select(
            "src",
            "dst",
            "n",
            F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias("p"),
        )
        .orderBy("src", "dst")
    )


# --------------------------------------------------------------------------
# Readability scoring (Flesch-style, vowel-group syllable heuristic)
# --------------------------------------------------------------------------

@register(
    "text_readability",
    oracle="""
WITH feats AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> len(x) > 0)) AS BIGINT) AS words,
         CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT) AS syllables,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS sentences
  FROM documents
)
SELECT doc_id, words, syllables, sentences,
       round(206.835
             - 1.015 * (CAST(words AS DOUBLE) / sentences)
             - 84.6 * (CAST(syllables AS DOUBLE) / words), 6) AS flesch
FROM feats WHERE words > 0
ORDER BY doc_id
""",
    tags=("text", "readability", "quality"),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring with the standard vowel-group
    syllable heuristic — a row-local projection (two regex passes +
    arithmetic), fully inside whole-stage codegen, joining the
    language-ID / entropy / Gopher entries as another quality signal
    for corpus curation. The synthetic corpus has no sentence
    punctuation, so `sentences` clamps at 1 (the formula degrades to a
    length+syllable penalty) — on punctuated text the same expression
    yields the published score. Reference analog: the per-row derived
    metrics of analyse.py's report tables."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) > 0
    )
    feats = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).cast("bigint").alias("words"),
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiou]+', 0)"))
        .cast("bigint")
        .alias("syllables"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        )
        .cast("bigint")
        .alias("sentences"),
    )
    return (
        feats.filter(F.col("words") > 0)
        .select(
            "doc_id",
            "words",
            "syllables",
            "sentences",
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * (F.col("words").cast("double") / F.col("sentences"))
                - F.lit(84.6) * (F.col("syllables").cast("double") / F.col("words")),
                6,
            ).alias("flesch"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Session path mining (top event-type sequences)
# --------------------------------------------------------------------------

_PATH_GAP_MIN = 30
_PATH_LEN = 3


@register(
    "paths_top_sequences",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > {_PATH_GAP_MIN} * 60000000 THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(sum(new_sess) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS BIGINT) AS sid
  FROM ordered
),
paths AS (
  SELECT user_id, sid,
         array_to_string(list(event_type ORDER BY ts, event_id)[1:{_PATH_LEN}],
                         '->') AS path
  FROM sess GROUP BY user_id, sid
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path LIMIT 20
""",
    tags=("paths", "sessionize", "sequence"),
)
def paths_top_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: sessionize per user (30-minute inactivity
    gap — the sessionize_events construction), take each session's
    first {_PATH_LEN} event types in (ts, event_id) order as its path
    signature, and rank the most common journeys. The collect per
    session is bounded at {_PATH_LEN} positions after an array_sort on
    a struct-encoded (ts, event_id, type) triple — deterministic
    ordering with one shuffle shared by both windows and the session
    group-by (same partitioning key). The path table is
    pattern-cardinality; this is the 'top user journeys' report every
    product-analytics engine ships."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _PATH_GAP_MIN * 60_000_000
    ordered = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
                > gap_us
            ),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = ordered.withColumn(
        "sid", F.sum("new_sess").over(w).cast("bigint")
    )
    paths = (
        sess.groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda s: s["event_type"],
                    ),
                    1,
                    _PATH_LEN,
                ),
                "->",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )

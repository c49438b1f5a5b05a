"""Statistical language-model scoring for corpus curation.

The standard LM-based quality filter (CCNet, Gopher, RedPajama all use a
variant): train a cheap n-gram model on the corpus (or a trusted
reference corpus), score every document's mean negative log-probability,
and gate on the score — outlier docs (boilerplate, gibberish, wrong
language) sit in the high-NLL tail. KenLM is the usual single-node tool;
here the whole train+score cycle is Spark aggregations, so the "model"
is a count table that lives as a DataFrame and scoring is a join.

Scale shape: bigram/context counts are ``groupBy`` over 60-bit hashed
keys (8-byte shuffle keys, never token text); scoring joins the exploded
corpus against the two count tables on those same hashed keys, so the
count-table build and the scoring probe share partitioning. The add-α
smoothing constant and vocabulary size enter as a broadcast 1-row
aggregate — no driver-side collect anywhere.

Determinism: per-bigram log-probabilities round at 9 dp (the repo's
ln-parity convention, see text_tfidf_top_terms) and per-document means
use the micro-quantized ``davg``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import davg, dsum
from .hashing import hash60, sql_hash60
from .text import sql_tokens, tokens
from .util import fan_out


def bigrams(col: Column | str) -> Column:
    """Positional bigram strings ("w1 w2") of a text column; documents
    with fewer than 2 tokens yield an empty array (they are unscorable
    and must not fabricate a sentinel bigram)."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def sql_bigrams(expr: str) -> str:
    """DuckDB rendering of :func:`bigrams` (1-indexed lists)."""
    toks = sql_tokens(expr)
    return (
        f"CASE WHEN len({toks}) >= 2 THEN "
        f"list_transform(generate_series(1, len({toks}) - 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + 1), ' ')) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


def bigram_logprob_scores(
    df: DataFrame, text_col: str, id_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-document mean negative log-probability under an add-α bigram
    model trained on the corpus itself (self-scoring: high-NLL docs are
    the distributional outliers a curation gate drops).

    p(w2|w1) = (c(w1 w2) + α) / (c(w1·) + α·V), with c(w1·) the count of
    w1 as a bigram context and V the corpus vocabulary size. Returns
    (id, n_bigrams, avg_neg_logp); docs with < 2 tokens score NULL.
    """
    # Materialized: the tokenize→bigram-explode→double-md5 subtree is the
    # expensive part and is consumed THREE times (bigram counts, context
    # counts, the scoring join) — without the checkpoint it re-evaluates
    # per consumer (measured 3x on the ccnet/bigram entries at sf0.1).
    # 24 bytes/bigram (three longs), spills never matter.
    # fan_out first: documents at sf0.1 is a single parquet split, and
    # without the repartition the tokenize/explode/md5 subtree runs on
    # ONE core before the checkpoint (measured 5.2s -> ~2s for the ccnet
    # entry at sf0.1); at cluster scale the scan is already wide and the
    # repartition is a no-op.
    bg = fan_out(df.select(F.col(id_col).alias("did"), F.col(text_col))).select(
        "did", F.explode(bigrams(text_col)).alias("bg")
    ).select(
        "did",
        hash60(F.col("bg")).alias("bgh"),
        hash60(F.split(F.col("bg"), " ", 2).getItem(0)).alias("ctxh"),
    ).localCheckpoint(eager=True)
    c_bg = bg.groupBy("bgh").agg(F.count(F.lit(1)).alias("c_bg"))
    c_ctx = bg.groupBy("ctxh").agg(F.count(F.lit(1)).alias("c_ctx"))
    vocab = df.select(
        F.explode(tokens(text_col)).alias("term")
    ).agg(F.count_distinct("term").alias("v"))
    scored = (
        bg.join(c_bg, "bgh")
        .join(c_ctx, "ctxh")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "neg_logp",
            F.round(
                -F.log(
                    (F.col("c_bg") + F.lit(alpha))
                    / (F.col("c_ctx") + F.lit(alpha) * F.col("v"))
                ),
                9,
            ),
        )
    )
    per_doc = scored.groupBy("did").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        davg(F.col("neg_logp")).alias("avg_neg_logp"),
    )
    return (
        df.select(F.col(id_col).alias("did"))
        .join(per_doc, "did", "left")
        .select(
            F.col("did").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.col("avg_neg_logp"),
        )
    )


def sql_bigram_logprob_scores(alpha: float = 0.5, table: str = "documents") -> str:
    """DuckDB oracle for :func:`bigram_logprob_scores` over ``table``
    (any relation exposing doc_id + text — composable as a nested-WITH
    subquery inside a larger pipeline oracle)."""
    from ..catalog import SQL_DAVG

    bgs = sql_bigrams("text")
    bgh = sql_hash60("bg")
    ctxh = sql_hash60("split_part(bg, ' ', 1)")
    return f"""
WITH bg AS (
  SELECT doc_id AS did, {bgh} AS bgh, {ctxh} AS ctxh
  FROM (SELECT doc_id, unnest({bgs}) AS bg FROM {table})
),
c_bg AS (SELECT bgh, count(*) AS c_bg FROM bg GROUP BY bgh),
c_ctx AS (SELECT ctxh, count(*) AS c_ctx FROM bg GROUP BY ctxh),
vocab AS (
  SELECT count(DISTINCT term) AS v
  FROM (SELECT unnest({sql_tokens('text')}) AS term FROM {table})
),
scored AS (
  SELECT bg.did,
         round(-ln((c_bg.c_bg + {alpha}) / (c_ctx.c_ctx + {alpha} * vocab.v)), 9)
           AS neg_logp
  FROM bg JOIN c_bg USING (bgh) JOIN c_ctx USING (ctxh), vocab
),
per_doc AS (
  SELECT did, count(*) AS n_bigrams, {SQL_DAVG.format(x='neg_logp')} AS avg_neg_logp
  FROM scored GROUP BY did
)
SELECT d.doc_id,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       p.avg_neg_logp
FROM {table} d LEFT JOIN per_doc p ON d.doc_id = p.did
ORDER BY d.doc_id
"""


# --------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., 2023)
# --------------------------------------------------------------------------

def _hash_bucket(c: Column, n_buckets: int) -> Column:
    """Engine-portable feature hash (md5-60bit % B) of a string column,
    usable inside higher-order-function lambdas."""
    h = F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
    return h % F.lit(n_buckets)


def dsir_features(col: Column | str, n_buckets: int = 4096) -> Column:
    """The DSIR feature map: word unigrams + bigrams, hashed into
    ``n_buckets`` buckets. Bucket collisions are part of the method (the
    hashed model IS the model), not noise to avoid."""
    c = F.col(col) if isinstance(col, str) else col
    feats = F.concat(tokens(c), bigrams(c))
    return F.transform(feats, lambda t: _hash_bucket(t, n_buckets))


def sql_dsir_features(expr: str, n_buckets: int = 4096) -> str:
    """DuckDB rendering of :func:`dsir_features`."""
    toks = sql_tokens(expr)
    bgs = sql_bigrams(expr)
    return (
        f"list_transform(list_concat({toks}, {bgs}), "
        f"t -> (('0x' || substring(md5(t), 1, 15))::BIGINT) % {n_buckets})"
    )


def dsir_importance(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    top_n: int = 100,
) -> DataFrame:
    """DSIR importance-resampling scores: fit hashed bag-of-ngrams models
    on the target (in-domain) slice and on the raw candidate pool, weight
    every candidate by log p_target(x) − log p_raw(x) under add-1
    smoothing, and Gumbel-top-k resample — the estimator of
    "Data Selection for Language Models via Importance Resampling".

    Scale shape: both models are groupBy counts over constant-size bucket
    ids (≤ ``n_buckets`` rows each — broadcastable forever); candidate
    scoring joins exploded bucket ids against the broadcast log-ratio
    table; the selection threshold is a distributed top-n
    (TakeOrderedAndProject), never a global sort. Text leaves the
    executors only as 8-byte bucket ids.

    Determinism: every ``ln`` rounds at 9 dp before any arithmetic
    (cross-libm parity); per-doc sums are micro-quantized (``davg``
    convention); the Gumbel noise is md5-derived from the document id, so
    the "random" resample is bit-reproducible on any engine.

    Returns one row per candidate (non-target) document:
    ``(id, n_feats, log_w, gumbel_key, sampled)``.
    """
    from pyspark.storagelevel import StorageLevel

    # feats feeds three consumers (both model counts and the candidate
    # scoring pass): pin it so the tokenize+hash explode runs once, and
    # fold the two single-slice count passes into ONE map-side-combined
    # aggregation over the shared frame (2 corpus aggs -> 1). c_tgt = 0
    # where the original left join produced NULL — the downstream
    # coalesce(c_tgt, 0) makes the log-ratio identical.
    feats = docs.select(
        F.col(id_col).alias("did"),
        target_pred.alias("is_target"),
        F.explode(dsir_features(text_col, n_buckets)).alias("bucket"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    counts = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_tgt"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("c_raw"),
    )
    tgt_counts = counts.select("bucket", "c_tgt")
    # Model totals: raw_total rides an unbounded window over the
    # ≤ n_buckets count rows — constant-size state, no extra shuffle of
    # the corpus. tgt_total must be the GLOBAL target feature mass
    # (including buckets absent from the raw pool — the published add-1
    # estimator's T), so it is a separate 1-row aggregate broadcast in,
    # NOT a window over the raw-joined frame.
    w_all = Window.partitionBy(F.lit(1))
    lr9 = lambda x: F.round(F.log(x), 9)  # noqa: E731
    tgt_total = tgt_counts.agg(
        F.coalesce(F.sum("c_tgt"), F.lit(0)).alias("tgt_total")
    )
    # raw_counts already carries c_tgt via the shared counts frame — the
    # old raw-left-join-tgt is a projection of it (c_tgt 0 vs NULL, which
    # the coalesce below erases), so no bucket-table self-join is needed.
    ratio = (
        counts.filter(F.col("c_raw") > 0)
        .crossJoin(F.broadcast(tgt_total))
        .withColumn("raw_total", F.sum("c_raw").over(w_all))
        .select(
            "bucket",
            (
                (lr9(F.coalesce("c_tgt", F.lit(0)) + 1) - lr9(F.col("tgt_total") + n_buckets))
                - (lr9(F.col("c_raw") + 1) - lr9(F.col("raw_total") + n_buckets))
            ).alias("log_ratio"),
        )
    )
    cand = feats.filter(~F.col("is_target"))
    per_doc = (
        cand.join(F.broadcast(ratio), "bucket")
        .groupBy("did")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            (dsum(F.col("log_ratio"))).alias("log_w"),
        )
    )
    # Deterministic Gumbel(0,1) noise: u ∈ (0,1) from the id's md5-60bit.
    scored = (
        docs.filter(~target_pred)
        .select(F.col(id_col).alias("did"))
        .join(per_doc, "did", "left")
        .select(
            "did",
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.coalesce("log_w", F.lit(0.0)).alias("log_w"),
        )
        .withColumn(
            "u",
            (hash60(F.concat(F.lit("gumbel|"), F.col("did").cast("string"))) + 1).cast(
                "double"
            )
            / F.lit(float(2**60 + 2)),
        )
        .withColumn("gumbel_key", F.col("log_w") + F.round(-F.log(-F.log(F.col("u"))), 9))
        .drop("u")
    )
    # Selection threshold: n-th largest key via distributed top-n, then a
    # broadcast 1-row scalar — never a global sort or single-ordering window.
    thr = (
        scored.orderBy(F.col("gumbel_key").desc(), "did")
        .limit(top_n)
        .agg(F.min("gumbel_key").alias("thr"))
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .select(
            F.col("did").alias(id_col),
            "n_feats",
            "log_w",
            "gumbel_key",
            (F.col("gumbel_key") >= F.col("thr")).alias("sampled"),
        )
    )


def sql_dsir_importance(
    target_sql_pred: str,
    n_buckets: int = 4096,
    top_n: int = 100,
) -> str:
    """DuckDB oracle for :func:`dsir_importance` over ``documents``."""
    from ..catalog import SQL_DSUM

    feats = sql_dsir_features("text", n_buckets)
    gh = sql_hash60("('gumbel|' || CAST(did AS VARCHAR))")
    return f"""
WITH feats AS (
  SELECT doc_id AS did, ({target_sql_pred}) AS is_target, unnest({feats}) AS bucket
  FROM documents
),
tgt AS (SELECT bucket, count(*) AS c_tgt FROM feats WHERE is_target GROUP BY bucket),
raw AS (SELECT bucket, count(*) AS c_raw FROM feats WHERE NOT is_target GROUP BY bucket),
ratio AS (
  SELECT r.bucket,
         (round(ln(coalesce(t.c_tgt, 0) + 1), 9)
          - round(ln((SELECT coalesce(sum(c_tgt), 0) FROM tgt) + {n_buckets}), 9))
         - (round(ln(r.c_raw + 1), 9)
          - round(ln((SELECT sum(c_raw) FROM raw) + {n_buckets}), 9)) AS log_ratio
  FROM raw r LEFT JOIN tgt t USING (bucket)
),
per_doc AS (
  SELECT did, count(*) AS n_feats, {SQL_DSUM.format(x='log_ratio')} AS log_w
  FROM feats JOIN ratio USING (bucket)
  WHERE NOT is_target
  GROUP BY did
),
scored AS (
  SELECT d.doc_id AS did,
         coalesce(p.n_feats, 0) AS n_feats,
         coalesce(p.log_w, 0.0) AS log_w,
         coalesce(p.log_w, 0.0)
           + round(-ln(-ln((({gh}) + 1)::DOUBLE / {float(2**60 + 2)!r})), 9) AS gumbel_key
  FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.did
  WHERE NOT ({target_sql_pred})
),
thr AS (
  SELECT min(gumbel_key) AS thr FROM (
    SELECT gumbel_key FROM scored ORDER BY gumbel_key DESC, did LIMIT {top_n}
  )
)
SELECT did AS doc_id, n_feats, log_w, gumbel_key,
       (gumbel_key >= thr.thr) AS sampled
FROM scored, thr
ORDER BY doc_id
"""

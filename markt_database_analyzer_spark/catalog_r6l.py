"""Round-6 additions, part 12: out-of-vocabulary rate against a top-K
corpus vocabulary, and rank-biased overlap (RBO) between two rankers.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle SQL) pairs with identical semantics — exact-integer
counts, literal-injected float weights so both engines parse the same
decimals, total orderings at every row selection — hash-compared at
sf0.01 by the driver.

Reference parity: the reference (analyse.py) has no text surface; these
extend the tokenizer/vocab family (``vocab_top_terms``,
``text_token_counts``) and the IR-eval family (``eval_ndcg_at_k``,
``rank_fusion_rrf``) with the readouts a tokenizer-training and
ranker-comparison pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, register, _t
from .catalog_r3c import _BM25_B, _BM25_K1, _BM25_TERMS, _SQL_TOKENS, _tokens
from .functions import dsum

# --------------------------------------------------------------------------
# OOV rate per lang against the top-K corpus vocabulary
# --------------------------------------------------------------------------

_OOV_K = 16  # vocabulary budget (fixture vocab is 31 terms, so OOV > 0)


def _sql_oov() -> str:
    return f"""
WITH toks AS ({_SQL_TOKENS}),
lt AS (
  SELECT d.lang, t.w FROM toks t JOIN documents d USING (doc_id)
),
vocab AS (
  SELECT w FROM lt GROUP BY w
  ORDER BY count(*) DESC, w LIMIT {_OOV_K}
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE w NOT IN (SELECT w FROM vocab)) AS BIGINT)
         AS oov_tokens,
       round(count(*) FILTER (WHERE w NOT IN (SELECT w FROM vocab))
             / CAST(count(*) AS DOUBLE), 9) AS oov_rate
FROM lt GROUP BY lang ORDER BY lang
"""


@register(
    "vocab_oov_rate_topk",
    oracle=_sql_oov(),
    tags=("text", "vocab", "tokenizer", "oov"),
)
def vocab_oov_rate_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language against a size-K corpus
    vocabulary (the top-K tokens by collection frequency, ties broken
    by token — a total order). The readout a tokenizer-training
    pipeline runs to size its vocab budget and to catch languages the
    vocabulary underserves — the per-lang OOV skew IS the fairness
    metric for multilingual tokenizers.

    Scale shape: one token-stream pass builds the vocabulary candidate
    counts (map-side combined groupBy token — rows = vocabulary
    entries, never occurrences); the top-K cut is a TakeOrdered over
    the vocab-sized frame; the K-row vocabulary then BROADCASTS back
    onto the token stream for a left-anti membership test, so the
    second pass is map-only. Counts are exact BIGINTs; the rate is one
    integer ratio."""
    docs = _t(spark, sf_dir, "documents")
    lt = _tokens(docs).join(docs.select("doc_id", "lang"), "doc_id").select(
        "lang", "w"
    )
    vocab = (
        lt.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "w")
        .limit(_OOV_K)
        .select("w")
    )
    flagged = lt.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "w", "left"
    )
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.count(F.when(F.col("in_vocab").isNull(), 1))
            .cast("bigint")
            .alias("oov_tokens"),
        )
        .select(
            "lang",
            "n_tokens",
            "oov_tokens",
            F.round(
                F.col("oov_tokens") / F.col("n_tokens").cast("double"), 9
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Rank-biased overlap between BM25 and a TF-only ranker
# --------------------------------------------------------------------------

_RBO_P = 0.9
_RBO_DEPTH = 20
# p^(d-1) injected as identical decimal literals on BOTH engines — pow()
# is libm-dependent and a 1-ULP difference could flip a rounding
# boundary; parsing the same literal cannot.
_RBO_WEIGHTS = [repr(_RBO_P ** d) for d in range(_RBO_DEPTH)]


def _sql_rbo() -> str:
    weights = ", ".join(
        f"({d + 1}, {w})" for d, w in enumerate(_RBO_WEIGHTS)
    )
    return f"""
WITH toks AS ({_SQL_TOKENS}),
dl AS (
  SELECT d.doc_id, CAST(coalesce(t.n, 0) AS BIGINT) AS dl
  FROM documents d LEFT JOIN
       (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id) t USING (doc_id)
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM toks
  WHERE w IN {_BM25_TERMS!r}
  GROUP BY doc_id, w
),
idf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w
),
scored AS (
  SELECT t.doc_id,
         {SQL_DSUM.format(x=f'''
           ln(1.0 + (CAST(s.nd - i.df AS DOUBLE) + 0.5) / (CAST(i.df AS DOUBLE) + 0.5))
           * ((CAST(t.tf AS DOUBLE) * {_BM25_K1 + 1.0}) /
              (CAST(t.tf AS DOUBLE)
               + {_BM25_K1} * (1.0 - {_BM25_B}
                               + {_BM25_B} * (CAST(d.dl AS DOUBLE) / s.avgdl))))''')} AS score,
         CAST(sum(t.tf) AS BIGINT) AS tf_total
  FROM tf t
  JOIN idf i USING (w)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY t.doc_id
),
ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM (SELECT doc_id, score FROM scored
        ORDER BY score DESC, doc_id LIMIT {_RBO_DEPTH})
),
rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY tf_total DESC, doc_id) AS r
  FROM (SELECT doc_id, tf_total FROM scored
        ORDER BY tf_total DESC, doc_id LIMIT {_RBO_DEPTH})
),
m AS (
  SELECT greatest(ra.r, rb.r) AS m
  FROM ra JOIN rb USING (doc_id)
),
spine(d, w) AS (VALUES {weights}),
agreement AS (
  SELECT s.d, s.w,
         CAST((SELECT count(*) FROM m WHERE m.m <= s.d) AS BIGINT) AS ov
  FROM spine s
)
SELECT CAST({_RBO_DEPTH} AS BIGINT) AS depth,
       round({_RBO_P}, 6) AS p,
       max(CASE WHEN d = {_RBO_DEPTH} THEN ov END) AS overlap_at_depth,
       round((1.0 - {_RBO_P})
             * CAST(sum(CAST(round(w * (CAST(ov AS DOUBLE) / d) * 1e9)
                             AS HUGEINT)) AS DOUBLE) / 1e9, 9) AS rbo
FROM agreement
"""


@register(
    "eval_rank_biased_overlap",
    oracle=_sql_rbo(),
    tags=("eval", "search", "ranking", "rbo"),
)
def eval_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (Webber et al. 2010), truncated at depth 20
    with persistence p = 0.9, between the BM25 ranking and a TF-only
    ranking of the SAME query — the top-weighted list-similarity
    measure a ranker A/B comparison reports (Kendall's tau treats
    position 1 like position 20; RBO does not). RBO@D = (1-p) ·
    Σ_{{d=1..D}} p^(d-1) · |A_d ∩ B_d| / d, where A_d/B_d are the two
    depth-d prefixes. Here it isolates exactly what idf + length
    normalization change about pure term-frequency ranking.

    Exactness: both rankings derive from ONE shared scored frame (the
    ``search_bm25_topk`` posting-list machinery, so the corpus is
    scanned once for both rankers); prefix ranks are row_numbers over
    total orders; the geometric weights p^(d-1) are injected as
    IDENTICAL decimal literals on both engines (pow() is
    libm-dependent); each depth's addend is nano-quantized before the
    cross-depth sum.

    Scale shape: posting-list projection before any shuffle, two
    TakeOrdered top-20 cuts, then all RBO algebra on ≤20-row frames
    (the depth spine is a 20-row literal table)."""
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(docs)
    dl = (
        docs.select("doc_id")
        .join(
            toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("dl")
        )
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    k1, b = _BM25_K1, _BM25_B
    term_score = F.log(
        1.0
        + ((F.col("nd") - F.col("df")).cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    ) * (
        (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
            )
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            dsum(term_score).alias("score"),
            F.sum("tf").cast("bigint").alias("tf_total"),
        )
        .localCheckpoint(eager=True)  # feeds both rankings
    )
    wa = Window.orderBy(F.desc("score"), "doc_id")
    wb = Window.orderBy(F.desc("tf_total"), "doc_id")
    ra = (
        scored.orderBy(F.desc("score"), "doc_id")
        .limit(_RBO_DEPTH)
        .select("doc_id", F.row_number().over(wa).alias("r"))
    )
    rb = (
        scored.orderBy(F.desc("tf_total"), "doc_id")
        .limit(_RBO_DEPTH)
        .select("doc_id", F.row_number().over(wb).alias("r"))
    )
    m = ra.alias("a").join(rb.alias("b"), "doc_id").select(
        F.greatest(F.col("a.r"), F.col("b.r")).alias("m")
    )
    spine = spark.createDataFrame(
        [(d + 1, float(w)) for d, w in enumerate(_RBO_WEIGHTS)], "d INT, w DOUBLE"
    )
    agreement = (
        F.broadcast(spine)
        .join(m, F.col("m") <= F.col("d"), "left")
        .groupBy("d", "w")
        .agg(F.count("m").cast("bigint").alias("ov"))
    )
    addend = F.round(
        F.col("w") * (F.col("ov").cast("double") / F.col("d")) * 1e9
    ).cast("decimal(38,0)")
    return agreement.agg(
        F.lit(_RBO_DEPTH).cast("bigint").alias("depth"),
        F.round(F.lit(_RBO_P), 6).alias("p"),
        F.max(F.when(F.col("d") == _RBO_DEPTH, F.col("ov"))).alias(
            "overlap_at_depth"
        ),
        F.round(
            (1.0 - F.lit(_RBO_P)) * F.sum(addend).cast("double") / 1e9, 9
        ).alias("rbo"),
    )

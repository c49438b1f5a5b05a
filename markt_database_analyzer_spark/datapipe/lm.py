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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import davg
from .hashing import hash60, sql_hash60
from .text import sql_tokens, tokens


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
    bg = df.select(
        F.col(id_col).alias("did"), F.explode(bigrams(text_col)).alias("bg")
    ).select(
        "did",
        hash60(F.col("bg")).alias("bgh"),
        hash60(F.split(F.col("bg"), " ", 2).getItem(0)).alias("ctxh"),
    )
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


def sql_bigram_logprob_scores(alpha: float = 0.5) -> str:
    """DuckDB oracle for :func:`bigram_logprob_scores` over documents."""
    from ..catalog import SQL_DAVG

    bgs = sql_bigrams("text")
    bgh = sql_hash60("bg")
    ctxh = sql_hash60("split_part(bg, ' ', 1)")
    return f"""
WITH bg AS (
  SELECT doc_id AS did, {bgh} AS bgh, {ctxh} AS ctxh
  FROM (SELECT doc_id, unnest({bgs}) AS bg FROM documents)
),
c_bg AS (SELECT bgh, count(*) AS c_bg FROM bg GROUP BY bgh),
c_ctx AS (SELECT ctxh, count(*) AS c_ctx FROM bg GROUP BY ctxh),
vocab AS (
  SELECT count(DISTINCT term) AS v
  FROM (SELECT unnest({sql_tokens('text')}) AS term FROM documents)
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
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.did
ORDER BY d.doc_id
"""

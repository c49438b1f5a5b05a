"""Round-6 additions: ANN recall@k evaluation and distinct-n-gram
corpus diversity.

Both follow the catalog contract: a PySpark program plus a DuckDB
oracle replaying identical semantics (same tie-breaks, same rounding
grid), hash-compared at sf0.01 by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import similarity as sim
from .datapipe import text as tx

# --------------------------------------------------------------------------
# ANN recall@k: IVF(nprobe=2) vs exact brute-force ground truth
# --------------------------------------------------------------------------

_SQL_COS = "round(list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[]), 9)"

_ANN_RECALL_SQL = f"""
WITH corpus AS (SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings),
q AS (SELECT vec_id AS query_id, vec AS qvec FROM corpus WHERE vec_id < 5),
brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_SQL_COS.format(a='q.qvec', b='e.vec')} DESC, e.vec_id) AS rank
    FROM corpus e CROSS JOIN q WHERE e.vec_id != q.query_id
  ) WHERE rank <= 10
),
dims AS (
  SELECT label AS cell, unnest(generate_series(1, 64)) AS pos, unnest(vec) AS v
  FROM corpus
),
cent_dims AS (
  SELECT cell, pos,
         (CAST(SUM(CAST(round(v * 1000000.0) AS HUGEINT)) AS DOUBLE) / COUNT(v) / 1000000.0) AS cv
  FROM dims GROUP BY cell, pos
),
cents AS (SELECT cell, list(cv ORDER BY pos) AS centroid FROM cent_dims GROUP BY cell),
probed AS (
  SELECT query_id, qvec, cell FROM (
    SELECT q.query_id, q.qvec, c.cell,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_SQL_COS.format(a='q.qvec', b='c.centroid')} DESC, c.cell) AS crank
    FROM q CROSS JOIN cents c
  ) WHERE crank <= 2
),
ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY p.query_id
             ORDER BY {_SQL_COS.format(a='p.qvec', b='e.vec')} DESC, e.vec_id) AS rank
    FROM corpus e JOIN probed p ON e.label = p.cell
    WHERE e.vec_id != p.query_id
  ) WHERE rank <= 10
)
SELECT b.query_id,
       CAST(10 AS BIGINT) AS k,
       CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
       round(count(i.neighbor_id) / 10.0, 9) AS recall
FROM brute b
LEFT JOIN ivf i
  ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
GROUP BY b.query_id
ORDER BY b.query_id
"""


@register(
    "eval_ann_recall_at_k",
    oracle=_ANN_RECALL_SQL,
    tags=("similarity", "ann", "eval", "recall"),
)
def eval_ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF index (nprobe=2) against exact brute-force
    ground truth, per query — the standard ANN quality metric (as
    published with every IVF/PQ system; Johnson et al., "Billion-scale
    similarity search with GPUs"). Both rankings break cosine ties by
    neighbor id, so the metric is deterministic.

    100 TB story: ground truth is only ever computed for a SAMPLED
    query set (here the 5-query eval panel shared with
    ``similarity_bruteforce_topk``), so the exact pass costs
    |queries| x corpus — a bounded eval job, not a production path —
    while the IVF side scores only the probed cells. The recall join
    itself is (|queries| x k) rows: driver-free, broadcast-sized."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    brute = sim.brute_force_topk(emb, queries, k=10).select(
        "query_id", "neighbor_id"
    )
    ivf = (
        sim.ivf_topk(emb, queries, k=10, nprobe=2)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        brute.join(F.broadcast(ivf), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.lit(10).cast("bigint").alias("k"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(10.0), 9
            ).alias("recall"),
        )
        .orderBy("query_id")
    )


# --------------------------------------------------------------------------
# Distinct-n-gram corpus diversity (per language)
# --------------------------------------------------------------------------

_DIVERSITY_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, {tx.sql_tokens('text')} AS t FROM documents
),
tri AS (
  SELECT lang,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM toks WHERE len(t) >= 3
),
per_gram AS (
  SELECT lang, g, CAST(count(*) AS BIGINT) AS cnt FROM tri GROUP BY 1, 2
)
SELECT lang,
       CAST(sum(cnt) AS BIGINT) AS total_trigrams,
       CAST(count(*) AS BIGINT) AS distinct_trigrams,
       round(count(*) / CAST(sum(cnt) AS DOUBLE), 9) AS distinct_ratio
FROM per_gram GROUP BY lang ORDER BY lang
"""


@register(
    "text_distinct_ngram_diversity",
    oracle=_DIVERSITY_SQL,
    tags=("text", "diversity", "ngram", "curation"),
)
def text_distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-trigram ratio per language — the distinct-n corpus
    diversity signal (Li et al. 2016 "distinct-n"; used by data-mix
    reports to flag template-heavy or duplicated sources before
    training). A low ratio means the corpus repeats the same word
    trigrams over and over.

    Plan shape: row-local trigram derivation (token array -> windowed
    concat, whole-stage codegen), then an explicit TWO-LEVEL aggregate
    — (lang, trigram) partial counts first (map-side combined; the
    shuffle carries each distinct trigram once per partition, never the
    corpus), then the per-language rollup of (sum, count). No
    count(DISTINCT) expansion, no window. Degenerate docs (<3 tokens)
    contribute nothing on both engines."""
    docs = _t(spark, sf_dir, "documents")
    # materialize the token array ONCE per row: referencing tx.tokens()
    # directly inside the trigram lambda re-evaluates the split+filter
    # for every element_at — O(len^2) per document (measured 11.3 s vs
    # 0.8 s at sf0.1)
    toks = docs.select("lang", tx.tokens("text").alias("t"))
    t = F.col("t")
    tri = toks.select(
        "lang",
        F.explode(
            F.when(
                F.size(t) >= 3,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(t, i),
                        F.element_at(t, i + 1),
                        F.element_at(t, i + 2),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    per_gram = tri.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_gram.groupBy("lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("total_trigrams"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_trigrams"),
            F.round(
                F.count(F.lit(1)) / F.sum("cnt").cast("double"), 9
            ).alias("distinct_ratio"),
        )
        .orderBy("lang")
    )

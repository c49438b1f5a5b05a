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


# --------------------------------------------------------------------------
# MinHash containment dedup (asymmetric doc-in-doc detection)
# --------------------------------------------------------------------------

def _sql_minhash_containment(
    num_hashes: int = 16, bands: int = 4, shingle_k: int = 3, min_contain: float = 0.5
) -> str:
    from .datapipe import dedup as dd
    from .datapipe.hashing import sql_hash60

    rows = num_hashes // bands
    sh_expr = dd.sql_shingles("text", k=shingle_k)
    mins = ",\n    ".join(
        f"list_min(list_transform(sh, s -> {dd.sql_km_hash('s', i)})) AS m{i}"
        for i in range(num_hashes)
    )
    band_selects = []
    for b in range(bands):
        vals = " || ',' || ".join(f"m{i}::VARCHAR" for i in range(b * rows, (b + 1) * rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, {sql_hash60(f'({vals})', seed=1000 + b)} AS band_hash FROM sig"
        )
    bands_sql = "\nUNION ALL\n".join(band_selects)
    return f"""
WITH sh AS (SELECT doc_id, {sh_expr} AS sh FROM documents),
sig AS (SELECT doc_id, sh, {mins} FROM sh),
bands AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
scored AS (
  SELECT c.id_a, c.id_b,
         round(len(list_intersect(sa.sh, sb.sh)) / CAST(len(sa.sh) AS DOUBLE), 9) AS contain_a,
         round(len(list_intersect(sa.sh, sb.sh)) / CAST(len(sb.sh) AS DOUBLE), 9) AS contain_b
  FROM cand c JOIN sh sa ON c.id_a = sa.doc_id JOIN sh sb ON c.id_b = sb.doc_id
)
SELECT id_a, id_b, contain_a, contain_b
FROM scored WHERE greatest(contain_a, contain_b) >= {min_contain}
ORDER BY id_a, id_b
"""


@register(
    "dedup_minhash_containment",
    oracle=_sql_minhash_containment(),
    tags=("dedup", "minhash", "lsh", "containment"),
)
def dedup_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC shingle containment |A∩B|/|A| on MinHash-LSH candidate
    pairs — catches a short document embedded inside a longer one
    (boilerplate, quotations, page-in-crawl duplication), which
    symmetric Jaccard misses: a 50-shingle doc fully contained in a
    5000-shingle doc has Jaccard ~0.01 but containment 1.0 (Broder 1997
    distinguishes resemblance vs containment). Same 16-hash / 4-band
    candidate generator as ``dedup_minhash_lsh`` (signatures shuffle,
    never text; note the standard caveat that MinHash banding is tuned
    for resemblance — production containment recall uses more bands or
    one-sided sketches); verification is exact set intersection on the
    candidate set only. Keeps pairs where either direction >= 0.5."""
    from .datapipe import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    sh = dd.shingle_projection(docs, "text", "doc_id").localCheckpoint(eager=True)
    cand = dd.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=16, bands=4, shingled=sh
    )
    scored = (
        cand.join(
            sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
        )
        .join(
            sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b")), "id_b"
        )
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .select(
            "id_a",
            "id_b",
            F.round(F.col("n_inter") / F.size("sh_a").cast("double"), 9).alias(
                "contain_a"
            ),
            F.round(F.col("n_inter") / F.size("sh_b").cast("double"), 9).alias(
                "contain_b"
            ),
        )
        .filter(F.greatest(F.col("contain_a"), F.col("contain_b")) >= 0.5)
    )
    return scored.repartition(1).sortWithinPartitions("id_a", "id_b")


# --------------------------------------------------------------------------
# CDC apply (MERGE-style changelog application — inverse of snapshot diff)
# --------------------------------------------------------------------------

_CDC_FIXTURE = """
snap_a AS (
  SELECT o_orderkey, o_totalprice AS price
  FROM orders WHERE o_orderkey % 10 != 3
),
snap_b AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
              ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 10 != 0
),
changes AS (
  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
         CASE WHEN a.o_orderkey IS NULL THEN 'I'
              WHEN b.o_orderkey IS NULL THEN 'D'
              ELSE 'U' END AS op,
         b.price AS new_price
  FROM snap_a a FULL OUTER JOIN snap_b b USING (o_orderkey)
  WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL OR a.price != b.price
)
"""


@register(
    "cdc_apply_changes",
    oracle=f"""
WITH {_CDC_FIXTURE}
SELECT coalesce(s.o_orderkey, c.o_orderkey) AS o_orderkey,
       coalesce(c.new_price, s.price) AS price
FROM snap_a s FULL OUTER JOIN changes c USING (o_orderkey)
WHERE c.op IS NULL OR c.op != 'D'
ORDER BY o_orderkey
""",
    tags=("cdc", "merge", "upsert", "changelog"),
)
def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style changelog application — the inverse of
    ``cdc_snapshot_diff``: apply an I/U/D changelog to the old snapshot
    (WHEN MATCHED AND op='D' THEN DELETE / op='U' THEN UPDATE / WHEN NOT
    MATCHED THEN INSERT) as ONE full-outer join plus a row-local
    coalesce — the engine shape under every lakehouse MERGE INTO. The
    changelog is derived from the same deterministic fixture as the
    diff entry, so the output must reconstruct the new snapshot
    bit-for-bit (pinned by test: apply(diff(a, b), a) == b). At 100 TB:
    one co-partitioned shuffle on the key; bucketed snapshots make it
    exchange-free, and only the changelog moves between stages."""
    orders = _t(spark, sf_dir, "orders")
    snap_a = orders.filter(F.col("o_orderkey") % 10 != 3).select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    )
    snap_b = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 100.0)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    a, b = snap_a.alias("a"), snap_b.alias("b")
    changes = (
        a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
        .filter(
            F.col("a.o_orderkey").isNull()
            | F.col("b.o_orderkey").isNull()
            | (F.col("a.price") != F.col("b.price"))
        )
        .select(
            F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey")).alias("o_orderkey"),
            F.when(F.col("a.o_orderkey").isNull(), F.lit("I"))
            .when(F.col("b.o_orderkey").isNull(), F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("b.price").alias("new_price"),
        )
    )
    s, c = snap_a.alias("s"), changes.alias("c")
    return (
        s.join(c, F.col("s.o_orderkey") == F.col("c.o_orderkey"), "full_outer")
        .filter(F.col("c.op").isNull() | (F.col("c.op") != "D"))
        .select(
            F.coalesce(F.col("s.o_orderkey"), F.col("c.o_orderkey")).alias("o_orderkey"),
            F.coalesce(F.col("c.new_price"), F.col("s.price")).alias("price"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Embedding truncation recall (MRL-style dimension-reduction quality eval)
# --------------------------------------------------------------------------

_TRUNC_DIMS = 16

_TRUNC_RECALL_SQL = f"""
WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
q AS (SELECT vec_id AS query_id, vec AS qvec FROM corpus WHERE vec_id < 5),
full_rank AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_SQL_COS.format(a='q.qvec', b='e.vec')} DESC, e.vec_id) AS rank
    FROM corpus e CROSS JOIN q WHERE e.vec_id != q.query_id
  ) WHERE rank <= 10
),
trunc_rank AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY {_SQL_COS.format(a=f'list_slice(q.qvec, 1, {_TRUNC_DIMS})', b=f'list_slice(e.vec, 1, {_TRUNC_DIMS})')} DESC, e.vec_id) AS rank
    FROM corpus e CROSS JOIN q WHERE e.vec_id != q.query_id
  ) WHERE rank <= 10
)
SELECT f.query_id,
       CAST({_TRUNC_DIMS} AS BIGINT) AS dims,
       CAST(count(t.neighbor_id) AS BIGINT) AS n_hits,
       round(count(t.neighbor_id) / 10.0, 9) AS recall
FROM full_rank f
LEFT JOIN trunc_rank t
  ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
GROUP BY f.query_id
ORDER BY f.query_id
"""


@register(
    "embeddings_truncate_recall",
    oracle=_TRUNC_RECALL_SQL,
    tags=("similarity", "embedding", "eval", "mrl"),
)
def embeddings_truncate_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of TRUNCATED-dimension cosine ranking (first
    16 of 64 dims) against the full-dimension ground truth —
    the storage/compute trade-off eval behind Matryoshka-style embedding
    truncation (Kusupati et al. 2022): 4x smaller vectors, measured
    quality loss. Same sampled 5-query panel and deterministic
    tie-breaks as ``eval_ann_recall_at_k``; both rankings are exact, so
    the number isolates what truncation alone costs. At 100 TB the
    truncated ranking is the production candidate stage (4x less IO and
    FLOPs per comparison) with full-dim re-scoring on its top
    candidates."""
    emb = _t(spark, sf_dir, "embeddings")
    tr = emb.withColumn("emb_t", F.slice(F.col("embedding"), 1, _TRUNC_DIMS))
    queries = tr.filter(F.col("vec_id") < 5)
    full_rank = sim.brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10).select(
        "query_id", "neighbor_id"
    )
    trunc_rank = (
        sim.brute_force_topk(tr, queries, k=10, vec_col="emb_t")
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        full_rank.join(F.broadcast(trunc_rank), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.lit(_TRUNC_DIMS).cast("bigint").alias("dims"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
            F.round(
                F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(10.0), 9
            ).alias("recall"),
        )
        .orderBy("query_id")
    )

"""Round-3 fourth tranche: BM25 ranked retrieval, inverted-index build,
an expression-level Bloom-filter semi-join gate, a bucketed interval-
overlap join, per-dimension embedding standardization, and a chi-square
contingency test.

Every entry follows the catalog contract: a PySpark program plus a
DuckDB oracle replaying identical semantics (same md5 hash family, same
micro-unit quantization, same double-arithmetic association)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, register, _t
from .datapipe.hashing import hash60, sql_hash60
from .functions import dsum

_TOKENIZE = "[^a-z]+"


def _tokens(df: DataFrame) -> DataFrame:
    """(doc_id, w) token stream — the shared tokenization convention."""
    return df.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), _TOKENIZE)).alias("w")
    ).filter(F.length("w") > 0)


_SQL_TOKENS = """
  SELECT doc_id, w
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents)
  WHERE len(w) > 0"""


# --------------------------------------------------------------------------
# BM25 ranked retrieval
# --------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "search_bm25_topk",
    oracle=f"""
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
                               + {_BM25_B} * (CAST(d.dl AS DOUBLE) / s.avgdl))))''')} AS score
  FROM tf t
  JOIN idf i USING (w)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
  GROUP BY t.doc_id
)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id LIMIT 20
""",
    tags=("search", "bm25", "ranking"),
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Sparck Jones, Lucene-style idf)
    for a fixed term query: tf from the token stream filtered to query
    terms BEFORE any shuffle (the posting-list projection), df/idf and
    corpus stats as 1-row / terms-sized broadcasts, per-(doc, term)
    partial scores quantized on the micro-unit grid so the per-doc sum
    is order-independent, then a global top-k. At 100 TB the only
    full-corpus aggregates are doclen and N — everything query-dependent
    touches posting lists for the query terms only, which is the
    inverted-index access path (`index_inverted_postings`) expressed
    relationally."""
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(docs)
    dl = (
        docs.select("doc_id")
        .join(toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")), "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("dl"))
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
            * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl")))
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(dsum(term_score).alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(20)


# --------------------------------------------------------------------------
# Inverted-index build (posting lists + collection stats)
# --------------------------------------------------------------------------

@register(
    "index_inverted_postings",
    oracle=f"""
WITH toks AS ({_SQL_TOKENS}),
grouped AS (
  SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w, doc_id
)
SELECT w AS token,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(c) AS BIGINT) AS cf,
       array_to_string(list(doc_id ORDER BY doc_id)[1:8], ',') AS postings_head
FROM grouped GROUP BY w
ORDER BY df DESC, token LIMIT 50
""",
    tags=("search", "index", "postings"),
)
def index_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: token -> (document frequency,
    collection frequency, head of the sorted posting list). The shuffle
    key is the token, exactly how distributed indexers partition
    posting lists; map-side combine collapses per-partition duplicates
    of (token, doc) before the exchange. The posting-list HEAD (first 8
    doc ids) stands in for the full list so the driver result stays
    scalar-typed — a real index writer would stream the full sorted
    list per token to its segment file from this same frame. Reference
    analog: the value_counts-style vocabulary report generalized to
    per-document postings."""
    grouped = (
        _tokens(_t(spark, sf_dir, "documents"))
        .groupBy("w", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        grouped.groupBy(F.col("w").alias("token"))
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("c").alias("cf"),
            F.array_join(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, 8), ","
            ).alias("postings_head"),
        )
        .orderBy(F.desc("df"), "token")
        .limit(50)
    )


# --------------------------------------------------------------------------
# Bloom-filter semi-join gate (expression-level, engine-portable)
# --------------------------------------------------------------------------

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
        F.broadcast(build.distinct().withColumn("m", F.lit(1))), "k", "left"
    ).select(
        (F.col("nhit") == F.col("npos")).alias("in_filter"),
        F.col("m").isNotNull().alias("is_member"),
    )
    return (
        verdict.groupBy("in_filter", "is_member")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("in_filter", "is_member")
    )


# --------------------------------------------------------------------------
# Interval-overlap join (bucketed equi-join, lossless vs the theta join)
# --------------------------------------------------------------------------

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


# --------------------------------------------------------------------------
# Per-dimension embedding standardization stats
# --------------------------------------------------------------------------

@register(
    "embeddings_standardize_dims",
    oracle=f"""
WITH flat AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
agg AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         {SQL_DSUM.format(x='x')} AS sx,
         {SQL_DSUM.format(x='x * x')} AS sxx,
         min(x) AS x_min, max(x) AS x_max
  FROM flat GROUP BY dim
)
SELECT dim, n,
       round(sx / n, 6) AS mean,
       round(sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0)), 6) AS std,
       x_min, x_max
FROM agg ORDER BY dim
""",
    tags=("embeddings", "ml-preprocessing", "standardize"),
)
def embeddings_standardize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization statistics for the embedding
    column — the fit half of a z-score scaler (mean/std/min/max per
    dimension), computed in ONE pass via posexplode + hash agg on the
    dimension index. The stats frame is dims-sized (64 rows) and would
    broadcast back for the map-only transform half at any corpus scale;
    variance uses the E[x^2]-E[x]^2 identity on micro-unit-quantized
    sums so the result is partitioning- and engine-independent. This is
    the MLlib StandardScaler contract expressed relationally."""
    flat = _t(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("pos", "xf")
    ).select((F.col("pos") + 1).alias("dim"), F.col("xf").cast("double").alias("x"))
    agg = flat.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("x")).alias("sx"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
    )
    mean = F.col("sx") / F.col("n")
    var = F.col("sxx") / F.col("n") - mean * mean
    return agg.select(
        "dim",
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("std"),
        "x_min",
        "x_max",
    ).orderBy("dim")


# --------------------------------------------------------------------------
# Chi-square contingency test (lang x source independence)
# --------------------------------------------------------------------------

@register(
    "stats_chi2_lang_source",
    oracle=f"""
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2
),
rowt AS (SELECT lang, CAST(count(*) AS BIGINT) AS nl FROM documents GROUP BY 1),
colt AS (SELECT source, CAST(count(*) AS BIGINT) AS ns FROM documents GROUP BY 1),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT lang) AS BIGINT) AS l,
         CAST(count(DISTINCT source) AS BIGINT) AS s
  FROM documents
)
SELECT {SQL_DSUM.format(x='''
         (CAST(c.o AS DOUBLE) - (CAST(r.nl AS DOUBLE) * ct.ns) / t.n)
         * (CAST(c.o AS DOUBLE) - (CAST(r.nl AS DOUBLE) * ct.ns) / t.n)
         / ((CAST(r.nl AS DOUBLE) * ct.ns) / t.n)''')} AS chi2,
       min((t.l - 1) * (t.s - 1)) AS dof,
       min(t.n) AS n
FROM cells c
JOIN rowt r USING (lang)
JOIN colt ct USING (source)
CROSS JOIN tot t
ORDER BY 1
""",
    tags=("stats", "chi2", "contingency"),
)
def stats_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test on the lang x source
    contingency table: observed cell counts vs expected (row_total *
    col_total / N), summed over cells on the micro-unit grid so the
    statistic is deterministic under any partitioning. The contingency
    machinery (three small aggregates broadcast into a cells-sized
    join) is the scalable shape — the fact table is scanned once per
    marginal, and every post-scan frame is (langs x sources)-sized.
    Degrees of freedom derive from the marginal cardinalities."""
    docs = _t(spark, sf_dir, "documents").select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    rowt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("nl"))
    colt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    tot = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("lang").alias("l"),
        F.countDistinct("source").alias("s"),
    )
    e = (F.col("nl").cast("double") * F.col("ns")) / F.col("n")
    term = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    return (
        cells.join(F.broadcast(rowt), "lang")
        .join(F.broadcast(colt), "source")
        .crossJoin(F.broadcast(tot))
        .agg(
            dsum(term).alias("chi2"),
            F.min((F.col("l") - 1) * (F.col("s") - 1)).alias("dof"),
            F.min("n").alias("n"),
        )
        .orderBy("chi2")
    )

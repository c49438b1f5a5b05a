"""Round-3 seventeenth tranche: graph link prediction, greedy k-center
coreset selection, a multimodal text-embedding pairing pipeline, RAKE
keyword extraction, and last-touch conversion attribution.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs
with identical semantics; every score that mixes floats is either a
ratio of exact integers or a sum of per-term nano-quantized integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe.similarity import kcenter_select
from .datapipe import text as tx

_LP_ANCHOR_CAP = 200
_LP_MIN_COMMON = 2
_LP_TOPK = 20
_LP_MIN_W = 2  # edge weight threshold: co-purchased in >= 2 orders


def _sql_link_prediction() -> str:
    return f"""
WITH e AS (
  SELECT a.l_partkey AS x, b.l_partkey AS y
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_LP_MIN_W}
),
adj AS (
  SELECT x AS a, y AS n FROM e UNION ALL SELECT y AS a, x AS n FROM e
),
deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY a),
adjc AS (
  SELECT adj.a, adj.n FROM adj JOIN deg ON deg.node = adj.a
  WHERE deg.deg <= {_LP_ANCHOR_CAP}
),
wedge AS (
  SELECT a1.n AS u, a2.n AS v, CAST(count(*) AS BIGINT) AS common
  FROM adjc a1 JOIN adjc a2 ON a1.a = a2.a AND a1.n < a2.n
  GROUP BY a1.n, a2.n
  HAVING count(*) >= {_LP_MIN_COMMON}
),
nonedge AS (
  SELECT w.* FROM wedge w ANTI JOIN e ON w.u = e.x AND w.v = e.y
)
SELECT w.u, w.v, w.common AS common_neighbors,
       du.deg AS deg_u, dv.deg AS deg_v,
       round(CAST(w.common AS DOUBLE) / (du.deg + dv.deg - w.common), 9)
         AS jaccard_score
FROM nonedge w JOIN deg du ON du.node = w.u JOIN deg dv ON dv.node = w.v
ORDER BY jaccard_score DESC, common_neighbors DESC, u, v
LIMIT {_LP_TOPK}
"""


@register(
    "graph_link_prediction",
    oracle=_sql_link_prediction(),
    tags=("graph", "link-prediction"),
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor link prediction on the co-purchase graph: for
    unconnected part pairs sharing >= 2 neighbors, the neighborhood
    Jaccard score |N(u)∩N(v)| / |N(u)∪N(v)| — the classic
    recommendation/ER candidate generator. Wedges are generated through
    anchors capped at degree 200 (the winnowing max-df discipline:
    hubs contribute O(deg²) wedges and no signal — published link
    predictors log-discount or drop them), so the candidate volume is
    Σ min(deg, cap)² — linear in edges at fixed cap, never the raw
    Σ deg² that a celebrity node would explode at 100 TB. Everything is
    an equi-join on node ids; existing edges leave via a broadcast
    anti-join; the top-k is a TakeOrderedAndProject over a total order,
    with degrees taken from the UNcapped adjacency so scores are
    exact."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Two scale disciplines, both measured at sf0.1:
    #  - EDGE WEIGHT THRESHOLD (co-purchased in >= _LP_MIN_W orders):
    #    single-shared-order pairs are noise for prediction, and on a
    #    dense co-purchase graph they are 99.7% of edges (1.2M -> 3.9k
    #    at sf0.1, median degree 119). Without it the wedge enumeration
    #    is Sum(deg^2) ~ 300M rows — 62s; with it the graph is the
    #    signal subgraph and the whole entry is dominated by one
    #    co-occurrence groupBy. The published analog: association-rule
    #    min-support, CCNet's min-count vocabulary cut.
    #  - the edge frame is checkpointed: it feeds adj (x2), the
    #    anti-join, and transitively the degree frames.
    e = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("x"), F.col("b.l_partkey").alias("y")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _LP_MIN_W)
        .select("x", "y")
        .localCheckpoint(eager=True)
    )
    adj = e.select(F.col("x").alias("a"), F.col("y").alias("n")).unionAll(
        e.select(F.col("y").alias("a"), F.col("x").alias("n"))
    )
    deg = adj.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=True)
    adjc = adj.join(
        deg.filter(F.col("deg") <= _LP_ANCHOR_CAP).select("node"),
        adj["a"] == F.col("node"),
    ).select("a", "n").localCheckpoint(eager=True)
    wedge = (
        adjc.alias("a1")
        .join(adjc.alias("a2"), "a")
        .filter(F.col("a1.n") < F.col("a2.n"))
        .groupBy(F.col("a1.n").alias("u"), F.col("a2.n").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= _LP_MIN_COMMON)
    )
    nonedge = wedge.join(
        e, (wedge["u"] == e["x"]) & (wedge["v"] == e["y"]), "left_anti"
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    scored = (
        nonedge.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.col("common").alias("common_neighbors"),
            "deg_u",
            "deg_v",
            F.round(
                F.col("common").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common")),
                9,
            ).alias("jaccard_score"),
        )
    )
    return scored.orderBy(
        F.desc("jaccard_score"), F.desc("common_neighbors"), "u", "v"
    ).limit(_LP_TOPK)


_KC_K = 8


def _sql_kcenter(k: int = _KC_K) -> str:
    def qdist(v: str, c: str) -> str:
        d = f"(CAST({v}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))"
        return (
            f"CAST(list_sum(list_transform(range(1, len({v}) + 1), "
            f"i -> CAST(round({d} * {d} * 1e9) AS BIGINT))) AS BIGINT)"
        )

    parts = [
        "WITH x AS (SELECT vec_id AS pid, embedding AS vec FROM embeddings)",
        "s0 AS (SELECT min(pid) AS sid FROM x)",
        "c0 AS (SELECT vec AS cv FROM x, s0 WHERE pid = sid)",
        f"m0 AS (SELECT pid, vec, {qdist('vec', 'cv')} AS mind, 0 AS arank FROM x, c0)",
    ]
    for i in range(1, k):
        p = f"p{i}"
        parts.append(
            f"{p} AS (SELECT pid AS sid, mind AS chosen FROM m{i-1}"
            f" ORDER BY mind DESC, pid LIMIT 1)"
        )
        parts.append(f"c{i} AS (SELECT vec AS cv FROM x, {p} WHERE pid = sid)")
        parts.append(
            f"m{i} AS (SELECT m.pid, m.vec,"
            f" CASE WHEN d.nd < m.mind THEN d.nd ELSE m.mind END AS mind,"
            f" CASE WHEN d.nd < m.mind THEN {i} ELSE m.arank END AS arank"
            f" FROM m{i-1} m JOIN (SELECT pid, {qdist('vec', 'cv')} AS nd"
            f" FROM x, c{i}) d USING (pid))"
        )
    sel_rows = ["SELECT 0 AS rank, (SELECT sid FROM s0) AS pid, CAST(0 AS BIGINT) AS chosen_dq"]
    for i in range(1, k):
        sel_rows.append(
            f"SELECT {i}, (SELECT sid FROM p{i}), CAST((SELECT chosen FROM p{i}) AS BIGINT)"
        )
    parts.append("sel AS (" + "\nUNION ALL\n".join(sel_rows) + ")")
    parts.append(
        f"st AS (SELECT arank, CAST(count(*) AS BIGINT) AS n_assigned,"
        f" CAST(max(mind) AS BIGINT) AS max_radius_q FROM m{k-1} GROUP BY arank)"
    )
    body = ",\n".join(parts)
    return f"""
{body}
SELECT sel.rank, sel.pid AS vec_id, sel.chosen_dq,
       CAST(coalesce(st.n_assigned, 0) AS BIGINT) AS n_assigned,
       CAST(coalesce(st.max_radius_q, 0) AS BIGINT) AS max_radius_q
FROM sel LEFT JOIN st ON sel.rank = st.arank
ORDER BY sel.rank
"""


@register(
    "sample_kcenter_coreset",
    oracle=_sql_kcenter(),
    tags=("sampling", "coreset", "embeddings", "pruning"),
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection over the embeddings (Gonzalez
    2-approximation — the geometric data-pruning selector: pick the
    point farthest from everything picked so far, k times). The Spark
    loop is k map-only distance passes with 1-row argmax collects (the
    kmeans_cells / MLlib shape); distances are per-term nano-quantized
    integer sums, argmax ties break on vec_id, and reassignment needs
    STRICT improvement — so the DuckDB oracle replays the identical
    8-step trajectory as unrolled CTEs and every row hash-matches. The
    output is the coverage audit: each center with its selection
    distance, assigned-cell size, and cell radius."""
    emb = _t(spark, sf_dir, "embeddings")
    return kcenter_select(emb, "vec_id", "embedding", k=_KC_K)


def _sql_multimodal_pairs() -> str:
    ntok = "len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t != ''))"
    return f"""
WITH p AS (
  SELECT d.doc_id, e.label,
         CAST({ntok} AS INT) AS n_tokens,
         CAST(list_sum(list_transform(e.embedding,
              v -> CAST(round(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) * 1e9) AS BIGINT)))
            AS BIGINT) AS norm_q
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
  WHERE {ntok} >= 20
),
b AS (
  SELECT *, CASE WHEN n_tokens <= 32 THEN 32 WHEN n_tokens <= 64 THEN 64
                 WHEN n_tokens <= 128 THEN 128 ELSE 256 END AS bucket
  FROM p
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY bucket
                               ORDER BY n_tokens DESC, doc_id) AS rk
  FROM b
)
SELECT doc_id, label, n_tokens,
       round(sqrt(CAST(norm_q AS DOUBLE) / 1e9), 6) AS emb_norm,
       bucket,
       CAST((rk - 1) // 8 AS BIGINT) AS batch_id,
       CAST((rk - 1) % 8 AS BIGINT) AS slot
FROM r ORDER BY doc_id
"""


@register(
    "pipeline_multimodal_pairs",
    oracle=_sql_multimodal_pairs(),
    tags=("multimodal", "pipeline", "packing"),
)
def pipeline_multimodal_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-style paired-dataset build: join captions (documents) to
    their embedding rows 1:1, gate on a minimum caption length, audit
    the embedding norm (nano-quantized exact integer), and pack the
    surviving pairs into fixed-size batches within power-of-two length
    buckets (the pad-efficiency layout from pack_sequences_bucketed,
    8 pairs/batch). One broadcast-joinable dimension (embeddings at
    doc granularity co-keyed with documents — at 100 TB this is the
    bucketed co-located join, both tables bucketed by doc_id), one
    window per bucket over rank only. The multimodal story's
    text-side twin of the binary decode plumbing in
    datapipe/multimodal.py."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    ntok = F.size(tx.tokens("text"))
    p = (
        docs.join(emb, docs["doc_id"] == emb["vec_id"])
        .select(
            "doc_id",
            "label",
            ntok.cast("int").alias("n_tokens"),
            F.aggregate(
                F.transform(
                    "embedding",
                    lambda v: F.round(
                        v.cast("double") * v.cast("double") * 1e9
                    ).cast("bigint"),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, t: acc + t,
            ).alias("norm_q"),
        )
        .filter(F.col("n_tokens") >= 20)
    )
    b = p.withColumn(
        "bucket",
        F.when(F.col("n_tokens") <= 32, 32)
        .when(F.col("n_tokens") <= 64, 64)
        .when(F.col("n_tokens") <= 128, 128)
        .otherwise(256),
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("n_tokens"), "doc_id")
    r = b.withColumn("rk", F.row_number().over(w))
    return r.select(
        "doc_id",
        "label",
        "n_tokens",
        F.round(F.sqrt(F.col("norm_q").cast("double") / 1e9), 6).alias("emb_norm"),
        "bucket",
        F.floor((F.col("rk") - 1) / 8).alias("batch_id"),
        ((F.col("rk") - 1) % 8).cast("bigint").alias("slot"),
    ).orderBy("doc_id")


_RAKE_STOPWORDS = ("a", "the")


def _sql_rake() -> str:
    stop = "|".join(_RAKE_STOPWORDS)
    marked = f"regexp_replace(lower(trim(text)), '\\b(?:{stop})\\b', '|', 'g')"
    return f"""
WITH ph AS (
  SELECT doc_id, g AS pos, trim(parts[g + 1]) AS phrase
  FROM (SELECT doc_id, string_split({marked}, '|') AS parts FROM documents),
       unnest(generate_series(0, len(parts) - 1)) AS u(g)
  WHERE trim(parts[g + 1]) != ''
),
pt AS (
  SELECT doc_id, pos, phrase,
         list_filter(regexp_split_to_array(phrase, '\\s+'), t -> t != '') AS toks
  FROM ph
),
pw AS (
  SELECT doc_id, pos, phrase, len(toks) AS plen, unnest(toks) AS word
  FROM pt
),
ws AS (
  SELECT doc_id, word,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(plen) AS BIGINT) AS deg
  FROM pw GROUP BY doc_id, word
),
sc AS (
  SELECT pw.doc_id, pw.pos, pw.phrase,
         CAST(sum(CAST(round(CAST(ws.deg AS DOUBLE) / ws.freq * 1e9) AS BIGINT))
           AS BIGINT) AS score_q
  FROM pw JOIN ws ON pw.doc_id = ws.doc_id AND pw.word = ws.word
  GROUP BY pw.doc_id, pw.pos, pw.phrase
),
rk AS (
  SELECT doc_id, phrase, score_q,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_q DESC, pos) AS rn
  FROM sc
)
SELECT doc_id, phrase AS top_phrase,
       round(score_q / 1e9, 9) AS rake_score
FROM rk WHERE rn = 1 ORDER BY doc_id
"""


@register(
    "text_keyword_rake",
    oracle=_sql_rake(),
    tags=("text", "keywords", "rake"),
)
def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal token runs between stopwords; each word scores deg/freq
    (deg = Σ length of phrases containing it), a phrase scores the sum
    of its word scores, and the top phrase per doc wins. Stopword
    boundaries are a single portable regexp_replace→split (Java∩RE2
    \\b), word scores are ratios of exact integers quantized to nano
    before the phrase sum — order-free integer reduction. Everything
    shuffles on (doc_id[, word]): per-doc statistics only, no global
    state, embarrassingly parallel at any corpus size."""
    docs = _t(spark, sf_dir, "documents")
    stop = "|".join(_RAKE_STOPWORDS)
    marked = F.regexp_replace(
        F.lower(F.trim("text")), rf"\b(?:{stop})\b", "|"
    )
    ph = (
        docs.select("doc_id", F.posexplode(F.split(marked, r"\|")).alias("pos", "raw"))
        .select("doc_id", "pos", F.trim("raw").alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    pt = ph.withColumn(
        "toks", F.filter(F.split("phrase", r"\s+"), lambda t: t != "")
    )
    pw = pt.select(
        "doc_id",
        "pos",
        "phrase",
        F.size("toks").alias("plen"),
        F.explode("toks").alias("word"),
    )
    ws = pw.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("deg")
    )
    sc = (
        pw.join(ws, ["doc_id", "word"])
        .groupBy("doc_id", "pos", "phrase")
        .agg(
            F.sum(
                F.round(F.col("deg").cast("double") / F.col("freq") * 1e9).cast(
                    "bigint"
                )
            ).alias("score_q")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_q"), "pos")
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("phrase").alias("top_phrase"),
            F.round(F.col("score_q") / 1e9, 9).alias("rake_score"),
        )
        .orderBy("doc_id")
    )


_ATTR_WINDOW_US = 7 * 86400 * 1_000_000


def _sql_attribution() -> str:
    return f"""
WITH w AS (
  SELECT event_id, ts, user_id, event_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_us,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type
  FROM events
)
SELECT CASE WHEN lt_us IS NULL OR epoch_us(ts) - lt_us > {_ATTR_WINDOW_US}
            THEN 'direct' ELSE lt_type END AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases
FROM w WHERE event_type = 'purchase'
GROUP BY 1 ORDER BY channel
"""


@register(
    "events_attribution_last_touch",
    oracle=_sql_attribution(),
    tags=("attribution", "window", "marketing"),
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase is credited to
    the user's most recent non-purchase event within a 7-day lookback,
    else 'direct'. One per-user ordered window (total order
    (ts, event_id)) with ignoreNulls last_value over the
    preceding-exclusive frame — the same single shuffle the
    sessionizer uses; the lookback compare is exact integer
    microseconds. The output is the channel mix a marketing pipeline
    reports."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    np_us = F.when(F.col("event_type") != "purchase", F.unix_micros("ts"))
    np_ty = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    enriched = ev.select(
        "event_id",
        "ts",
        "event_type",
        F.last(np_us, ignorenulls=True).over(w).alias("lt_us"),
        F.last(np_ty, ignorenulls=True).over(w).alias("lt_type"),
    )
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("lt_us").isNull()
                | (F.unix_micros("ts") - F.col("lt_us") > _ATTR_WINDOW_US),
                F.lit("direct"),
            )
            .otherwise(F.col("lt_type"))
            .alias("channel")
        )
        .groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("channel")
    )

"""Round-3 twenty-fourth tranche: hard-negative mining for contrastive
training, funnel stage-transition latency, month-over-month /
year-over-year growth, and hashing-trick feature vectorization.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs with
identical semantics; cosines on the shared 9 dp grid, latencies as exact
integer-µs ratios, growth as ratios of exact micro-sums."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import text as tx
from .datapipe.hashing import hash60, sql_hash60
from .datapipe.similarity import cosine
from .datapipe.util import fan_out

_SQL_COS = "round(list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[]), 9)"


# --------------------------------------------------------------------------
# Hard-negative mining (contrastive-training batch construction)
# --------------------------------------------------------------------------

_HN_QUERIES = 20
_HN_K = 3

_SQL_HARD_NEG = f"""
WITH q AS (
  SELECT vec_id AS q_id, label AS q_label, embedding AS qvec
  FROM embeddings WHERE vec_id < {_HN_QUERIES}
),
scored AS (
  SELECT q.q_id, q.q_label, e.vec_id AS neg_id, e.label AS neg_label,
         {_SQL_COS.format(a='q.qvec', b='e.embedding')} AS cos
  FROM embeddings e CROSS JOIN q
  WHERE e.label != q.q_label
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neg_id) AS rank
  FROM scored
)
SELECT q_id, CAST(rank AS BIGINT) AS rank, neg_id, cos,
       CAST(q_label AS BIGINT) AS q_label, CAST(neg_label AS BIGINT) AS neg_label
FROM ranked WHERE rank <= {_HN_K}
ORDER BY q_id, rank
"""


@register(
    "sample_hard_negatives",
    oracle=_SQL_HARD_NEG,
    tags=("sampling", "similarity", "ml"),
)
def sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: for each anchor embedding, the top-k most
    similar vectors with a DIFFERENT label — the batch-construction step
    that makes contrastive/triplet training converge (easy negatives
    carry no gradient). Scoring is anchor-broadcast over the corpus with
    the label-mismatch filter applied before ranking; ranking is a
    per-anchor window over (cos desc, id). The scalable variant mines
    within IVF cells (similarity.py) — the top-k contract is unchanged.
    Cosines live on the catalog's shared 9 dp grid."""
    emb = _t(spark, sf_dir, "embeddings")
    vecd = F.transform("embedding", lambda x: x.cast("double"))
    q = emb.filter(F.col("vec_id") < _HN_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        vecd.alias("qvec"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        vecd.alias("nvec"),
    )
    scored = (
        fan_out(corpus)
        .crossJoin(F.broadcast(q))
        .filter(F.col("neg_label") != F.col("q_label"))
        .select(
            "q_id",
            "q_label",
            "neg_id",
            "neg_label",
            cosine(F.col("qvec"), F.col("nvec")).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "neg_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _HN_K)
        .select(
            "q_id",
            "rank",
            "neg_id",
            "cos",
            F.col("q_label").cast("bigint").alias("q_label"),
            F.col("neg_label").cast("bigint").alias("neg_label"),
        )
        .orderBy("q_id", "rank")
    )


# --------------------------------------------------------------------------
# Funnel stage-transition latency
# --------------------------------------------------------------------------

_SQL_FUNNEL_LATENCY = """
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
  GROUP BY e.user_id
),
lat AS (
  SELECT v.user_id,
         round((c.t2 - v.t1) / 60000000.0, 9) AS view_to_click_min,
         round((p.t3 - c.t2) / 60000000.0, 9) AS click_to_purchase_min
  FROM v LEFT JOIN c ON c.user_id = v.user_id
         LEFT JOIN p ON p.user_id = c.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_viewers,
       CAST(count(view_to_click_min) AS BIGINT) AS n_clicked,
       CAST(count(click_to_purchase_min) AS BIGINT) AS n_purchased,
       round(quantile_cont(view_to_click_min, 0.5), 6) AS p50_view_to_click_min,
       round(quantile_cont(view_to_click_min, 0.9), 6) AS p90_view_to_click_min,
       round(quantile_cont(click_to_purchase_min, 0.5), 6) AS p50_click_to_purchase_min,
       round(quantile_cont(click_to_purchase_min, 0.9), 6) AS p90_click_to_purchase_min
FROM lat
"""


@register(
    "events_funnel_latency",
    oracle=_SQL_FUNNEL_LATENCY,
    tags=("events", "funnel", "latency"),
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert through the ordered view→click→purchase funnel:
    per user, the first click strictly AFTER the first view and the
    first purchase strictly after that click (the ordered-stage
    discipline of events_funnel_stages, now with latencies). Latencies
    are exact integer-µs differences; the summary reports conversion
    counts and exact p50/p90 minutes. Three per-user min-aggregates and
    two broadcast-sized joins — at scale each stage frame is
    users-sized, never events-sized."""
    ev = _t(spark, sf_dir, "events")

    def first_after(etype: str, prev, prev_t: str, alias: str):
        e = ev.filter(F.col("event_type") == etype).select(
            "user_id", F.unix_micros("ts").alias("t")
        )
        return (
            e.join(prev, "user_id")
            .filter(F.col("t") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("t").alias(alias))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    lat = (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            F.round((F.col("t2") - F.col("t1")) / 60000000.0, 9).alias(
                "view_to_click_min"
            ),
            F.round((F.col("t3") - F.col("t2")) / 60000000.0, 9).alias(
                "click_to_purchase_min"
            ),
        )
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_viewers"),
        F.count("view_to_click_min").alias("n_clicked"),
        F.count("click_to_purchase_min").alias("n_purchased"),
        F.round(F.percentile("view_to_click_min", 0.5), 6).alias(
            "p50_view_to_click_min"
        ),
        F.round(F.percentile("view_to_click_min", 0.9), 6).alias(
            "p90_view_to_click_min"
        ),
        F.round(F.percentile("click_to_purchase_min", 0.5), 6).alias(
            "p50_click_to_purchase_min"
        ),
        F.round(F.percentile("click_to_purchase_min", 0.9), 6).alias(
            "p90_click_to_purchase_min"
        ),
    )


# --------------------------------------------------------------------------
# MoM / YoY growth
# --------------------------------------------------------------------------

_SQL_MOM_YOY = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
),
g AS (
  SELECT month, rev_cents,
         lag(rev_cents, 1) OVER (ORDER BY month) AS prev_m,
         lag(rev_cents, 12) OVER (ORDER BY month) AS prev_y
  FROM monthly
)
SELECT month, rev_cents,
       round(CASE WHEN prev_m IS NULL THEN NULL
                  ELSE (rev_cents - prev_m) * 100.0 / prev_m END, 6) AS mom_pct,
       round(CASE WHEN prev_y IS NULL THEN NULL
                  ELSE (rev_cents - prev_y) * 100.0 / prev_y END, 6) AS yoy_pct
FROM g ORDER BY month
"""


@register(
    "growth_mom_yoy",
    oracle=_SQL_MOM_YOY,
    tags=("growth", "window", "timeseries"),
)
def growth_mom_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth: monthly exact
    integer-cent sums, then lag(1)/lag(12) over the month spine — the KPI
    pair every revenue dashboard leads with. The window state is
    months-sized (constant at any data scale); percents are ratios of
    exact integers rounded at 6 dp. Calendar months come from
    date_trunc, so month boundaries agree across engines (UTC-pinned)."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(F.trunc("o_orderdate", "month").alias("month")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents")
    )
    w = Window.orderBy("month")
    g = monthly.select(
        "month",
        "rev_cents",
        F.lag("rev_cents", 1).over(w).alias("prev_m"),
        F.lag("rev_cents", 12).over(w).alias("prev_y"),
    )
    pct = lambda cur, prev: F.round(  # noqa: E731
        (cur - prev) * 100.0 / prev, 6
    )
    return g.select(
        "month",
        "rev_cents",
        pct(F.col("rev_cents"), F.col("prev_m")).alias("mom_pct"),
        pct(F.col("rev_cents"), F.col("prev_y")).alias("yoy_pct"),
    ).orderBy("month")


# --------------------------------------------------------------------------
# Hashing-trick feature vectorization
# --------------------------------------------------------------------------

_FH_DIMS = 32
_FH_MAX_DOC = 100


def _sql_feature_hashing() -> str:
    toks = tx.sql_tokens("text")
    h = sql_hash60("tok")
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({toks}) AS tok
  FROM documents WHERE doc_id < {_FH_MAX_DOC}
),
cnt AS (
  SELECT doc_id, ({h}) % {_FH_DIMS} AS dim, CAST(count(*) AS BIGINT) AS cnt
  FROM tok GROUP BY 1, 2
),
norm AS (
  SELECT doc_id, CAST(sum(cnt * cnt) AS BIGINT) AS ss FROM cnt GROUP BY doc_id
)
SELECT c.doc_id, CAST(c.dim AS BIGINT) AS dim, c.cnt,
       round(c.cnt / sqrt(CAST(n.ss AS DOUBLE)), 9) AS l2_value
FROM cnt c JOIN norm n ON n.doc_id = c.doc_id
ORDER BY c.doc_id, dim
"""


@register(
    "text_feature_hashing",
    oracle=_sql_feature_hashing(),
    tags=("text", "features", "ml"),
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorization (the HashingVectorizer standard): each
    token maps to dim = h(token) mod {_FH_DIMS} with the portable
    md5-60bit family, per-doc dimension counts are L2-normalized, and
    the output is the LONG (doc, dim, value) form — the layout a sparse
    trainer ingests and the one that shuffles ints, never vocabulary
    strings. No vocabulary pass, no fitting: the property that makes the
    trick work on unbounded streams. Norms are exact integer
    sum-of-squares under IEEE sqrt."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < _FH_MAX_DOC)
    tok = docs.select("doc_id", F.explode(tx.tokens("text")).alias("tok"))
    cnt = tok.groupBy(
        "doc_id", F.pmod(hash60(F.col("tok")), F.lit(_FH_DIMS)).alias("dim")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    norm = cnt.groupBy("doc_id").agg(F.sum(F.col("cnt") * F.col("cnt")).alias("ss"))
    return (
        cnt.join(norm, "doc_id")
        .select(
            "doc_id",
            F.col("dim").cast("bigint").alias("dim"),
            "cnt",
            F.round(F.col("cnt") / F.sqrt(F.col("ss").cast("double")), 9).alias(
                "l2_value"
            ),
        )
        .orderBy("doc_id", "dim")
    )

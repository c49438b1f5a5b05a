"""Round-6 additions, part 16: k-anonymity audit over a
quasi-identifier tuple, inter-arrival burstiness (Goh-Barabasi), and
best-window snippet extraction for search results.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle SQL) pairs with identical semantics — exact-integer
sufficient statistics, total orderings at every row selection —
hash-compared at sf0.01 by the driver.

Reference parity: the reference (analyse.py) has none of these; they
extend the privacy family (``text_pii_redact``'s structural sibling:
redaction removes direct identifiers, k-anonymity audits the QUASI
identifiers left behind), the traffic-analytics family
(``events_dau_streaks`` / ``text_burstiness``), and the search family
(BM25/QL rank, the snippet entry presents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .catalog_r3c import _BM25_TERMS
from .datapipe import text as tx

# --------------------------------------------------------------------------
# k-anonymity audit over (nation, mktsegment, balance-band)
# --------------------------------------------------------------------------

_KANON_K = 5  # the conventional disclosure-risk threshold
_KANON_BAND = 100_000  # acctbal band width in cents (1000 currency units)


def _sql_kanon() -> str:
    return f"""
WITH qid AS (
  SELECT c_nationkey,
         c_mktsegment,
         CAST(floor(CAST(round(c_acctbal * 100.0) AS BIGINT)
                    / {_KANON_BAND}.0) AS BIGINT) AS bal_band
  FROM customer
),
classes AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
         CAST(count(*) AS BIGINT) AS k
  FROM qid GROUP BY 1, 2, 3
)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_rows,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(count(*) FILTER (WHERE k < {_KANON_K}) AS BIGINT)
         AS classes_below_k,
       CAST(sum(k) FILTER (WHERE k < {_KANON_K}) AS BIGINT)
         AS rows_below_k,
       round(coalesce(sum(k) FILTER (WHERE k < {_KANON_K}), 0)
             / CAST(sum(k) AS DOUBLE), 9) AS at_risk_fraction,
       CAST(count(*) FILTER (WHERE k = 1) AS BIGINT) AS singletons
FROM classes
"""


@register(
    "privacy_k_anonymity_audit",
    oracle=_sql_kanon(),
    tags=("privacy", "k-anonymity", "data-quality"),
)
def privacy_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the
    quasi-identifier tuple (nation, market segment, 1000-unit balance
    band): the size distribution of equivalence classes, the minimum k
    (the table's k-anonymity level), and the row mass in classes below
    k=5 — the disclosure-risk readout a release pipeline runs AFTER
    direct-identifier redaction (``text_pii_redact``'s structural
    sibling: quasi-identifiers re-identify via linkage even with PII
    gone; Sweeney's k-anonymity is the standard audit).

    Exactness: the balance band is integer-floor arithmetic on exact
    cents; class sizes and every summary cell are exact BIGINTs from
    one groupBy + one aggregate; the FILTERed sum is coalesced to 0 so
    a fully-anonymous table reads 0.0 risk, not NULL.

    Scale shape: ONE map-side-combined groupBy to the class frame
    (rows = distinct QID tuples, bounded by the attribute-domain
    product, not the table), then a 1-row combine."""
    c = _t(spark, sf_dir, "customer")
    qid = c.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(
            F.round(F.col("c_acctbal") * 100.0).cast("bigint") / float(_KANON_BAND)
        )
        .cast("bigint")
        .alias("bal_band"),
    )
    classes = qid.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    below = F.when(F.col("k") < _KANON_K, F.col("k"))
    return classes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("k").cast("bigint").alias("n_rows"),
        F.min("k").cast("bigint").alias("min_k"),
        F.count(F.when(F.col("k") < _KANON_K, 1))
        .cast("bigint")
        .alias("classes_below_k"),
        F.sum(below).cast("bigint").alias("rows_below_k"),
        F.round(
            F.coalesce(F.sum(below), F.lit(0)) / F.sum("k").cast("double"), 9
        ).alias("at_risk_fraction"),
        F.count(F.when(F.col("k") == 1, 1)).cast("bigint").alias("singletons"),
    )


# --------------------------------------------------------------------------
# Inter-arrival burstiness per event type (Goh-Barabasi B in [-1, 1])
# --------------------------------------------------------------------------


def _sql_burstiness() -> str:
    return """
WITH ordered AS (
  SELECT event_type, user_id, epoch_us(ts) AS tu, event_id
  FROM events
),
gaps AS (
  SELECT event_type,
         tu - lag(tu) OVER (PARTITION BY user_id, event_type
                            ORDER BY tu, event_id) AS gap
  FROM ordered
),
g AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(CAST(gap AS HUGEINT)) AS DOUBLE) AS s,
         CAST(sum(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS ss
  FROM gaps WHERE gap IS NOT NULL GROUP BY event_type
),
m AS (
  SELECT event_type, n_gaps,
         s / n_gaps AS mean_gap,
         sqrt(greatest(ss / n_gaps - (s / n_gaps) * (s / n_gaps), 0.0)) AS sd_gap
  FROM g
)
SELECT event_type, n_gaps,
       round(mean_gap / 1e6, 6) AS mean_gap_sec,
       round(sd_gap / mean_gap, 9) AS cv,
       round((sd_gap / mean_gap - 1.0) / (sd_gap / mean_gap + 1.0), 9)
         AS burstiness
FROM m ORDER BY event_type
"""


@register(
    "events_interarrival_burstiness",
    oracle=_sql_burstiness(),
    tags=("events", "timeseries", "burstiness"),
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival burstiness per event type: per-(user, type) gap
    sequence via a partitioned lag, then the Goh-Barabasi burstiness
    B = (cv - 1)/(cv + 1) of the gap distribution — B ~ -1 for a
    metronome, 0 for a Poisson process, -> 1 for heavy-tailed bursts.
    The traffic-shape readout capacity planning and bot detection run
    (``text_burstiness`` is the token-frequency analog; this is the
    temporal one).

    Exactness: gaps are exact integer microseconds from a lag window
    with a (ts, event_id) total order; per-type moments accumulate in
    HUGEINT/decimal(38,0); population variance via the E[x²]-E[x]²
    identity with a greatest(_, 0) clamp — single double expressions
    with identical association order.

    Scale shape: ONE window partitioned by (user, type) — the W1
    lag-delta machinery, no global sort — then a map-side-combined
    per-type aggregate to a handful of rows."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", F.unix_micros("ts").alias("tu"), "event_id"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("tu", "event_id")
    gaps = ev.select(
        "event_type", (F.col("tu") - F.lag("tu").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    gd = F.col("gap").cast("decimal(38,0)")
    g = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum(gd).cast("double").alias("s"),
        F.sum(gd * F.col("gap")).cast("double").alias("ss"),
    )
    mean_gap = F.col("s") / F.col("n_gaps")
    sd_gap = F.sqrt(
        F.greatest(
            F.col("ss") / F.col("n_gaps") - mean_gap * mean_gap, F.lit(0.0)
        )
    )
    m = g.select(
        "event_type",
        "n_gaps",
        mean_gap.alias("mean_gap"),
        sd_gap.alias("sd_gap"),
    )
    cv = F.col("sd_gap") / F.col("mean_gap")
    return m.select(
        "event_type",
        "n_gaps",
        F.round(F.col("mean_gap") / 1e6, 6).alias("mean_gap_sec"),
        F.round(cv, 9).alias("cv"),
        F.round((cv - 1.0) / (cv + 1.0), 9).alias("burstiness"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# Best-window snippet extraction for the BM25 query
# --------------------------------------------------------------------------

_SNIP_WINDOW = 10  # snippet width in tokens
_SNIP_DOCS = 10  # present snippets for the top-N docs by hit count


def _sql_snippet() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
WITH tl AS (
  SELECT doc_id, {tx.sql_tokens('text')} AS t FROM documents
),
toks AS (
  SELECT doc_id, u['pos'] AS pos, u['w'] AS w FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) + 1),
                                 i -> {{'pos': i, 'w': t[i]}})) AS u
    FROM tl
  )
),
hits AS (
  SELECT doc_id, pos FROM toks WHERE w IN ({terms})
),
doc_hits AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS total_hits
  FROM hits GROUP BY doc_id
  ORDER BY total_hits DESC, doc_id LIMIT {_SNIP_DOCS}
),
windows AS (
  SELECT a.doc_id, a.pos AS win_start,
         CAST(count(*) AS BIGINT) AS win_hits
  FROM hits a
  JOIN doc_hits d USING (doc_id)
  JOIN hits b ON b.doc_id = a.doc_id
             AND b.pos >= a.pos AND b.pos < a.pos + {_SNIP_WINDOW}
  GROUP BY a.doc_id, a.pos
),
best AS (
  SELECT doc_id, win_start, win_hits FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY win_hits DESC, win_start) AS rn
    FROM windows
  ) WHERE rn = 1
)
SELECT b.doc_id, d.total_hits, b.win_start, b.win_hits
FROM best b JOIN doc_hits d USING (doc_id)
ORDER BY d.total_hits DESC, b.doc_id
"""


@register(
    "search_snippet_extraction",
    oracle=_sql_snippet(),
    tags=("search", "snippet", "highlighting"),
)
def search_snippet_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-window snippet selection for the BM25 query terms: for the
    top-10 documents by query-term hit count, the 10-token
    window containing the most hits (windows anchored at hit positions
    — the optimal window always starts at a hit, so anchoring is
    lossless) — the highlighting/snippet step every search UI runs
    after ranking.

    Scale shape: the token stream is filtered to QUERY-TERM positions
    before any join (the posting-list projection — hits per doc are a
    handful of ints, never the text); the candidate-doc cut is a
    TakeOrdered over the doc-hit frame; window scoring is a bounded
    self-join of the hit-position lists of ONLY the 10
    candidate docs (per-doc cost = hits², hits <= doc query-term
    count); the per-doc argmax is a rank window partitioned by doc
    with a (hits desc, start) total order.

    Exactness: positions and hit counts are exact integers end-to-end;
    ordering keys are total everywhere."""
    docs = _t(spark, sf_dir, "documents")
    # positional token stream (1-based pos, whitespace convention —
    # matches the oracle's generate_subscripts over the same list)
    toks = docs.select(
        "doc_id", F.posexplode(tx.tokens("text")).alias("pos0", "w")
    ).select("doc_id", "w", (F.col("pos0") + 1).alias("pos"))
    hits = toks.filter(F.col("w").isin(*_BM25_TERMS)).select("doc_id", "pos")
    doc_hits = (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("total_hits"))
        .orderBy(F.desc("total_hits"), "doc_id")
        .limit(_SNIP_DOCS)
    )
    cand = hits.join(F.broadcast(doc_hits.select("doc_id")), "doc_id")
    windows = (
        cand.alias("a")
        .join(
            cand.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.pos") >= F.col("a.pos"))
            & (F.col("b.pos") < F.col("a.pos") + _SNIP_WINDOW),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"), F.col("a.pos").alias("win_start"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("win_hits"))
    )
    wr = Window.partitionBy("doc_id").orderBy(F.desc("win_hits"), "win_start")
    best = (
        windows.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select("doc_id", "win_start", "win_hits")
    )
    return (
        best.join(F.broadcast(doc_hits), "doc_id")
        .select("doc_id", "total_hits", "win_start", "win_hits")
        .orderBy(F.desc("total_hits"), "doc_id")
    )

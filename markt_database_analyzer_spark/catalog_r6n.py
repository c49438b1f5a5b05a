"""Round-6 additions, part 14: Adamic-Adar link prediction, the
sample-ratio-mismatch gate, Herfindahl-Hirschman market concentration,
and a best-F1 operating-point sweep over the exact score domain.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle SQL) pairs with identical semantics — exact-integer
sufficient statistics, nano-quantized log terms before cross-row sums,
total orderings at every row selection — hash-compared at sf0.01 by
the driver.

Reference parity: the reference (analyse.py) has none of these; they
complete the graph family (``graph_link_prediction``'s log-discounted
twin), the experimentation suite (the SRM gate that must PASS before
CUPED/TOST/effect-size readouts mean anything), the market-analytics
family (``parts_abc_pareto``'s concentration companion), and the
classifier-eval family (``eval_roc_auc``'s operating-point selector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t
from .catalog_r3p import _LP_ANCHOR_CAP, _LP_MIN_COMMON, _LP_MIN_W, _LP_TOPK
from .datapipe import text as tx
from .datapipe.hashing import hash60, sql_hash60
from .operators.equidepth import value_counts_cum

# --------------------------------------------------------------------------
# Adamic-Adar link prediction (log-discounted common neighbors)
# --------------------------------------------------------------------------


def _sql_adamic_adar() -> str:
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
  SELECT adj.a, adj.n, d.deg AS adeg
  FROM adj JOIN deg d ON d.node = adj.a
  WHERE d.deg <= {_LP_ANCHOR_CAP}
),
wedge AS (
  SELECT a1.n AS u, a2.n AS v,
         CAST(count(*) AS BIGINT) AS common,
         CAST(sum(CAST(round(1e9 / ln(CAST(a1.adeg AS DOUBLE))) AS HUGEINT))
              AS BIGINT) AS aaq
  FROM adjc a1 JOIN adjc a2 ON a1.a = a2.a AND a1.n < a2.n
  GROUP BY a1.n, a2.n
  HAVING count(*) >= {_LP_MIN_COMMON}
),
nonedge AS (
  SELECT w.* FROM wedge w ANTI JOIN e ON w.u = e.x AND w.v = e.y
)
SELECT u, v, common AS common_neighbors,
       round(aaq / 1e9, 9) AS adamic_adar
FROM nonedge
ORDER BY adamic_adar DESC, common_neighbors DESC, u, v
LIMIT {_LP_TOPK}
"""


@register(
    "graph_adamic_adar",
    oracle=_sql_adamic_adar(),
    tags=("graph", "link-prediction", "adamic-adar"),
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction on the co-purchase graph — the
    log-discounted twin of ``graph_link_prediction`` (same edge-weight
    threshold, anchor cap, and min-common gate; cites its scale
    rationale): AA(u,v) = Σ_{{w ∈ N(u)∩N(v)}} 1/ln(deg(w)), the score
    that down-weights promiscuous anchors instead of merely capping
    them — the published stronger baseline for co-occurrence link
    prediction. Anchors inside a wedge have degree >= 2 by
    construction, so ln(deg) > 0 always.

    Exactness: each anchor's 1/ln(deg) contribution is nano-quantized
    BEFORE the per-pair sum (HUGEINT/decimal accumulator) with the
    anchor's degree taken from the capped adjacency row it generated
    the wedge from; the top-k is a TakeOrdered over the
    (score, common, u, v) total order.

    Scale shape: identical to the Jaccard entry — threshold-filtered
    edges, capped anchors (candidate volume Σ min(deg, cap)², linear in
    edges at fixed cap), equi-joins throughout, broadcast anti-join of
    existing edges."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
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
    )
    adjc = (
        adj.join(
            deg.filter(F.col("deg") <= _LP_ANCHOR_CAP),
            adj["a"] == F.col("node"),
        )
        .select("a", "n", F.col("deg").alias("adeg"))
        .localCheckpoint(eager=True)
    )
    aaq_term = F.round(F.lit(1e9) / F.log(F.col("a1.adeg").cast("double"))).cast(
        "decimal(38,0)"
    )
    wedge = (
        adjc.alias("a1")
        .join(adjc.alias("a2"), "a")
        .filter(F.col("a1.n") < F.col("a2.n"))
        .groupBy(F.col("a1.n").alias("u"), F.col("a2.n").alias("v"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(aaq_term).cast("bigint").alias("aaq"),
        )
        .filter(F.col("common") >= _LP_MIN_COMMON)
    )
    nonedge = wedge.join(
        e, (wedge["u"] == e["x"]) & (wedge["v"] == e["y"]), "left_anti"
    )
    return (
        nonedge.select(
            "u",
            "v",
            F.col("common").alias("common_neighbors"),
            F.round(F.col("aaq") / 1e9, 9).alias("adamic_adar"),
        )
        .orderBy(
            F.desc("adamic_adar"), F.desc("common_neighbors"), "u", "v"
        )
        .limit(_LP_TOPK)
    )


# --------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) gate for the hash split
# --------------------------------------------------------------------------

_SRM_SEED = 7  # the CUPED/TOST/effect-size split — the one being audited
_SRM_ALPHA = 0.001  # the conventional SRM alarm level

_PHI = "1.0 / (1.0 + exp(-1.5976 * ({z}) - 0.07056 * ({z}) * ({z}) * ({z})))"


def _sql_srm() -> str:
    arm = f"({sql_hash60('user_id::VARCHAR', seed=_SRM_SEED)} % 2)"
    phi = _PHI.format(z="sqrt(chi2)")
    return f"""
WITH u AS (
  SELECT user_id, {arm} AS arm FROM events GROUP BY 1, 2
),
c AS (
  SELECT CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n0,
         CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n1
  FROM u
),
s AS (
  SELECT n0, n1, (n0 + n1) / 2.0 AS expected,
         (n0 - (n0 + n1) / 2.0) * (n0 - (n0 + n1) / 2.0) / ((n0 + n1) / 2.0)
           + (n1 - (n0 + n1) / 2.0) * (n1 - (n0 + n1) / 2.0) / ((n0 + n1) / 2.0)
           AS chi2
  FROM c
)
SELECT n0, n1, round(expected, 1) AS expected_per_arm,
       round(chi2, 9) AS chi2,
       round(2.0 * (1.0 - {phi}), 6) AS p_value,
       CAST(CASE WHEN 2.0 * (1.0 - {phi}) < {_SRM_ALPHA} THEN 1 ELSE 0 END
            AS INT) AS srm_detected
FROM s
"""


@register(
    "stats_srm_check",
    oracle=_sql_srm(),
    tags=("stats", "experimentation", "srm", "data-quality"),
)
def stats_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch gate on the md5 hash split (the SAME
    seed-7 split the CUPED / TOST / effect-size entries read out): a
    1-df chi-square goodness-of-fit of the observed per-arm unit counts
    against the designed 50/50 allocation, alarmed at p < 0.001 — the
    FIRST check every experimentation platform runs, because a split
    that fails SRM invalidates every downstream readout. Unit = user
    (the randomization unit), counted once regardless of event volume.

    Exactness: the two arm counts are exact BIGINTs from one distinct
    aggregate; chi2 and p (Bowling logistic CDF, the BH-FDR/TOST
    convention) are single double expressions over those integers.

    Scale shape: one groupBy(user, arm) distinct shuffle (map-side
    combined), then a 2-cell combine to one row."""
    ev = _t(spark, sf_dir, "events").select("user_id")
    u = ev.groupBy(
        "user_id",
        F.pmod(
            hash60(F.col("user_id").cast("string"), seed=_SRM_SEED), F.lit(2)
        ).alias("arm"),
    ).agg(F.lit(1).alias("one"))
    c = u.agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("n0"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("n1"),
    )
    expected = (F.col("n0") + F.col("n1")) / 2.0
    chi2 = (F.col("n0") - expected) * (F.col("n0") - expected) / expected + (
        F.col("n1") - expected
    ) * (F.col("n1") - expected) / expected
    s = c.select("n0", "n1", expected.alias("expected"), chi2.alias("chi2"))
    z = F.sqrt(F.col("chi2"))
    phi = 1.0 / (1.0 + F.exp(F.lit(-1.5976) * z - F.lit(0.07056) * z * z * z))
    p = 2.0 * (1.0 - phi)
    return s.select(
        "n0",
        "n1",
        F.round(F.col("expected"), 1).alias("expected_per_arm"),
        F.round(F.col("chi2"), 9).alias("chi2"),
        F.round(p, 6).alias("p_value"),
        (p < _SRM_ALPHA).cast("int").alias("srm_detected"),
    )


# --------------------------------------------------------------------------
# Herfindahl-Hirschman market concentration per month
# --------------------------------------------------------------------------


def _sql_hhi() -> str:
    return """
WITH rev AS (
  SELECT date_trunc('month', l_shipdate) AS month, l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100.0)
                       AS BIGINT)) AS BIGINT) AS r
  FROM lineitem GROUP BY 1, 2
),
m AS (
  SELECT month,
         CAST(count(*) AS BIGINT) AS n_suppliers,
         CAST(sum(CAST(r AS HUGEINT)) AS DOUBLE) AS tot,
         CAST(sum(CAST(r AS HUGEINT) * r) AS DOUBLE) AS ssq
  FROM rev GROUP BY month
)
SELECT month, n_suppliers,
       round(tot / 100.0, 2) AS total_revenue,
       round(ssq / (tot * tot), 9) AS hhi,
       round((tot * tot) / ssq, 6) AS effective_suppliers
FROM m ORDER BY month
"""


@register(
    "stats_hhi_concentration",
    oracle=_sql_hhi(),
    tags=("stats", "finance", "concentration", "market"),
)
def stats_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of monthly supplier revenue:
    HHI = Σ share_i² — the antitrust/market-structure statistic — plus
    its reciprocal, the 'effective number of suppliers' (the
    participation-ratio form ecology and portfolio analytics use).
    ``parts_abc_pareto`` answers 'how much do the top sellers own';
    HHI answers 'how concentrated is the whole distribution' in one
    number per month.

    Exactness: per-(month, supplier) revenue is an exact integer cents
    sum; HHI = Σr_i² / (Σr_i)² is computed from TWO exact
    HUGEINT/decimal aggregates of those integers — no per-share
    division, no quantization anywhere — so the ratio is a single
    double expression over exact integers on both engines.

    Scale shape: one map-side-combined groupBy(month, supplier), then a
    months-sized aggregate; no window, no broadcast needed."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(
        F.date_trunc("month", "l_shipdate").alias("month"),
        "l_suppkey",
    ).agg(
        F.sum(
            F.round(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("r")
    )
    rd = F.col("r").cast("decimal(38,0)")
    m = rev.groupBy("month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum(rd).cast("double").alias("tot"),
        F.sum(rd * F.col("r")).cast("double").alias("ssq"),
    )
    return m.select(
        "month",
        "n_suppliers",
        F.round(F.col("tot") / 100.0, 2).alias("total_revenue"),
        F.round(F.col("ssq") / (F.col("tot") * F.col("tot")), 9).alias("hhi"),
        F.round((F.col("tot") * F.col("tot")) / F.col("ssq"), 6).alias(
            "effective_suppliers"
        ),
    ).orderBy("month")


# --------------------------------------------------------------------------
# Best-F1 operating point over the exact score domain
# --------------------------------------------------------------------------

_F1_STOPWORDS = "('the', 'a', 'of', 'and', 'is')"  # the ROC/kappa fixture


def _sql_f1_sweep() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         round(len(list_filter({toks}, t -> t IN {_F1_STOPWORDS}))
                 / CAST(len({toks}) AS DOUBLE), 9) AS v
  FROM documents
),
dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos,
         CAST(sum(count(*)) OVER (ORDER BY v) AS BIGINT) AS cumn,
         CAST(sum(sum(y)) OVER (ORDER BY v) AS BIGINT) AS cumpos
  FROM scored GROUP BY v
),
tot AS (
  SELECT CAST(max(cumn) AS BIGINT) AS n, CAST(max(cumpos) AS BIGINT) AS post
  FROM dom
),
cand AS (
  SELECT v AS threshold,
         n - cumn + cnt AS pred_pos,
         post - cumpos + pos AS tp,
         post,
         2.0 * (post - cumpos + pos)
           / CAST((n - cumn + cnt) + post AS DOUBLE) AS f1
  FROM dom, tot
)
SELECT threshold, pred_pos, tp,
       round(CAST(tp AS DOUBLE) / pred_pos, 9) AS precision_at,
       round(CAST(tp AS DOUBLE) / post, 9) AS recall_at,
       round(f1, 9) AS f1
FROM cand ORDER BY f1 DESC, threshold LIMIT 1
"""


@register(
    "eval_f1_threshold_sweep",
    oracle=_sql_f1_sweep(),
    tags=("eval", "ml", "threshold", "scale-path"),
)
def eval_f1_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-F1 operating point for the stopword-ratio classifier (the
    SAME 9-dp score as ``eval_roc_auc`` / ``eval_cohens_kappa``):
    every distinct score value is a candidate threshold (predict
    positive at score >= t); the sweep reports the threshold maximizing
    F1, with precision/recall at that point. ROC ranks, calibration
    checks probabilities, kappa fixes one threshold — this entry
    SELECTS the threshold, the last step before a filter ships
    (`text_quality`-style gates are tuned exactly this way).

    Exactness: candidate statistics are inclusive prefix sums of
    (count, positives) over the ascending distinct-score domain — exact
    integers (predicted-positive = n - cum + cnt, TP = pos_total -
    cumpos + pos) — and F1 uses the division-safe 2TP/(PP + P) identity
    (denominator >= 1 always), so every candidate row is exact until
    one final double ratio; the argmax is a TakeOrdered over the
    (f1 desc, threshold) total order.

    Scale shape: the ``ml_decision_stump_gini`` recipe — the
    distributed distinct-domain prefix sum (``value_counts_cum`` twice:
    unit and label weights; range-repartitioned, partitioned windows,
    broadcast offsets), candidate algebra on the domain-sized frame,
    TakeOrdered argmax. The oracle's global window is the semantic spec
    only."""
    docs = _t(spark, sf_dir, "documents")
    ts = tx.tokens("text")
    stop = F.filter(ts, lambda t: t.isin("the", "a", "of", "and", "is"))
    scored = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(F.size(stop) / F.size(ts).cast("double"), 9).alias("v"),
    ).localCheckpoint(eager=True)  # feeds both prefix sums
    cnt_cum, _ = value_counts_cum(scored, F.col("v"))
    pos_cum, _ = value_counts_cum(scored, F.col("v"), weight=F.col("y"))
    dom = cnt_cum.join(
        pos_cum.select(
            F.col("v").alias("v2"),
            F.col("cnt").alias("pos"),
            F.col("cum").alias("cumpos"),
        ),
        F.col("v") == F.col("v2"),
    ).select("v", "cnt", "cum", "pos", "cumpos")
    tot = dom.agg(
        F.max("cum").cast("bigint").alias("n"),
        F.max("cumpos").cast("bigint").alias("post"),
    )
    pp = F.col("n") - F.col("cum") + F.col("cnt")
    tp = F.col("post") - F.col("cumpos") + F.col("pos")
    cand = dom.crossJoin(F.broadcast(tot)).select(
        F.col("v").alias("threshold"),
        pp.alias("pred_pos"),
        tp.alias("tp"),
        "post",
        (2.0 * tp / (pp + F.col("post")).cast("double")).alias("f1"),
    )
    return (
        cand.select(
            "threshold",
            "pred_pos",
            "tp",
            F.round(F.col("tp").cast("double") / F.col("pred_pos"), 9).alias(
                "precision_at"
            ),
            F.round(F.col("tp").cast("double") / F.col("post"), 9).alias(
                "recall_at"
            ),
            F.round(F.col("f1"), 9).alias("f1"),
        )
        .orderBy(F.desc("f1"), "threshold")
        .limit(1)
    )

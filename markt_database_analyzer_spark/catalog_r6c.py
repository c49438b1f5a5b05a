"""Round-6 additions, part 3: rank-based k-group testing, retrieval MRR,
volatility bands, association effect size, inter-rater agreement, and
decile lift/gains — closing out the classical-evaluation family.

Every entry follows the catalog contract — a PySpark program plus a
DuckDB oracle replaying identical semantics (same tie-breaks, same
integer/rounding grid), hash-compared at sf0.01 by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, register, _t
from .datapipe import text as tx
from .functions import dsum
from .operators.equidepth import value_counts_cum

# --------------------------------------------------------------------------
# Kruskal-Wallis H test (rank-based k-group test; the nonparametric twin
# of stats_anova_oneway, with real ties exercised by integer quantities)
# --------------------------------------------------------------------------

_KW_GROUPS = ("A", "N", "R")


def _sql_kruskal() -> str:
    cols = []
    for i, g in enumerate(_KW_GROUPS):
        cols.append(f"CAST(count(*) FILTER (WHERE grp = '{g}') AS DOUBLE) AS n{i}")
        cols.append(
            f"CAST(sum(CAST(r2 AS HUGEINT)) FILTER (WHERE grp = '{g}') AS DOUBLE) AS s{i}"
        )
    k = len(_KW_GROUPS)
    nn = " + ".join(f"n{i}" for i in range(k))
    ts = " + ".join(f"s{i} * s{i} / n{i}" for i in range(k))
    h = f"3.0 / (({nn}) * (({nn}) + 1)) * ({ts}) - 3 * (({nn}) + 1)"
    tc = f"1 - tsum / (({nn}) * ({nn}) * ({nn}) - ({nn}))"
    return f"""
WITH pts AS (
  SELECT l_returnflag AS grp,
         CAST(round(l_quantity * 100.0) AS BIGINT) AS v
  FROM lineitem
),
dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(count(*)) OVER (ORDER BY v) AS BIGINT) AS cum
  FROM pts GROUP BY 1
),
r AS (SELECT v, CAST(2 * cum - cnt + 1 AS BIGINT) AS r2 FROM dom),
tie AS (
  SELECT CAST(sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS DOUBLE) AS tsum
  FROM dom
),
g AS (SELECT {', '.join(cols)} FROM pts JOIN r USING (v))
SELECT CAST({k} AS BIGINT) AS k, CAST({nn} AS BIGINT) AS n,
       round({h}, 6) AS h_stat,
       round({tc}, 9) AS tie_correction,
       round(({h}) / ({tc}), 6) AS h_adj
FROM g CROSS JOIN tie
"""


@register(
    "stats_kruskal_wallis",
    oracle=_sql_kruskal(),
    tags=("stats", "rank", "hypothesis-test", "scale-path"),
)
def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test (rank-based one-way analysis of variance)
    for line-item quantity across the three return flags, with the
    standard tie correction ``C = 1 - Sigma(t^3 - t)/(N^3 - N)`` — the
    nonparametric twin of ``stats_anova_oneway``, on a fixture whose
    integer quantities produce heavy real ties (C = 0.9996 at sf0.01).

    Scale path: tie-averaged ranks come from the distributed prefix sum
    over the DISTINCT-value domain (``value_counts_cum`` — the ``_cuts``
    machinery: repartitionByRange + partitioned window + offsets, never
    an un-partitioned global window), doubled into the exact integer
    ``2*cum - cnt + 1`` so tie-averaged halves stay on an integer grid.
    The rank map joins back by value (auto-broadcast at this domain
    size), then ONE aggregation pass in the conditional-sufficient-
    statistics shape: per-group n and Sigma(r2) as FILTERed aggregates
    through DECIMAL(38,0)/HUGEINT, combined with explicit left-assoc
    expression chains so both engines fold the k per-group doubles in
    the identical order (the r6 k-group convention). The doubled-rank
    scale cancels: H = 3/(N(N+1)) Sigma S2_g^2/n_g - 3(N+1), verified
    against a naive tie-averaged-rank reimplementation at sf0.001."""
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_quantity") * 100.0).cast("bigint").alias("v"),
    )
    cum, _ = value_counts_cum(pts, F.col("v"))
    # two consumers (rank map + tie sum) — pin the window output once
    cum = cum.localCheckpoint(eager=True)
    r2map = cum.select(
        "v", (2 * F.col("cum") - F.col("cnt") + 1).cast("bigint").alias("r2")
    )
    c = F.col("cnt").cast("decimal(38,0)")
    tie = cum.agg(F.sum(c * c * c - c).cast("double").alias("tsum"))
    aggs = []
    for i, g in enumerate(_KW_GROUPS):
        cc = F.col("grp") == g
        aggs.append(F.count(F.when(cc, F.lit(1))).cast("double").alias(f"n{i}"))
        aggs.append(
            F.sum(F.when(cc, F.col("r2").cast("decimal(38,0)")))
            .cast("double")
            .alias(f"s{i}")
        )
    s = pts.join(r2map, "v").agg(*aggs).crossJoin(F.broadcast(tie))
    k = len(_KW_GROUPS)
    # explicit left-assoc chains — same fold order as the SQL text
    nn = F.col("n0")
    ts = F.col("s0") * F.col("s0") / F.col("n0")
    for i in range(1, k):
        nn = nn + F.col(f"n{i}")
        ts = ts + F.col(f"s{i}") * F.col(f"s{i}") / F.col(f"n{i}")
    h = F.lit(3.0) / (nn * (nn + 1)) * ts - 3 * (nn + 1)
    tc = 1 - F.col("tsum") / (nn * nn * nn - nn)
    return s.select(
        F.lit(k).cast("bigint").alias("k"),
        nn.cast("bigint").alias("n"),
        F.round(h, 6).alias("h_stat"),
        F.round(tc, 9).alias("tie_correction"),
        F.round(h / tc, 6).alias("h_adj"),
    )


# --------------------------------------------------------------------------
# MRR@10 (mean reciprocal rank; binary-relevance twin of eval_ndcg_at_k
# on the identical per-nation ranking fixture)
# --------------------------------------------------------------------------

_MRR_SQL = """
WITH ocnt AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1
),
graded AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
         least(CAST(floor(coalesce(n_orders, 0) / 5.0) AS BIGINT), 4) AS rel
  FROM customer LEFT JOIN ocnt ON c_custkey = o_custkey
),
pred AS (
  SELECT c_nationkey, rel,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
  FROM graded
),
hit AS (
  SELECT c_nationkey, CAST(min(rnk) AS BIGINT) AS first_rel
  FROM pred WHERE rnk <= 10 AND rel >= 3 GROUP BY 1
),
q AS (SELECT DISTINCT c_nationkey FROM graded),
per_q AS (
  SELECT c_nationkey,
         CAST(coalesce(first_rel, 0) AS BIGINT) AS first_relevant_rank,
         CASE WHEN first_rel IS NULL THEN CAST(0 AS BIGINT)
              ELSE CAST(round(1000000000.0 / first_rel) AS BIGINT) END AS rr_q
  FROM q LEFT JOIN hit USING (c_nationkey)
)
SELECT n_name AS nation, first_relevant_rank,
       round(rr_q / 1000000000.0, 9) AS reciprocal_rank,
       round(CAST(sum(rr_q) OVER () AS DOUBLE) / count(*) OVER () / 1000000000.0, 9)
         AS mrr_at_10
FROM per_q JOIN nation ON n_nationkey = c_nationkey
ORDER BY nation
"""


@register(
    "eval_mrr_at_k",
    oracle=_MRR_SQL,
    tags=("eval", "ranking", "mrr"),
)
def eval_mrr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 — mean reciprocal rank of the FIRST relevant result, the
    standard known-item/QA retrieval metric, on the identical fixture as
    ``eval_ndcg_at_k`` (nation = query, account balance = model score)
    with binary relevance rel >= 3; queries whose top-10 has no relevant
    item contribute 0 (rank reported as 0, not NULL, on both engines).

    Each query's reciprocal rank is quantized to the 1e9 integer grid
    before the cross-query mean, so the global MRR is a division of
    exact integers — never an order-dependent float SUM. Plan shape: one
    count aggregate, a per-query row_number window (partition count
    grows with queries), a per-query min, and a query-spine left join so
    zero-hit queries survive; the only global state is the #queries-row
    final window — at 100 TB queries are the parallel unit and this
    stays a per-query pipeline plus one tiny combine."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    ocnt = orders.groupBy(F.col("o_custkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    graded = cust.join(ocnt, cust["c_custkey"] == ocnt["o_custkey"], "left").select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.least(
            F.floor(F.coalesce(F.col("n_orders"), F.lit(0)) / 5.0).cast("bigint"),
            F.lit(4),
        ).alias("rel"),
    )
    w_pred = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    hit = (
        graded.withColumn("rnk", F.row_number().over(w_pred))
        .filter((F.col("rnk") <= 10) & (F.col("rel") >= 3))
        .groupBy("c_nationkey")
        .agg(F.min("rnk").cast("bigint").alias("first_rel"))
    )
    q = graded.select("c_nationkey").distinct()
    per_q = q.join(hit, "c_nationkey", "left").select(
        "c_nationkey",
        F.coalesce(F.col("first_rel"), F.lit(0)).cast("bigint").alias(
            "first_relevant_rank"
        ),
        F.when(F.col("first_rel").isNull(), F.lit(0).cast("bigint"))
        .otherwise(
            F.round(F.lit(1000000000.0) / F.col("first_rel")).cast("bigint")
        )
        .alias("rr_q"),
    )
    wall = Window.partitionBy(F.lit(1))
    return (
        per_q.join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "first_relevant_rank",
            F.round(F.col("rr_q") / 1000000000.0, 9).alias("reciprocal_rank"),
            F.round(
                F.sum("rr_q").over(wall).cast("double")
                / F.count(F.lit(1)).over(wall)
                / 1000000000.0,
                9,
            ).alias("mrr_at_10"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# Bollinger bands (20-period rolling mean +/- 2 sigma per instrument)
# --------------------------------------------------------------------------

_BOLL_SQL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS v_cents
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, day, v_cents,
         CAST(count(*) OVER win AS BIGINT) AS n_obs,
         CAST(sum(v_cents) OVER win AS BIGINT) AS ms,
         CAST(sum(CAST(v_cents AS HUGEINT) * v_cents) OVER win AS HUGEINT) AS mss
  FROM daily
  WINDOW win AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, n_obs,
       round(v_cents / 100.0, 2) AS price,
       round(CAST(ms AS DOUBLE) / n_obs / 100.0, 6) AS ma20,
       round((CAST(ms AS DOUBLE) / n_obs
              + 2 * sqrt(greatest(CAST(mss AS DOUBLE) / n_obs
                                  - (CAST(ms AS DOUBLE) / n_obs) * (CAST(ms AS DOUBLE) / n_obs), 0)))
             / 100.0, 6) AS upper_band,
       round((CAST(ms AS DOUBLE) / n_obs
              - 2 * sqrt(greatest(CAST(mss AS DOUBLE) / n_obs
                                  - (CAST(ms AS DOUBLE) / n_obs) * (CAST(ms AS DOUBLE) / n_obs), 0)))
             / 100.0, 6) AS lower_band
FROM w ORDER BY event_type, day
"""


@register(
    "ts_bollinger_bands",
    oracle=_BOLL_SQL,
    tags=("timeseries", "finance", "window", "volatility"),
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands — 20-period rolling mean +/- 2 rolling standard
    deviations over each event type's daily value series (Bollinger
    1992), the classic volatility envelope; complements
    ``finance_max_drawdown`` (extremum) and ``w_ewma_smoothed``
    (exponential) with the bounded-frame moving-moment shape.

    Daily totals are exact cents (BIGINT); the rolling window carries
    only the three sufficient statistics (n, Sigma x, Sigma x^2 — the
    x^2 sum through HUGEINT/DECIMAL(38,0)), so both engines derive mean
    and variance from identical exact integers and evaluate the same
    IEEE expression; variance is clamped at 0 before sqrt (startup
    frames with n < 20 use the same shrinking-window semantics on both
    engines). Plan shape: one map-side-combinable daily aggregate, then
    ONE window PARTITIONED BY instrument with a 20-row frame — per-key
    sequential state, the shape that scales with instrument count."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100.0).cast("bigint"))
        .cast("bigint")
        .alias("v_cents")
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-19, Window.currentRow)
    )
    vq = F.col("v_cents").cast("decimal(38,0)")
    w = daily.select(
        "event_type",
        "day",
        "v_cents",
        F.count(F.lit(1)).over(win).cast("bigint").alias("n_obs"),
        F.sum("v_cents").over(win).cast("bigint").alias("ms"),
        F.sum(vq * vq).over(win).cast("decimal(38,0)").alias("mss"),
    )
    m = F.col("ms").cast("double") / F.col("n_obs")
    sd = F.sqrt(
        F.greatest(F.col("mss").cast("double") / F.col("n_obs") - m * m, F.lit(0.0))
    )
    return w.select(
        "event_type",
        "day",
        "n_obs",
        F.round(F.col("v_cents") / 100.0, 2).alias("price"),
        F.round(m / 100.0, 6).alias("ma20"),
        F.round((m + 2 * sd) / 100.0, 6).alias("upper_band"),
        F.round((m - 2 * sd) / 100.0, 6).alias("lower_band"),
    ).orderBy("event_type", "day")


# --------------------------------------------------------------------------
# Cramer's V (chi-square association effect size for lang x source)
# --------------------------------------------------------------------------

_CRAMERS_CHI2_X = """
         (CAST(c.o AS DOUBLE) - (CAST(r.nl AS DOUBLE) * ct.ns) / t.n)
         * (CAST(c.o AS DOUBLE) - (CAST(r.nl AS DOUBLE) * ct.ns) / t.n)
         / ((CAST(r.nl AS DOUBLE) * ct.ns) / t.n)"""

_CRAMERS_SQL = f"""
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
),
agg AS (
  SELECT {SQL_DSUM.format(x=_CRAMERS_CHI2_X)} AS chi2,
         min(t.n) AS n, min(t.l) AS r, min(t.s) AS c
  FROM cells c
  JOIN rowt r USING (lang)
  JOIN colt ct USING (source)
  CROSS JOIN tot t
)
SELECT round(chi2, 6) AS chi2, n, r, c,
       round(chi2 / n, 9) AS phi2,
       round(sqrt(chi2 / (n * (least(r, c) - 1))), 9) AS cramers_v
FROM agg
"""


@register(
    "stats_cramers_v",
    oracle=_CRAMERS_SQL,
    tags=("stats", "chi2", "effect-size"),
)
def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V — the normalized [0, 1] association strength for the
    lang x source contingency table, ``V = sqrt(chi2 / (N (min(r,c) -
    1)))``, plus the phi-squared mean-square contingency; the effect
    size that ``stats_chi2_lang_source``'s test statistic lacks (chi2
    grows with N even when association is fixed, V does not).

    Same contingency machinery as the chi2 entry (three small
    aggregates broadcast into a cells-sized join, chi2 summed on the
    micro-unit grid so it is identical on both engines); V and phi2 are
    then pure functions of that shared double and the exact marginal
    cardinalities, so no new nondeterminism enters. Fact table scanned
    once per marginal; every post-scan frame is (langs x sources)-sized
    at any corpus scale."""
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
    agg = (
        cells.join(F.broadcast(rowt), "lang")
        .join(F.broadcast(colt), "source")
        .crossJoin(F.broadcast(tot))
        .agg(
            dsum(term).alias("chi2"),
            F.min("n").alias("n"),
            F.min("l").alias("r"),
            F.min("s").alias("c"),
        )
    )
    return agg.select(
        F.round(F.col("chi2"), 6).alias("chi2"),
        "n",
        "r",
        "c",
        F.round(F.col("chi2") / F.col("n"), 9).alias("phi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n") * (F.least("r", "c") - 1))), 9
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# Cohen's kappa (agreement beyond chance for the stopword-ratio
# classifier vs the lang label — same scored fixture as eval_roc_auc)
# --------------------------------------------------------------------------

_KAPPA_STOPWORDS = "('the', 'a', 'of', 'and', 'is')"
_KAPPA_THRESHOLD = 0.08


def _sql_kappa() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth,
         CASE WHEN round(len(list_filter({toks}, t -> t IN {_KAPPA_STOPWORDS}))
                      / CAST(len({toks}) AS DOUBLE), 9) >= {_KAPPA_THRESHOLD}
              THEN 1 ELSE 0 END AS pred
  FROM documents
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE pred = 1 AND truth = 1) AS BIGINT) AS tp,
         CAST(count(*) FILTER (WHERE pred = 1 AND truth = 0) AS BIGINT) AS fp,
         CAST(count(*) FILTER (WHERE pred = 0 AND truth = 1) AS BIGINT) AS fn,
         CAST(count(*) FILTER (WHERE pred = 0 AND truth = 0) AS BIGINT) AS tn
  FROM scored
)
SELECT n, tp, fp, fn, tn,
       round((tp + tn) / CAST(n AS DOUBLE), 9) AS po,
       round(((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (CAST(n AS DOUBLE) * n), 9) AS pe,
       round(((tp + tn) / CAST(n AS DOUBLE)
              - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (CAST(n AS DOUBLE) * n))
             / (1 - ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / (CAST(n AS DOUBLE) * n)), 9)
         AS kappa
FROM c
"""


@register(
    "eval_cohens_kappa",
    oracle=_sql_kappa(),
    tags=("eval", "stats", "agreement"),
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement (Cohen 1960) between
    the thresholded stopword-ratio classifier (the SAME 9-dp-rounded
    score as ``eval_roc_auc``/``eval_pr_auc``, predicted 'en' at ratio
    >= 0.08) and the lang label: kappa = (p_o - p_e)/(1 - p_e), the
    metric that exposes accuracy inflation under class imbalance (on
    this near-chance synthetic fixture kappa sits near 0 while raw
    agreement looks respectable — exactly the case kappa exists for).

    The whole statistic reduces to ONE map-side-combinable aggregation
    producing the four exact BIGINT confusion cells; p_o, p_e, and
    kappa are then identical integer-ratio expressions on both engines
    (marginal products stay within BIGINT at any realistic corpus
    size). The threshold compares the ALREADY-9dp-rounded score, so the
    decision boundary is bit-identical cross-engine. At 100 TB this is
    one scan, one 4-cell combine."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select("lang", tx.tokens("text").alias("toks"))
    stop = F.filter(F.col("toks"), lambda t: t.isin("the", "a", "of", "and", "is"))
    scored = base.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("truth"),
        (
            F.round(F.size(stop) / F.size("toks").cast("double"), 9)
            >= _KAPPA_THRESHOLD
        ).cast("int").alias("pred"),
    )
    c = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when((F.col("pred") == 1) & (F.col("truth") == 1), 1))
        .cast("bigint")
        .alias("tp"),
        F.count(F.when((F.col("pred") == 1) & (F.col("truth") == 0), 1))
        .cast("bigint")
        .alias("fp"),
        F.count(F.when((F.col("pred") == 0) & (F.col("truth") == 1), 1))
        .cast("bigint")
        .alias("fn"),
        F.count(F.when((F.col("pred") == 0) & (F.col("truth") == 0), 1))
        .cast("bigint")
        .alias("tn"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("tp") + F.col("tn")) / nd
    pe = (
        (F.col("tp") + F.col("fp")) * (F.col("tp") + F.col("fn"))
        + (F.col("fn") + F.col("tn")) * (F.col("fp") + F.col("tn"))
    ) / (nd * F.col("n"))
    return c.select(
        "n",
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(po, 9).alias("po"),
        F.round(pe, 9).alias("pe"),
        F.round((po - pe) / (1 - pe), 9).alias("kappa"),
    )


# --------------------------------------------------------------------------
# Decile lift and cumulative gains (the marketing/curation view of the
# same scored fixture: how concentrated are positives in top deciles?)
# --------------------------------------------------------------------------

_LIFT_STOPWORDS = "('the', 'a', 'of', 'and', 'is')"


def _sql_lift() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH scored AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
         round(len(list_filter({toks}, t -> t IN {_LIFT_STOPWORDS}))
                 / CAST(len({toks}) AS DOUBLE), 9) AS score
  FROM documents
),
dec AS (
  SELECT label,
         CAST(ntile(10) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS decile
  FROM scored
),
agg AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS pos
  FROM dec GROUP BY 1
)
SELECT decile, n, pos,
       round((pos / CAST(n AS DOUBLE))
             / (CAST(sum(pos) OVER () AS DOUBLE) / sum(n) OVER ()), 9) AS lift,
       round(CAST(sum(pos) OVER (ORDER BY decile) AS DOUBLE)
             / sum(pos) OVER (), 9) AS cum_gain,
       round((CAST(sum(pos) OVER (ORDER BY decile) AS DOUBLE) / sum(n) OVER (ORDER BY decile))
             / (CAST(sum(pos) OVER () AS DOUBLE) / sum(n) OVER ()), 9) AS cum_lift
FROM agg ORDER BY decile
"""


@register(
    "eval_lift_gains_deciles",
    oracle=_sql_lift(),
    tags=("eval", "ranking", "lift", "gains"),
)
def eval_lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative-gains table — the campaign-targeting /
    curation-triage view of the ``eval_roc_auc`` scored fixture: rank by
    score, cut into 10 equal-count deciles, and report per-decile lift
    (precision vs base rate) and cumulative gain (share of all positives
    captured by deciles 1..d). The table the ROC curve summarizes away.

    Decile assignment is ``ntile(10)`` over the total order (score
    DESC, doc_id) — the identical standard-SQL ntile split on both
    engines — and every downstream number is a ratio of exact BIGINT
    counts over the 10-row decile frame, so no float ever sums in a
    nondeterministic order. Like the ROC/PR entries, the global-order
    window is the laptop form; the 100 TB form assigns deciles from
    equi-depth score cuts (``operators/equidepth.py``, the ``_cuts``
    family) instead of a global sort."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", "lang", tx.tokens("text").alias("toks"))
    stop = F.filter(F.col("toks"), lambda t: t.isin("the", "a", "of", "and", "is"))
    scored = base.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
        F.round(F.size(stop) / F.size("toks").cast("double"), 9).alias("score"),
    )
    dec = scored.select(
        "label",
        F.ntile(10)
        .over(Window.orderBy(F.desc("score"), F.col("doc_id")))
        .cast("bigint")
        .alias("decile"),
    )
    agg = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    word = Window.orderBy("decile")
    wall = Window.partitionBy(F.lit(1))
    base_rate = F.sum("pos").over(wall).cast("double") / F.sum("n").over(wall)
    return agg.select(
        "decile",
        "n",
        "pos",
        F.round((F.col("pos") / F.col("n").cast("double")) / base_rate, 9).alias(
            "lift"
        ),
        F.round(
            F.sum("pos").over(word).cast("double") / F.sum("pos").over(wall), 9
        ).alias("cum_gain"),
        F.round(
            (F.sum("pos").over(word).cast("double") / F.sum("n").over(word))
            / base_rate,
            9,
        ).alias("cum_lift"),
    ).orderBy("decile")

"""Round-3 eighteenth tranche: supervised text classification (multinomial
Naive Bayes language ID), Benford first-digit auditing, exact ROC/AUC
evaluation, quantile normalization, isotonic regression (pool-adjacent
minimax form), and item-item collaborative filtering.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs with
identical semantics. Float discipline: every logarithm is rounded at 9 dp
before summation (cross-libm parity), every mean is a ratio of exact
integers (micro-quantized sums), every argmax has a total-order tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import text as tx
from .functions import dsum


# --------------------------------------------------------------------------
# Multinomial Naive Bayes language identification
# --------------------------------------------------------------------------
# The reference has no trainable classifier; this is the data-pipeline
# extension (SURVEY.md §6): a bag-of-words generative classifier whose
# training IS aggregation — per-(lang, token) counts, per-lang totals, a
# vocabulary size — so the whole fit is two groupBys and the scorer is a
# join + sum. The published add-1 (Laplace) estimator:
#     log P(tok|lang) = ln((c(lang,tok) + 1) / (T_lang + V))
#     score(doc,lang) = ln(P_lang/D) + sum over token OCCURRENCES
# Train/test split is the deterministic doc_id % 5 hash-gate used by
# split_train_eval; prediction is argmax with (score desc, lang asc)
# tie-break. At 100 TB: counts shuffle (lang, token) ints once, the model
# (vocab x langs) is a broadcast dim, and scoring is a map-side broadcast
# join over exploded tokens — no per-row Python anywhere.

_NB_LL = "round(ln((COALESCE(c, 0) + 1) / CAST(t_total + vocab AS DOUBLE)), 9)"


def _sql_naive_bayes() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH train AS (
  SELECT lang, unnest({toks}) AS tok FROM documents WHERE doc_id % 5 <> 0
),
counts AS (
  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c FROM train GROUP BY lang, tok
),
totals AS (
  SELECT lang, CAST(sum(c) AS BIGINT) AS t_total FROM counts GROUP BY lang
),
vsz AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab FROM train),
lang_docs AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS d
  FROM documents WHERE doc_id % 5 <> 0 GROUP BY lang
),
priors AS (
  SELECT lang,
         round(ln(d / CAST(sum(d) OVER () AS DOUBLE)), 9) AS logprior
  FROM lang_docs
),
test_tok AS (
  SELECT doc_id, lang AS actual, unnest({toks}) AS tok
  FROM documents WHERE doc_id % 5 = 0
),
scored_tok AS (
  SELECT t.doc_id, t.actual, p.lang, p.logprior,
         {_NB_LL} AS ll
  FROM test_tok t
  CROSS JOIN priors p
  CROSS JOIN vsz
  JOIN totals ON totals.lang = p.lang
  LEFT JOIN counts ON counts.lang = p.lang AND counts.tok = t.tok
),
scores AS (
  SELECT doc_id, actual, lang,
         min(logprior)
           + (CAST(SUM(CAST(round(ll * 1000000.0) AS HUGEINT)) AS DOUBLE) / 1000000.0) AS score
  FROM scored_tok GROUP BY doc_id, actual, lang
),
ranked AS (
  SELECT doc_id, actual, lang AS predicted, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM scores
)
SELECT doc_id, actual, predicted, round(score, 6) AS score,
       (actual = predicted) AS correct
FROM ranked WHERE rn = 1 ORDER BY doc_id
"""


@register(
    "classify_naive_bayes_langid",
    oracle=_sql_naive_bayes(),
    tags=("classify", "text", "ml"),
)
def classify_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained and evaluated
    in one plan. Training is pure aggregation (token counts per lang,
    lang totals, vocabulary size); scoring explodes each held-out doc's
    tokens against the broadcast model grid and argmaxes per doc. Every
    log-likelihood is rounded at 9 dp before the micro-quantized sum, so
    scores are bit-identical across engines; argmax tie-breaks on
    (score desc, lang asc)."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)

    tr_tok = train.select("lang", F.explode(tx.tokens("text")).alias("tok"))
    counts = tr_tok.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("lang").agg(F.sum("c").alias("t_total"))
    vsz = tr_tok.agg(F.countDistinct("tok").alias("vocab"))
    # priors stay a lazy 5-row frame: per-lang doc counts with the grand
    # total from an unbounded window over those 5 rows (no driver action)
    priors = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("d"))
        .select(
            "lang",
            F.round(
                F.log(
                    F.col("d") / F.sum("d").over(Window.partitionBy(F.lit(1))).cast("double")
                ),
                9,
            ).alias("logprior"),
        )
    )

    test_tok = test.select(
        "doc_id", F.col("lang").alias("actual"), F.explode(tx.tokens("text")).alias("tok")
    )
    # model grid rides in as broadcast dims: 5 langs x (totals, priors),
    # vocab as a 1-row scalar, counts as the only sizable dim (vocab x lang)
    cdim = counts.select(
        F.col("lang").alias("c_lang"), F.col("tok").alias("c_tok"), "c"
    )
    scored_tok = (
        test_tok.crossJoin(F.broadcast(priors))
        .crossJoin(F.broadcast(vsz))
        .join(F.broadcast(totals), "lang")
        .join(
            F.broadcast(cdim),
            (F.col("c_lang") == F.col("lang")) & (F.col("c_tok") == F.col("tok")),
            "left",
        )
        .select(
            "doc_id",
            "actual",
            "lang",
            "logprior",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("t_total") + F.col("vocab")).cast("double")
                ),
                9,
            ).alias("ll"),
        )
    )
    scores = scored_tok.groupBy("doc_id", "actual", "lang").agg(
        (F.min("logprior") + dsum(F.col("ll"))).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "actual",
            F.col("lang").alias("predicted"),
            F.round("score", 6).alias("score"),
            (F.col("actual") == F.col("lang")).alias("correct"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Benford first-digit audit (data-quality / fraud screening)
# --------------------------------------------------------------------------

_SQL_BENFORD = """
WITH cents AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
),
digits AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(count(*) AS BIGINT) AS cnt
  FROM cents GROUP BY 1
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM digits),
scored AS (
  SELECT digit, cnt,
         round(cnt / CAST(n AS DOUBLE), 9) AS obs_share,
         round(log10(1.0 + 1.0 / digit), 9) AS benford_share,
         round(
           (cnt - round(log10(1.0 + 1.0 / digit), 9) * n)
             * (cnt - round(log10(1.0 + 1.0 / digit), 9) * n)
             / (round(log10(1.0 + 1.0 / digit), 9) * n),
           9) AS chi2_term
  FROM digits CROSS JOIN tot
)
SELECT digit, cnt, obs_share, benford_share, chi2_term,
       (CAST(SUM(CAST(round(chi2_term * 1000000.0) AS HUGEINT)) OVER () AS DOUBLE)
          / 1000000.0) AS chi2_total
FROM scored ORDER BY digit
"""


@register(
    "stats_benford_digits",
    oracle=_SQL_BENFORD,
    tags=("stats", "dq", "benford"),
)
def stats_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over order totals: the
    classic anomaly screen for invented numbers. The digit comes from
    integer cents (string-of-int is engine-portable; no float formatting),
    the expected share is log10(1 + 1/d), and the chi-square statistic
    sums 9 micro-quantized per-digit terms — an unbounded window over a
    9-row frame, constant state at any scale. One scan, one 9-group agg."""
    cents = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    digits = cents.groupBy(
        F.substring(F.col("c").cast("string"), 1, 1).cast("bigint").alias("digit")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = digits.agg(F.sum("cnt").alias("n"))
    exp_share = F.round(F.log10(1.0 + 1.0 / F.col("digit")), 9)
    dev = F.col("cnt") - exp_share * F.col("n")
    scored = digits.crossJoin(F.broadcast(tot)).select(
        "digit",
        "cnt",
        F.round(F.col("cnt") / F.col("n").cast("double"), 9).alias("obs_share"),
        exp_share.alias("benford_share"),
        F.round(dev * dev / (exp_share * F.col("n")), 9).alias("chi2_term"),
    )
    w = Window.partitionBy(F.lit(1))
    return scored.withColumn(
        "chi2_total",
        F.sum(F.round(F.col("chi2_term") * 1000000.0).cast("long")).over(w).cast("double")
        / 1000000.0,
    ).orderBy("digit")


# --------------------------------------------------------------------------
# Exact ROC curve + AUC (rank-based, integer arithmetic until the end)
# --------------------------------------------------------------------------

_ROC_STOPWORDS = "('the', 'a', 'of', 'and', 'is')"


def _sql_roc() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH scored AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
         round(len(list_filter({toks}, t -> t IN {_ROC_STOPWORDS}))
                 / CAST(len({toks}) AS DOUBLE), 9) AS score
  FROM documents
),
by_score AS (
  SELECT score,
         CAST(sum(label) AS BIGINT) AS tp_here,
         CAST(sum(1 - label) AS BIGINT) AS fp_here
  FROM scored GROUP BY score
),
cum AS (
  SELECT score,
         CAST(sum(tp_here) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
         CAST(sum(fp_here) OVER (ORDER BY score DESC) AS BIGINT) AS fp,
         CAST(sum(tp_here) OVER () AS BIGINT) AS pos,
         CAST(sum(fp_here) OVER () AS BIGINT) AS neg
  FROM by_score
),
segs AS (
  SELECT score, tp, fp, pos, neg,
         (fp - COALESCE(lag(fp) OVER (ORDER BY score DESC), 0))
           * (tp + COALESCE(lag(tp) OVER (ORDER BY score DESC), 0)) AS seg2
  FROM cum
)
SELECT score, tp, fp,
       round(tp / CAST(pos AS DOUBLE), 9) AS tpr,
       round(fp / CAST(neg AS DOUBLE), 9) AS fpr,
       round(CAST(sum(seg2) OVER () AS DOUBLE) / (2.0 * pos * neg), 9) AS auc
FROM segs ORDER BY score DESC
"""


@register(
    "eval_roc_auc",
    oracle=_sql_roc(),
    tags=("eval", "stats", "ml"),
)
def eval_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC curve and AUC for a classifier score (here: English
    stopword ratio predicting lang='en') — the evaluation primitive every
    quality-filter threshold decision needs. All curve math is integer
    (cumulative TP/FP per distinct score, trapezoid area as
    sum((dFP)*(TP_i+TP_{i-1})) / 2PN), so the result is exact and
    engine-identical; the only floats are final ratios. One agg per
    distinct score then O(#distinct) window state — the 100 TB form
    buckets scores to a fixed grid first."""
    docs = _t(spark, sf_dir, "documents")
    ts = tx.tokens("text")
    stop = F.filter(ts, lambda t: t.isin("the", "a", "of", "and", "is"))
    scored = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
        F.round(F.size(stop) / F.size(ts).cast("double"), 9).alias("score"),
    )
    by_score = scored.groupBy("score").agg(
        F.sum("label").alias("tp_here"),
        F.sum(1 - F.col("label")).alias("fp_here"),
    )
    word = Window.orderBy(F.desc("score"))
    wall = Window.partitionBy(F.lit(1))
    cum = by_score.select(
        "score",
        F.sum("tp_here").over(word).alias("tp"),
        F.sum("fp_here").over(word).alias("fp"),
        F.sum("tp_here").over(wall).alias("pos"),
        F.sum("fp_here").over(wall).alias("neg"),
    )
    seg2 = (F.col("fp") - F.coalesce(F.lag("fp").over(word), F.lit(0))) * (
        F.col("tp") + F.coalesce(F.lag("tp").over(word), F.lit(0))
    )
    return (
        cum.withColumn("seg2", seg2)
        .select(
            "score",
            "tp",
            "fp",
            F.round(F.col("tp") / F.col("pos").cast("double"), 9).alias("tpr"),
            F.round(F.col("fp") / F.col("neg").cast("double"), 9).alias("fpr"),
            F.round(
                F.sum("seg2").over(wall).cast("double")
                / (2.0 * F.col("pos") * F.col("neg")),
                9,
            ).alias("auc"),
        )
        .orderBy(F.desc("score"))
    )


# --------------------------------------------------------------------------
# Quantile normalization (cross-group distribution alignment)
# --------------------------------------------------------------------------

_SQL_QNORM = """
WITH ranked AS (
  SELECT event_id, event_type, value,
         CAST(round(value * 1000000.0) AS BIGINT) AS micro,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r,
         count(*) OVER (PARTITION BY event_type) AS n_g
  FROM events
),
pooled AS (
  SELECT list(micro ORDER BY micro, event_id) AS arr,
         CAST(count(*) AS BIGINT) AS n FROM ranked
),
pos AS (
  SELECT event_id, event_type, value, n_g,
         (r - 1) * (n - 1) // (n_g - 1) AS lo,
         (r - 1) * (n - 1) % (n_g - 1) AS rem,
         arr, n
  FROM ranked CROSS JOIN pooled
  WHERE n_g >= 2
)
SELECT event_id, event_type, value,
       round(
         (CAST(arr[lo + 1] AS DOUBLE)
            + CASE WHEN rem = 0 THEN 0.0
                   ELSE CAST(arr[lo + 2] - arr[lo + 1] AS DOUBLE) * rem / (n_g - 1)
              END) / 1000000.0,
         9) AS qnorm
FROM pos ORDER BY event_id
"""


@register(
    "stats_quantile_normalize",
    oracle=_SQL_QNORM,
    tags=("stats", "normalize", "ml"),
)
def stats_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization: every event_type's value distribution is
    mapped onto the POOLED distribution — rank r of n_g in its group maps
    to the interpolated order statistic at the same quantile of the whole
    table (the microarray/feature-alignment standard). Arithmetic is
    integer through the index math ((r-1)(N-1) div/mod (n_g-1)) and
    micro-quantized through the values, so both engines interpolate the
    same two integers. The pooled sorted vector is a single-row broadcast
    here; the scale path is the round-4 twin
    ``stats_quantile_normalize_grid`` (101 exact pooled order
    statistics broadcast, mid-rank ties, no data-sized window)."""
    ev = _t(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1000000.0).cast("long")
    wg = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_id",
        "event_type",
        "value",
        micro.alias("micro"),
        F.row_number().over(wg).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n_g"),
    )
    pooled = ranked.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("micro", "event_id"))), lambda s: s["micro"]
        ).alias("arr"),
        F.count(F.lit(1)).alias("n"),
    )
    lo = ((F.col("r") - 1) * (F.col("n") - 1) / (F.col("n_g") - 1)).cast("long")
    rem = ((F.col("r") - 1) * (F.col("n") - 1)) % (F.col("n_g") - 1)
    base = F.element_at("arr", (lo + 1).cast("int")).cast("double")
    step = (
        F.element_at("arr", (lo + 2).cast("int")) - F.element_at("arr", (lo + 1).cast("int"))
    ).cast("double")
    return (
        ranked.crossJoin(F.broadcast(pooled))
        .filter(F.col("n_g") >= 2)
        .withColumn("lo", lo)
        .withColumn("rem", rem)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(
                (
                    base
                    + F.when(F.col("rem") == 0, F.lit(0.0)).otherwise(
                        step * F.col("rem") / (F.col("n_g") - 1)
                    )
                )
                / 1000000.0,
                9,
            ).alias("qnorm"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Isotonic regression (weighted, minimax closed form on a bounded grid)
# --------------------------------------------------------------------------

_SQL_PAV = """
WITH hourly AS (
  SELECT CAST(extract(hour FROM ts) AS BIGINT) AS h,
         CAST(SUM(CAST(round(value * 1000000.0) AS HUGEINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
pre AS (
  SELECT h, s, n,
         CAST(sum(s) OVER (ORDER BY h) AS BIGINT) AS cs,
         CAST(sum(n) OVER (ORDER BY h) AS BIGINT) AS cn
  FROM hourly
),
triples AS (
  SELECT i.h AS h, j.h AS j, k.h AS k,
         round(CAST(k.cs - (j.cs - j.s) AS DOUBLE)
                 / (k.cn - (j.cn - j.n)) / 1000000.0, 9) AS ravg
  FROM pre i JOIN pre j ON j.h <= i.h JOIN pre k ON k.h >= i.h
),
inner_min AS (
  SELECT h, j, min(ravg) AS m FROM triples GROUP BY h, j
)
SELECT p.h,
       p.n,
       round(CAST(p.s AS DOUBLE) / p.n / 1000000.0, 9) AS y_mean,
       mx.iso
FROM pre p
JOIN (SELECT h, max(m) AS iso FROM inner_min GROUP BY h) mx ON mx.h = p.h
ORDER BY p.h
"""


@register(
    "iso_regression_pav",
    oracle=_SQL_PAV,
    tags=("stats", "regression", "ml"),
)
def iso_regression_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted isotonic regression of mean event value against
    hour-of-day, via the minimax closed form
    iso_h = max_{j<=h} min_{k>=h} wavg(y_j..y_k) — the calibration
    primitive (monotone score -> probability maps). The grid is bounded
    (24 hours), so the cubic enumeration is a broadcast self-join of a
    24-row aggregate — the 10k raw events only ever see one groupBy.
    Every range average is a ratio of exact integers (micro-quantized
    sums over prefix differences), rounded at 9 dp; the result is the
    same pool-adjacent-violators fit, engine-identical. At scale the
    grid stays fixed while the scan grows — the O(G^3) driver-free tail
    is constant."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.hour("ts").cast("bigint").alias("h")).agg(
        F.sum(F.round(F.col("value") * 1000000.0).cast("long")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    wh = Window.orderBy("h")
    pre = hourly.select(
        "h", "s", "n", F.sum("s").over(wh).alias("cs"), F.sum("n").over(wh).alias("cn")
    )
    i = pre.select(F.col("h").alias("h"))
    j = pre.select(
        F.col("h").alias("j"), (F.col("cs") - F.col("s")).alias("pcs"),
        (F.col("cn") - F.col("n")).alias("pcn"),
    )
    k = pre.select(F.col("h").alias("k"), F.col("cs").alias("kcs"), F.col("cn").alias("kcn"))
    ravg = F.round(
        (F.col("kcs") - F.col("pcs")).cast("double")
        / (F.col("kcn") - F.col("pcn"))
        / 1000000.0,
        9,
    )
    triples = (
        i.join(F.broadcast(j), F.col("j") <= F.col("h"))
        .join(F.broadcast(k), F.col("k") >= F.col("h"))
        .select("h", "j", ravg.alias("ravg"))
    )
    inner_min = triples.groupBy("h", "j").agg(F.min("ravg").alias("m"))
    iso = inner_min.groupBy("h").agg(F.max("m").alias("iso"))
    return (
        pre.join(F.broadcast(iso), "h")
        .select(
            "h",
            "n",
            F.round(F.col("s").cast("double") / F.col("n") / 1000000.0, 9).alias("y_mean"),
            "iso",
        )
        .orderBy("h")
    )


# --------------------------------------------------------------------------
# Item-item collaborative filtering (co-occurrence cosine, top-k)
# --------------------------------------------------------------------------

_CF_MIN_CO = 3
_CF_TOPK = 50

_SQL_CF = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
),
deg AS (
  SELECT p, CAST(count(*) AS BIGINT) AS n FROM baskets GROUP BY p
),
co AS (
  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS co
  FROM baskets a JOIN baskets b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= {_CF_MIN_CO}
)
SELECT pa, pb, co.co AS co,
       round(co.co / sqrt(CAST(da.n AS DOUBLE) * db.n), 9) AS cosine
FROM co JOIN deg da ON da.p = pa JOIN deg db ON db.p = pb
ORDER BY cosine DESC, pa, pb LIMIT {_CF_TOPK}
"""


@register(
    "cf_item_item_cosine",
    oracle=_SQL_CF,
    tags=("recommend", "similarity", "join"),
)
def cf_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering over order baskets: cosine
    similarity between parts on their co-purchase counts
    (co / sqrt(n_a * n_b)), the classic Amazon-style recommender
    statistic. The basket self-join is an equi-join on the order key —
    cost is sum over orders of |basket|^2, never corpus^2 — and the
    degree table joins in as a broadcast dim. IEEE sqrt and one division
    are correctly-rounded, so the 9 dp cosine is engine-identical.
    At 100 TB the known refinement is capping pathological basket sizes
    (a crawler's giant cart) before the self-join, same as the LSH
    band-cap; ordinary baskets are bounded by business reality."""
    li = _t(spark, sf_dir, "lineitem")
    baskets = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    deg = baskets.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    a = baskets.select(F.col("o"), F.col("p").alias("pa"))
    b = baskets.select(F.col("o"), F.col("p").alias("pb"))
    co = (
        a.join(b, ["o"])
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= _CF_MIN_CO)
    )
    da = deg.select(F.col("p").alias("pa"), F.col("n").alias("na"))
    db = deg.select(F.col("p").alias("pb"), F.col("n").alias("nb"))
    return (
        co.join(F.broadcast(da), "pa")
        .join(F.broadcast(db), "pb")
        .select(
            "pa",
            "pb",
            "co",
            F.round(
                F.col("co") / F.sqrt(F.col("na").cast("double") * F.col("nb")), 9
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "pa", "pb")
        .limit(_CF_TOPK)
    )

"""Round-6 additions, part 2: rank statistics, k-group ANOVA, ranking
evaluation, late-interaction retrieval, and sequential-extremum
analytics.

Every entry follows the catalog contract — a PySpark program plus a
DuckDB oracle replaying identical semantics (same tie-breaks, same
integer/rounding grid), hash-compared at sf0.01 by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import text as tx
from .datapipe.util import fan_out
from .operators.equidepth import grouped_value_counts_cum

# --------------------------------------------------------------------------
# Spearman rank correlation (distributed average ranks, exact moments)
# --------------------------------------------------------------------------


def _sql_rank2(col: str) -> str:
    # doubled average rank (2*cum - cnt + 1) over the ascending distinct
    # domain: an exact BIGINT, so the tie-averaged "rank + (ties-1)/2"
    # never touches floats until the final correlation formula
    return f"""(
  SELECT v, CAST(2 * cum - cnt + 1 AS BIGINT) AS r2 FROM (
    SELECT {col} AS v, CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(count(*)) OVER (ORDER BY {col}) AS BIGINT) AS cum
    FROM lineitem GROUP BY 1))"""


def _sql_spearman_pair(xcol: str, ycol: str) -> str:
    return f"""
  SELECT '{xcol}' AS x_var, '{ycol}' AS y_var,
         CAST(count(*) AS BIGINT) AS n,
         round((CAST(count(*) AS DOUBLE) * CAST(sum(CAST(rx2 AS HUGEINT) * ry2) AS DOUBLE)
                - CAST(sum(CAST(rx2 AS HUGEINT)) AS DOUBLE) * CAST(sum(CAST(ry2 AS HUGEINT)) AS DOUBLE))
               / (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(CAST(rx2 AS HUGEINT) * rx2) AS DOUBLE)
                       - CAST(sum(CAST(rx2 AS HUGEINT)) AS DOUBLE) * CAST(sum(CAST(rx2 AS HUGEINT)) AS DOUBLE))
                  * sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(CAST(ry2 AS HUGEINT) * ry2) AS DOUBLE)
                         - CAST(sum(CAST(ry2 AS HUGEINT)) AS DOUBLE) * CAST(sum(CAST(ry2 AS HUGEINT)) AS DOUBLE))), 9)
           AS spearman_rho
  FROM (
    SELECT rx.r2 AS rx2, ry.r2 AS ry2
    FROM lineitem l
    JOIN {_sql_rank2(xcol)} rx ON l.{xcol} = rx.v
    JOIN {_sql_rank2(ycol)} ry ON l.{ycol} = ry.v
  )"""


_SPEARMAN_SQL = f"""
{_sql_spearman_pair('l_extendedprice', 'l_discount')}
UNION ALL
{_sql_spearman_pair('l_extendedprice', 'l_quantity')}
ORDER BY y_var
"""


@register(
    "stats_spearman_corr",
    oracle=_SPEARMAN_SQL,
    tags=("stats", "correlation", "rank", "scale-path"),
)
def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (price vs quantity, price vs discount)
    with textbook tie-averaged ranks — the robust complement to
    ``stats_corr_matrix``'s Pearson (monotone association, insensitive
    to outliers and nonlinear scales).

    Scale path: average ranks come from ONE grouped distributed prefix
    sum over the three columns' DISTINCT-value domains
    (``grouped_value_counts_cum`` with the column name as the group —
    the same machinery as the ``_cuts`` family: repartitionByRange +
    partitioned window + offsets, never an un-partitioned global
    window), doubled into the exact integer ``2*cum - cnt + 1`` so
    tie-averaged halves stay on an integer grid. The rank maps
    (checkpointed once — four join branches would otherwise each replay
    the window) join back to the fact by value in one three-join chain
    (every row matches its own value, so multiplicity is unchanged and
    BOTH pairs aggregate from a single scan), then one
    map-side-combinable aggregation accumulates all Pearson moments
    through DECIMAL(38,0) — the ``stats_corr_matrix`` convention — so
    both engines cast identical exact integers to double and evaluate
    the same IEEE formula; the 9-dp round is cosmetic. The 2x rank
    scale cancels in the formula. The two output rows explode from the
    single stats row (one consumer — no plan-branch recompute)."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ("l_extendedprice", "l_quantity", "l_discount")
    # single-split parquet at small SFs would melt+pre-aggregate the 3x
    # row explosion on one core — widen first
    melted = fan_out(li.select(*cols)).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("col"), F.col(c).alias("val"))
                    for c in cols
                ]
            )
        ).alias("e")
    ).select("e.col", "e.val")
    cum, _ = grouped_value_counts_cum(melted, F.col("col"), F.col("val"))
    cum = cum.localCheckpoint(eager=True)

    def rank2(colname: str, alias: str) -> DataFrame:
        return cum.filter(F.col("g") == colname).select(
            F.col("v").alias(colname),
            (2 * F.col("cum") - F.col("cnt") + 1).cast("bigint").alias(alias),
        )

    j = (
        li.select(*cols)
        .join(rank2("l_extendedprice", "rx2"), "l_extendedprice")
        .join(rank2("l_quantity", "rq2"), "l_quantity")
        .join(rank2("l_discount", "rd2"), "l_discount")
    )

    def d(c: str):
        return F.col(c).cast("decimal(38,0)")

    s = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(d("rx2")).cast("double").alias("sx"),
        F.sum(d("rx2") * d("rx2")).cast("double").alias("sxx"),
        F.sum(d("rq2")).cast("double").alias("sq"),
        F.sum(d("rq2") * d("rq2")).cast("double").alias("sqq"),
        F.sum(d("rx2") * d("rq2")).cast("double").alias("sxq"),
        F.sum(d("rd2")).cast("double").alias("sd"),
        F.sum(d("rd2") * d("rd2")).cast("double").alias("sdd"),
        F.sum(d("rx2") * d("rd2")).cast("double").alias("sxd"),
    )

    def rho(sy: str, syy: str, sxy: str):
        n = F.col("n")
        return F.round(
            (n * F.col(sxy) - F.col("sx") * F.col(sy))
            / (
                F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(n * F.col(syy) - F.col(sy) * F.col(sy))
            ),
            9,
        )

    def out_row(ycol: str, sy: str, syy: str, sxy: str):
        return F.struct(
            F.lit("l_extendedprice").alias("x_var"),
            F.lit(ycol).alias("y_var"),
            F.col("nb").alias("n"),
            rho(sy, syy, sxy).alias("spearman_rho"),
        )

    return (
        s.select(
            F.explode(
                F.array(
                    out_row("l_discount", "sd", "sdd", "sxd"),
                    out_row("l_quantity", "sq", "sqq", "sxq"),
                )
            ).alias("p")
        )
        .select("p.*")
        .orderBy("y_var")
    )


# --------------------------------------------------------------------------
# One-way ANOVA F test (k groups; generalizes the 2-group Welch entry)
# --------------------------------------------------------------------------

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def _sql_anova() -> str:
    cols = []
    for i, g in enumerate(_PRIORITIES):
        c = f"o_orderpriority = '{g}'"
        q = "CAST(round(o_totalprice * 100.0) AS HUGEINT)"
        cols += [
            f"CAST(count(*) FILTER (WHERE {c}) AS DOUBLE) AS n{i}",
            f"CAST(sum({q}) FILTER (WHERE {c}) AS DOUBLE) AS s{i}",
            f"CAST(sum({q} * {q}) FILTER (WHERE {c}) AS DOUBLE) AS ss{i}",
        ]
    k = len(_PRIORITIES)
    nsum = " + ".join(f"n{i}" for i in range(k))
    ssum = " + ".join(f"s{i}" for i in range(k))
    tsum = " + ".join(f"s{i} * s{i} / n{i}" for i in range(k))
    sssum = " + ".join(f"ss{i}" for i in range(k))
    return f"""
WITH g AS (SELECT {', '.join(cols)} FROM orders),
c AS (
  SELECT {nsum} AS nn, ({tsum}) - ({ssum}) * ({ssum}) / ({nsum}) AS ssb,
         ({sssum}) - ({tsum}) AS ssw
  FROM g
)
SELECT CAST({k} AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
       round(ssb / (ssb + ssw), 9) AS eta_sq,
       round((ssb / {k - 1}) / (ssw / (nn - {k})), 6) AS f_stat
FROM c
"""


@register(
    "stats_anova_oneway",
    oracle=_sql_anova(),
    tags=("stats", "anova", "hypothesis-test"),
)
def stats_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for order value across the five order
    priorities — the k-group generalization of ``stats_welch_ttest``
    (between-group vs within-group variance), plus the eta-squared
    effect size.

    ONE aggregation pass in the conditional-sufficient-statistics shape:
    15 FILTERed aggregates (n, Σx, Σx² per group on the exact cents grid
    through DECIMAL(38,0)/HUGEINT), map-side combinable, no shuffle
    beyond the 1-row combine — at 100 TB this is a single scan. The
    cross-group reductions are written as explicit left-to-right
    expression chains over the five per-group doubles, so both engines
    fold in the identical order and the IEEE result is bit-equal —
    never a float SUM over a nondeterministically-ordered group set."""
    orders = _t(spark, sf_dir, "orders")
    q = F.round(F.col("o_totalprice") * 100.0).cast("decimal(38,0)")
    aggs = []
    for i, g in enumerate(_PRIORITIES):
        c = F.col("o_orderpriority") == g
        aggs += [
            F.count(F.when(c, F.lit(1))).cast("double").alias(f"n{i}"),
            F.sum(F.when(c, q)).cast("double").alias(f"s{i}"),
            F.sum(F.when(c, q * q)).cast("double").alias(f"ss{i}"),
        ]
    s = orders.agg(*aggs)
    k = len(_PRIORITIES)
    # explicit left-assoc chains — same fold order as the SQL text
    nn = F.col("n0")
    ssum = F.col("s0")
    tsum = F.col("s0") * F.col("s0") / F.col("n0")
    sssum = F.col("ss0")
    for i in range(1, k):
        nn = nn + F.col(f"n{i}")
        ssum = ssum + F.col(f"s{i}")
        tsum = tsum + F.col(f"s{i}") * F.col(f"s{i}") / F.col(f"n{i}")
        sssum = sssum + F.col(f"ss{i}")
    ssb = tsum - ssum * ssum / nn
    ssw = sssum - tsum
    return s.select(
        F.lit(k).cast("bigint").alias("k"),
        nn.cast("bigint").alias("n"),
        F.round(ssb / (ssb + ssw), 9).alias("eta_sq"),
        F.round((ssb / F.lit(k - 1)) / (ssw / (nn - F.lit(k))), 6).alias("f_stat"),
    )


# --------------------------------------------------------------------------
# NDCG@10 ranking evaluation (graded relevance, per-query)
# --------------------------------------------------------------------------

_NDCG_SQL = """
WITH ocnt AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1
),
cust AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
         CAST(floor(coalesce(n_orders, 0) / 5.0) AS BIGINT) AS rel0
  FROM customer LEFT JOIN ocnt ON c_custkey = o_custkey
),
graded AS (SELECT c_nationkey, c_custkey, c_acctbal, least(rel0, 4) AS rel FROM cust),
pred AS (
  SELECT c_nationkey, rel,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
  FROM graded
),
ideal AS (
  SELECT c_nationkey, rel,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY rel DESC, c_custkey) AS rnk
  FROM graded
),
dcg AS (
  SELECT c_nationkey,
         CAST(sum(CAST(round(1000000000.0 * (pow(2.0, rel) - 1) / log2(rnk + 1)) AS BIGINT)) AS BIGINT) AS dcg_q
  FROM pred WHERE rnk <= 10 GROUP BY 1
),
idcg AS (
  SELECT c_nationkey,
         CAST(sum(CAST(round(1000000000.0 * (pow(2.0, rel) - 1) / log2(rnk + 1)) AS BIGINT)) AS BIGINT) AS idcg_q
  FROM ideal WHERE rnk <= 10 GROUP BY 1
)
SELECT n_name AS nation, CAST(10 AS BIGINT) AS k,
       round(dcg_q / 1000000000.0, 9) AS dcg,
       round(idcg_q / 1000000000.0, 9) AS idcg,
       CASE WHEN idcg_q = 0 THEN 0.0
            ELSE round(CAST(dcg_q AS DOUBLE) / CAST(idcg_q AS DOUBLE), 9) END AS ndcg_at_10
FROM dcg JOIN idcg USING (c_nationkey)
JOIN nation ON n_nationkey = c_nationkey
ORDER BY nation
"""


@register(
    "eval_ndcg_at_k",
    oracle=_NDCG_SQL,
    tags=("eval", "ranking", "ndcg"),
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per query — the standard graded-relevance ranking metric
    (Järvelin & Kekäläinen 2002), evaluated on a deterministic fixture:
    each nation is a query, the "model score" is account balance, and
    graded relevance 0..4 is the capped order count. Complements the
    binary ``eval_roc_auc`` / ``eval_ann_recall_at_k``.

    Per-rank gains ``(2^rel - 1)/log2(rank+1)`` are quantized to the 1e9
    integer grid BEFORE the per-query sum, so the only libm call
    (``log2``) follows the round-at-9dp convention and the sums are
    exact BIGINTs on both engines — no order-dependent float SUM.
    Plan shape: one count aggregate, a broadcast-joined grade, two
    row_number windows PARTITIONED BY the query key, and a per-query
    combine — the natural NDCG shape at 100 TB, where queries are many
    and each query's candidate list is small (partition count grows
    with queries, never a global sort)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    ocnt = orders.groupBy(F.col("o_custkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    graded = (
        cust.join(ocnt, cust["c_custkey"] == ocnt["o_custkey"], "left")
        .select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.least(
                F.floor(F.coalesce(F.col("n_orders"), F.lit(0)) / 5.0).cast("bigint"),
                F.lit(4),
            ).alias("rel"),
        )
    )
    w_pred = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.col("c_custkey")
    )
    w_ideal = Window.partitionBy("c_nationkey").orderBy(
        F.desc("rel"), F.col("c_custkey")
    )

    def gains(w) -> DataFrame:
        return (
            graded.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 10)
            .withColumn(
                "term",
                F.round(
                    F.lit(1000000000.0)
                    * (F.pow(F.lit(2.0), F.col("rel")) - 1)
                    / F.log2(F.col("rnk") + 1)
                ).cast("bigint"),
            )
            .groupBy("c_nationkey")
            .agg(F.sum("term").cast("bigint").alias("g"))
        )

    dcg = gains(w_pred).withColumnRenamed("g", "dcg_q")
    idcg = gains(w_ideal).withColumnRenamed("g", "idcg_q")
    return (
        dcg.join(idcg, "c_nationkey")
        .join(
            F.broadcast(nation),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.lit(10).cast("bigint").alias("k"),
            F.round(F.col("dcg_q") / 1000000000.0, 9).alias("dcg"),
            F.round(F.col("idcg_q") / 1000000000.0, 9).alias("idcg"),
            F.when(F.col("idcg_q") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.col("dcg_q").cast("double") / F.col("idcg_q").cast("double"), 9
                )
            )
            .alias("ndcg_at_10"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# MaxSim late-interaction retrieval (ColBERT-style multi-vector scoring)
# --------------------------------------------------------------------------

_MS_SUBVECS = 8
_MS_DIMS = 8
_MS_TOPK = 5


def _sql_maxsim() -> str:
    n, d, k = _MS_SUBVECS, _MS_DIMS, _MS_TOPK
    return f"""
WITH sub AS (
  SELECT vec_id,
         list_transform(range(0, {n}),
                        i -> list_slice(embedding::DOUBLE[], i * {d} + 1, i * {d} + {d})) AS sv
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, sv AS qsv FROM sub WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, d.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(q.qsv, qv ->
           CAST(round(1000000000.0 * list_max(list_transform(d.sv,
                  dv -> round(list_inner_product(qv, dv), 9)))) AS BIGINT)
         )) AS BIGINT) AS score_q
  FROM sub d CROSS JOIN q WHERE d.vec_id != q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(score_q / 1000000000.0, 9) AS maxsim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score_q DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
ORDER BY query_id, rank
"""


@register(
    "similarity_maxsim_late_interaction",
    oracle=_sql_maxsim(),
    tags=("similarity", "retrieval", "maxsim", "multi-vector"),
)
def similarity_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval (Khattab & Zaharia 2020):
    each 64-dim embedding is treated as 8 "token vectors" of 8 dims, and
    score(q, d) = Σ_i max_j <q_i, d_j> — MaxSim, the scoring rule behind
    multi-vector retrievers. Top-5 per query over the shared 5-query
    eval panel, ties broken by neighbor id.

    Determinism: each sub-vector dot is a sequential zip_with/aggregate
    fold (IEEE-identical to DuckDB ``list_inner_product``), rounded at
    9 dp; each per-query-token maximum is quantized to the 1e9 integer
    grid BEFORE the 8-term sum, so the score is an exact BIGINT on both
    engines. Plan shape: the sub-vector split is a row-local projection
    evaluated ONCE per row (plain column references inside the HOF
    lambdas — no re-derivation), queries broadcast against the fanned-out
    corpus, score entirely JVM-side in one pass, then the usual
    per-query top-k window. At 100 TB the corpus side stays
    embarrassingly parallel (map-only scoring + per-query k rows into
    the shuffle); production systems front this exact scorer with an
    ANN candidate stage (the ``similarity_ivf_*`` entries here)."""
    emb = _t(spark, sf_dir, "embeddings")
    sub = F.transform(
        F.sequence(F.lit(0), F.lit(_MS_SUBVECS - 1)),
        lambda i: F.slice(
            F.col("embedding").cast("array<double>"), i * _MS_DIMS + 1, _MS_DIMS
        ),
    )
    d = fan_out(emb.select(F.col("vec_id").alias("neighbor_id"), sub.alias("dsv")))
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), sub.alias("qsv")
    )

    def dot(qv, dv):
        return F.aggregate(
            F.zip_with(qv, dv, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    score = F.aggregate(
        F.transform(
            F.col("qsv"),
            lambda qv: F.round(
                F.lit(1000000000.0)
                * F.array_max(
                    F.transform(F.col("dsv"), lambda dv: F.round(dot(qv, dv), 9))
                )
            ).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = d.join(
        F.broadcast(q), F.col("neighbor_id") != F.col("query_id")
    ).select("query_id", "neighbor_id", score.alias("score_q"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score_q"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _MS_TOPK)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("score_q") / 1000000000.0, 9).alias("maxsim"),
        )
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# Max drawdown (per-key sequential extremum over a price stream)
# --------------------------------------------------------------------------

_DRAWDOWN_SQL = """
WITH pts AS (
  SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
         CAST(round(100.0 * l_extendedprice / l_quantity) AS BIGINT) AS p_cents
  FROM lineitem
),
runs AS (
  SELECT l_partkey, p_cents,
         max(p_cents) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM pts
)
SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_points,
       round(max(peak) / 100.0, 2) AS peak_price,
       round(max(peak - p_cents) / 100.0, 2) AS max_drawdown
FROM runs GROUP BY 1 HAVING count(*) >= 25 ORDER BY l_partkey
"""


@register(
    "finance_max_drawdown",
    oracle=_DRAWDOWN_SQL,
    tags=("finance", "window", "drawdown", "timeseries"),
)
def finance_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per instrument — the classic peak-to-trough
    decline metric (running maximum of the price stream, then the
    largest drop below it), computed over each part's unit-price series
    ordered by ship date. Complements ``ts_peak_detection`` /
    ``finance_vwap_monthly`` with the sequential-extremum shape that
    cannot be expressed as a plain aggregate.

    Prices are quantized to the exact cents grid (BIGINT) before the
    running max, so every comparison and difference is integer — no
    float-ordering hazards between engines. Plan shape: ONE window
    PARTITIONED BY the instrument key (per-key sequences — partition
    count grows with instruments, each partition stays small at any
    scale) followed by a map-side-combinable per-key aggregate; parts
    with < 25 observations are dropped on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.round(F.lit(100.0) * F.col("l_extendedprice") / F.col("l_quantity"))
        .cast("bigint")
        .alias("p_cents"),
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = pts.withColumn("peak", F.max("p_cents").over(w))
    return (
        runs.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.max("peak") / 100.0, 2).alias("peak_price"),
            F.round(F.max(F.col("peak") - F.col("p_cents")) / 100.0, 2).alias(
                "max_drawdown"
            ),
        )
        .filter(F.col("n_points") >= 25)
        .orderBy("l_partkey")
    )


# --------------------------------------------------------------------------
# Precision-recall curve + average precision (the imbalance-robust twin
# of eval_roc_auc, on the same scored fixture)
# --------------------------------------------------------------------------

_PR_STOPWORDS = "('the', 'a', 'of', 'and', 'is')"


def _sql_pr_auc() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
         round(len(list_filter({toks}, t -> t IN {_PR_STOPWORDS}))
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
         CAST(sum(tp_here) OVER () AS BIGINT) AS pos
  FROM by_score
),
segs AS (
  SELECT score, tp, fp, pos,
         tp - COALESCE(lag(tp) OVER (ORDER BY score DESC), 0) AS dtp
  FROM cum
)
SELECT score, tp, fp,
       round(tp / CAST(tp + fp AS DOUBLE), 9) AS precision,
       round(tp / CAST(pos AS DOUBLE), 9) AS recall,
       round(CAST(sum(CAST(round(1000000000.0 * ((dtp * tp) / CAST(pos * (tp + fp) AS DOUBLE))) AS BIGINT)) OVER () AS DOUBLE)
             / 1000000000.0, 9) AS average_precision
FROM segs ORDER BY score DESC
"""


@register(
    "eval_pr_auc",
    oracle=_sql_pr_auc(),
    tags=("eval", "stats", "ml", "pr-curve"),
)
def eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact precision-recall curve and average precision for the same
    scored fixture as ``eval_roc_auc`` (English stopword ratio
    predicting lang='en') — the class-imbalance-robust companion
    metric: with rare positives, ROC AUC stays optimistic while the PR
    curve collapses, which is why retrieval/filter evaluations report
    AP (step-wise interpolation, the standard estimator:
    AP = Σ_i (R_i − R_{i−1})·P_i over descending thresholds).

    Curve state is integer (cumulative TP/FP per DISTINCT score); each
    AP term is one division of exact integers — ``(ΔTP·TP) /
    (P·(TP+FP))`` — quantized to the 1e9 grid before the sum, so both
    engines add identical BIGINTs. Like the ROC entry, the O(#distinct
    scores) window is the laptop form; the 100 TB form buckets scores
    to a fixed grid first (the score here is already 9-dp-rounded, so
    the domain is bounded by the grid, not the corpus)."""
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
        F.sum("tp_here").over(word).cast("bigint").alias("tp"),
        F.sum("fp_here").over(word).cast("bigint").alias("fp"),
        F.sum("tp_here").over(wall).cast("bigint").alias("pos"),
    )
    dtp = F.col("tp") - F.coalesce(F.lag("tp").over(word), F.lit(0))
    term = F.round(
        F.lit(1000000000.0)
        * (
            (dtp * F.col("tp"))
            / (F.col("pos") * (F.col("tp") + F.col("fp"))).cast("double")
        )
    ).cast("bigint")
    return (
        cum.withColumn("term", term)
        .select(
            "score",
            "tp",
            "fp",
            F.round(F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"), 9).alias(
                "precision"
            ),
            F.round(F.col("tp") / F.col("pos").cast("double"), 9).alias("recall"),
            F.round(
                F.sum("term").over(wall).cast("double") / 1000000000.0, 9
            ).alias("average_precision"),
        )
        .orderBy(F.desc("score"))
    )


# --------------------------------------------------------------------------
# Strided sliding-window chunking (pretraining context windows w/ overlap)
# --------------------------------------------------------------------------

_SW_W = 64  # window size (tokens)
_SW_S = 48  # stride (=> 16-token overlap)


def _sql_sliding_windows() -> str:
    toks = tx.sql_tokens("text")
    w, s = _SW_W, _SW_S
    return f"""
WITH t AS (
  SELECT doc_id, toks, len(toks) AS n
  FROM (SELECT doc_id, {toks} AS toks FROM documents)
  WHERE len(toks) >= 1
),
st AS (
  SELECT doc_id, toks, n,
         list_sort(list_distinct(list_append(
           generate_series(1, greatest(1, n - {w - 1}), {s}),
           greatest(1, n - {w - 1})))) AS starts
  FROM t
),
ex AS (
  SELECT doc_id, toks, n, unnest(starts) AS start_tok FROM st
),
win AS (
  SELECT doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_tok)
              AS BIGINT) AS window_seq,
         CAST(start_tok AS BIGINT) AS start_tok,
         CAST(least(start_tok + {w - 1}, n) - start_tok + 1 AS BIGINT)
           AS n_window_tokens,
         md5(array_to_string(
           list_slice(toks, start_tok, least(start_tok + {w - 1}, n)), ' '))
           AS fingerprint
  FROM ex
)
SELECT doc_id, window_seq, start_tok, n_window_tokens, fingerprint
FROM win ORDER BY doc_id, window_seq
"""


@register(
    "pack_sliding_windows",
    oracle=_sql_sliding_windows(),
    tags=("packing", "chunking", "pretraining", "tokens"),
)
def pack_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided sliding-window chunking — the standard pretraining
    context-window layout (GPT-2's 1024-stride-512 shape, here W=64 /
    S=48, i.e. 16-token overlap so no span is ever split across a
    window boundary without also appearing whole in a neighbor): window
    starts are the arithmetic sequence 1, 1+S, ... capped at n−W+1,
    plus the tail-anchored start n−W+1 so the final window always ends
    exactly at the last token. Complements ``pack_chunks_documents``
    (cross-document stream chunking) with the WITHIN-document form.

    Entirely row-local (the 100 TB shape: map-only explode, no shuffle
    until the output sort): token array projected once per row, start
    list built by an integer sequence, each window sliced from the
    array and fingerprinted with md5 over the space-joined tokens —
    the fingerprint makes the window content itself hash-checked, not
    just its geometry. Short docs (n < W) yield exactly one window
    [1..n] on both engines."""
    docs = _t(spark, sf_dir, "documents")
    w, s = _SW_W, _SW_S
    base = docs.select("doc_id", tx.tokens("text").alias("toks")).withColumn(
        "n", F.size("toks")
    ).filter(F.col("n") >= 1)
    tail = F.greatest(F.lit(1), F.col("n") - (w - 1))
    starts = F.array_sort(
        F.array_union(F.sequence(F.lit(1), tail, F.lit(s)), F.array(tail))
    )
    ex = base.select(
        "doc_id",
        "toks",
        "n",
        F.posexplode(starts).alias("pos0", "start_tok"),
    )
    end = F.least(F.col("start_tok") + (w - 1), F.col("n"))
    win = F.slice(F.col("toks"), F.col("start_tok"), end - F.col("start_tok") + 1)
    return (
        ex.select(
            "doc_id",
            (F.col("pos0") + 1).cast("bigint").alias("window_seq"),
            F.col("start_tok").cast("bigint").alias("start_tok"),
            (end - F.col("start_tok") + 1).cast("bigint").alias("n_window_tokens"),
            F.md5(F.concat_ws(" ", win)).alias("fingerprint"),
        )
        .orderBy("doc_id", "window_seq")
    )

"""Round-6 additions, part 7: multivariate OLS via distributed normal
equations, reciprocal-rank fusion, and Benjamini-Hochberg FDR control.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle) pairs with identical semantics — exact-integer
sufficient statistics, identical scalar-algebra expression text on both
sides wherever doubles are combined, total orderings at every row
selection — hash-compared at sf0.01 by the driver.

Reference parity: extends SURVEY.md §2's aggregation family (A1/A7 and
the regression_by_key single-feature fit) to the multivariate /
multiple-testing readouts an analytics pipeline layer needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t

# --------------------------------------------------------------------------
# Multiple linear regression via normal equations + Cramer's rule
# --------------------------------------------------------------------------


def _sql_multiple_ols() -> str:
    # 3x3 determinant, written with the SAME association order as the
    # Spark side so the double arithmetic is bit-identical.
    def det(a, b, c, d, e, f, g, h, i):
        return (
            f"({a} * ({e} * {i} - {f} * {h}) - {b} * ({d} * {i} - {f} * {g})"
            f" + {c} * ({d} * {h} - {e} * {g}))"
        )

    dm = det("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    d0 = det("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
    d1 = det("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
    d2 = det("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")
    return f"""
WITH q AS (
  SELECT CAST(round(l_quantity * 100.0) AS BIGINT) AS x1,
         CAST(round(l_discount * 10000.0) AS BIGINT) AS x2,
         CAST(round(l_extendedprice * 100.0) AS BIGINT) AS y
  FROM lineitem
),
g AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(sum(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
         CAST(sum(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
         CAST(sum(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
         CAST(sum(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
         CAST(sum(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
         CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
  FROM q
),
b AS (
  SELECT n, sy, s1y, s2y, syy,
         {d0} / {dm} AS b0, {d1} / {dm} AS b1, {d2} / {dm} AS b2
  FROM g
)
SELECT CAST(n AS BIGINT) AS n,
       round(b0 / 100.0, 6) AS beta0,
       round(b1, 6) AS beta1,
       round(b2 * 100.0, 6) AS beta2,
       round(1.0 - (syy - b0 * sy - b1 * s1y - b2 * s2y)
                   / (syy - sy * sy / n), 9) AS r_sq
FROM b
"""


@register(
    "regression_multiple_ols",
    oracle=_sql_multiple_ols(),
    tags=("stats", "regression", "normal-equations", "scale-path"),
)
def regression_multiple_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression (two features + intercept) fit by the
    textbook distributed-ML recipe: one map-side-combined pass collects
    the normal-equation sufficient statistics X'X and X'y, then the
    3x3 system solves in closed form with Cramer's rule — no gradient
    loop, no driver-side data. Fits l_extendedprice ~ l_quantity +
    l_discount; coefficients are reported in original units and r^2
    from the standard SSE identity Syy - b.X'y.

    Exactness: inputs quantize to integer cents / basis points; every
    cross-moment accumulates those bigints in decimal(38,0) on Spark /
    HUGEINT in DuckDB (exact at any corpus size); the determinant
    expressions are written with the same association order on both
    engines, so the doubles agree bit-for-bit.

    Scale shape: a single aggregate — partial-aggregated map-side, one
    1-row reduce. This is the canonical 'learn on 100 TB with one
    shuffle-free pass' plan; adding features grows the statistic count
    quadratically but the pass count not at all."""
    li = _t(spark, sf_dir, "lineitem")
    q = li.select(
        F.round(F.col("l_quantity") * 100.0).cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 10000.0).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100.0).cast("bigint").alias("y"),
    )

    def dsum2(a: str, b: str):
        return F.sum(F.col(a).cast("decimal(38,0)") * F.col(b)).cast("double")

    g = q.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x1").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(F.col("x2").cast("decimal(38,0)")).cast("double").alias("s2"),
        F.sum(F.col("y").cast("decimal(38,0)")).cast("double").alias("sy"),
        dsum2("x1", "x1").alias("s11"),
        dsum2("x2", "x2").alias("s22"),
        dsum2("x1", "x2").alias("s12"),
        dsum2("x1", "y").alias("s1y"),
        dsum2("x2", "y").alias("s2y"),
        dsum2("y", "y").alias("syy"),
    )

    def det(a, b, c, d, e, f_, g_, h, i):
        return (
            F.col(a) * (F.col(e) * F.col(i) - F.col(f_) * F.col(h))
            - F.col(b) * (F.col(d) * F.col(i) - F.col(f_) * F.col(g_))
            + F.col(c) * (F.col(d) * F.col(h) - F.col(e) * F.col(g_))
        )

    dm = det("n", "s1", "s2", "s1", "s11", "s12", "s2", "s12", "s22")
    d0 = det("sy", "s1", "s2", "s1y", "s11", "s12", "s2y", "s12", "s22")
    d1 = det("n", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", "s22")
    d2 = det("n", "s1", "sy", "s1", "s11", "s1y", "s2", "s12", "s2y")
    b = g.select(
        "n",
        "sy",
        "s1y",
        "s2y",
        "syy",
        (d0 / dm).alias("b0"),
        (d1 / dm).alias("b1"),
        (d2 / dm).alias("b2"),
    )
    sse = (
        F.col("syy")
        - F.col("b0") * F.col("sy")
        - F.col("b1") * F.col("s1y")
        - F.col("b2") * F.col("s2y")
    )
    sst = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return b.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("b0") / 100.0, 6).alias("beta0"),
        F.round(F.col("b1"), 6).alias("beta1"),
        F.round(F.col("b2") * 100.0, 6).alias("beta2"),
        F.round(F.lit(1.0) - sse / sst, 9).alias("r_sq"),
    )


# --------------------------------------------------------------------------
# Reciprocal-rank fusion of two retrieval rankings
# --------------------------------------------------------------------------

_RRF_K = 60
_RRF_LIST = 100
_RRF_TOP = 20


def _sql_rrf() -> str:
    return f"""
WITH scored AS (
  SELECT doc_id, n_chars,
         CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS spaces
  FROM documents
),
ra AS (
  SELECT doc_id, r AS rank_a FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
    FROM scored
  ) WHERE r <= {_RRF_LIST}
),
rb AS (
  SELECT doc_id, r AS rank_b FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY spaces DESC, doc_id) AS r
    FROM scored
  ) WHERE r <= {_RRF_LIST}
),
fused AS (
  SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
         CAST(rank_a AS INT) AS rank_a, CAST(rank_b AS INT) AS rank_b,
         coalesce(1.0 / ({_RRF_K} + rank_a), 0.0)
           + coalesce(1.0 / ({_RRF_K} + rank_b), 0.0) AS score
  FROM ra FULL OUTER JOIN rb USING (doc_id)
)
SELECT doc_id, rank_a, rank_b, round(score, 9) AS rrf_score
FROM fused
ORDER BY score DESC, doc_id
LIMIT {_RRF_TOP}
"""


@register(
    "rank_fusion_rrf",
    oracle=_sql_rrf(),
    tags=("retrieval", "ranking", "fusion", "topk"),
)
def rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.'s RRF, k=60) of two
    retrieval rankings over the document corpus: ranker A orders by
    n_chars (longest-document heuristic), ranker B by whitespace-token
    count (a lexical-density heuristic that disagrees with A where
    word lengths vary). Each ranker contributes its top-100 list; a
    document's fused score is the sum of 1/(60+rank) over the lists
    that retrieved it, and the top-20 fused documents are returned —
    the exact list-fusion semantics used to combine BM25 with dense
    retrievers.

    Exactness: both rankings are made total with a doc_id tiebreak;
    the two reciprocal terms are added in a fixed order (A then B, via
    coalesce-to-zero), so scores are identical doubles on both engines.

    Scale shape: each top-100 list is orderBy().limit() — Spark's
    TakeOrdered, a map-side partial top-k with no global sort — and
    row_number then runs over the 100-row frames only. The fusion join
    is 100x100-row, broadcast. The oracle's full-table window is the
    semantic spec; the Spark plan never materializes a global rank."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))).alias(
            "spaces"
        ),
    )

    def toplist(order_col: str, rank_name: str) -> DataFrame:
        cand = (
            docs.select("doc_id", order_col)
            .orderBy(F.desc(order_col), "doc_id")
            .limit(_RRF_LIST)
        )
        w = Window.orderBy(F.desc(order_col), "doc_id")
        return cand.select(
            "doc_id", F.row_number().over(w).cast("int").alias(rank_name)
        )

    ra = toplist("n_chars", "rank_a")
    rb = toplist("spaces", "rank_b")
    fused = (
        ra.join(rb, "doc_id", "full_outer")
        .select(
            "doc_id",
            "rank_a",
            "rank_b",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_a")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_b")), F.lit(0.0)
                )
            ).alias("score"),
        )
    )
    return (
        fused.orderBy(F.desc("score"), "doc_id")
        .limit(_RRF_TOP)
        .select("doc_id", "rank_a", "rank_b", F.round("score", 9).alias("rrf_score"))
    )


# --------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-nation mean tests
# --------------------------------------------------------------------------

_BH_ALPHA = 0.05


def _sql_fdr_bh() -> str:
    # Bowling et al.'s logistic approximation to the normal CDF:
    # Phi(z) ~ 1 / (1 + exp(-1.5976 z - 0.07056 z^3)); identical
    # expression text on both engines.
    return f"""
WITH q AS (
  SELECT c_nationkey, CAST(round(c_acctbal * 100.0) AS BIGINT) AS a
  FROM customer
),
g AS (
  SELECT c_nationkey,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CAST(a AS HUGEINT)) AS DOUBLE) AS s_g
  FROM q GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(CAST(a AS HUGEINT)) AS DOUBLE) AS s,
         CAST(sum(CAST(a AS HUGEINT) * a) AS DOUBLE) AS ss
  FROM q
),
z AS (
  SELECT c_nationkey, n_g,
         (s_g / n_g - s / n) / sqrt(((ss - s * s / n) / (n - 1)) / n_g) AS zs
  FROM g, tot
),
p AS (
  SELECT c_nationkey, n_g, zs,
         2.0 * (1.0 - 1.0 / (1.0 + exp(-1.5976 * abs(zs)
               - 0.07056 * abs(zs) * abs(zs) * abs(zs)))) AS pv
  FROM z
),
rk AS (
  SELECT c_nationkey, n_g, zs, pv,
         row_number() OVER (ORDER BY pv, c_nationkey) AS i,
         CAST(count(*) OVER () AS DOUBLE) AS m
  FROM p
),
km AS (
  SELECT max(CASE WHEN pv <= i * {_BH_ALPHA} / m THEN i ELSE 0 END) AS k_max
  FROM rk
)
SELECT CAST(c_nationkey AS INT) AS nationkey, n_g AS n_customers,
       round(zs, 6) AS z_stat, round(pv, 6) AS p_value,
       round(i * {_BH_ALPHA} / m, 6) AS bh_critical,
       CAST(CASE WHEN i <= k_max THEN 1 ELSE 0 END AS INT) AS rejected
FROM rk, km
ORDER BY nationkey
"""


@register(
    "stats_fdr_bh_nations",
    oracle=_sql_fdr_bh(),
    tags=("stats", "multiple-testing", "fdr", "hypothesis-test"),
)
def stats_fdr_bh_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg false-discovery-rate control over a family of
    per-group hypothesis tests — the multiple-testing step every
    metrics sweep needs once it tests tens of segments at once. Family:
    for each nation, a z-test of whether that nation's mean customer
    balance differs from the global mean (global variance, normal
    approximation via the Bowling logistic CDF — a closed-form both
    engines evaluate identically). BH then sorts the m p-values,
    finds the largest i with p_(i) <= i*alpha/m, and rejects the first
    k_max of them (alpha=0.05).

    Exactness: group and global moments are exact integer-cent sums
    (HUGEINT/decimal); z, p, and the BH critical values are single
    double expressions over those integers with a nationkey tiebreak
    making the p-value order total.

    Scale shape: one map-side-combined groupBy(nation) + one 1-row
    global moment pass over the same scan; every window (rank, k_max)
    runs over the m=25-row test frame, never the data. The testing
    layer is O(m log m) on a frame of group cardinality — unchanged at
    100 TB."""
    cust = _t(spark, sf_dir, "customer")
    q = cust.select(
        "c_nationkey", F.round(F.col("c_acctbal") * 100.0).cast("bigint").alias("a")
    )
    ad = F.col("a").cast("decimal(38,0)")
    g = q.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum(ad).cast("double").alias("s_g"),
    )
    tot = q.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(ad).cast("double").alias("s"),
        F.sum(ad * F.col("a")).cast("double").alias("ss"),
    )
    zs = (
        F.col("s_g") / F.col("n_g") - F.col("s") / F.col("n")
    ) / F.sqrt(
        ((F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1))
        / F.col("n_g")
    )
    z = g.crossJoin(F.broadcast(tot)).select("c_nationkey", "n_g", zs.alias("zs"))
    az = F.abs(F.col("zs"))
    pv = F.lit(2.0) * (
        F.lit(1.0)
        - F.lit(1.0)
        / (F.lit(1.0) + F.exp(F.lit(-1.5976) * az - F.lit(0.07056) * az * az * az))
    )
    p = z.select("c_nationkey", "n_g", "zs", pv.alias("pv"))
    wr = Window.orderBy("pv", "c_nationkey")
    wall = Window.partitionBy()
    rk = p.select(
        "c_nationkey",
        "n_g",
        "zs",
        "pv",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wall).cast("double").alias("m"),
    )
    flag_i = F.when(
        F.col("pv") <= F.col("i") * _BH_ALPHA / F.col("m"), F.col("i")
    ).otherwise(F.lit(0))
    rk = rk.withColumn("k_max", F.max(flag_i).over(wall))
    return rk.select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        F.col("n_g").alias("n_customers"),
        F.round("zs", 6).alias("z_stat"),
        F.round("pv", 6).alias("p_value"),
        F.round(F.col("i") * _BH_ALPHA / F.col("m"), 6).alias("bh_critical"),
        F.when(F.col("i") <= F.col("k_max"), 1).otherwise(0).cast("int").alias(
            "rejected"
        ),
    ).orderBy("nationkey")

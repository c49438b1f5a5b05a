"""Round-3 tenth tranche: rolling engagement metrics (DAU/WAU/MAU +
stickiness) and the dominant principal component of the embedding
corpus by distributed power iteration.

Every entry follows the catalog contract: a PySpark program plus a
DuckDB oracle replaying identical semantics. The PCA iteration
quantizes every dot-product term and every accumulation on the nano
grid, so the 3-step trajectory — including the normalization — is
bit-reproducible across engines and partitionings (same discipline as
graph_pagerank_bipartite)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t

_NANO_SQL = "CAST(round(({x}) * 1000000000.0) AS BIGINT)"


# --------------------------------------------------------------------------
# Rolling engagement: DAU / WAU(7) / MAU(30) / stickiness
# --------------------------------------------------------------------------

@register(
    "growth_rolling_engagement",
    oracle="""
WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1),
wau AS (
  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM days d JOIN du u
    ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
  GROUP BY 1
),
mau AS (
  SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS mau
  FROM days d JOIN du u
    ON u.day <= d.day AND u.day >= d.day - INTERVAL 29 DAY
  GROUP BY 1
)
SELECT d.day, a.dau, w.wau, m.mau,
       round(CAST(a.dau AS DOUBLE) / m.mau, 6) AS stickiness
FROM days d JOIN dau a USING (day) JOIN wau w USING (day) JOIN mau m USING (day)
ORDER BY d.day
""",
    tags=("growth", "engagement", "rolling-distinct"),
)
def growth_rolling_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-distinct engagement: per observed day, the distinct
    actives that day (DAU), over the trailing 7 days (WAU) and 30 days
    (MAU), plus DAU/MAU stickiness. Rolling DISTINCT cannot use a sum
    window — the scalable exact plan dedups to (day, user) first, then
    EXPLODES each pair onto the ≤7 / ≤30 target days it can serve and
    counts distinct per target day: shuffle volume is 37× the deduped
    pair count (bounded, linear), never events × window. The oracle
    computes the same windows as range joins. At larger windows the
    exact explode trades against merged HLL sketches (approx_distinct
    machinery) — the contract stays per-day rows."""
    du = (
        _t(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    max_day = days.agg(F.max("day").alias("max_day"))
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))

    def rolling(window_days: int, out: str) -> DataFrame:
        # each (day, user) serves target days [day, day + w - 1]
        targets = (
            du.crossJoin(F.broadcast(max_day))
            .select(
                F.explode(
                    F.sequence(
                        F.col("day"),
                        F.least(
                            F.col("day")
                            + F.expr(f"INTERVAL {window_days - 1} DAY"),
                            F.col("max_day"),
                        ),
                        F.expr("INTERVAL 1 DAY"),
                    )
                ).alias("tday"),
                "user_id",
            )
        )
        return (
            targets.join(days.select(F.col("day").alias("tday")), "tday")
            .groupBy("tday")
            .agg(F.countDistinct("user_id").alias(out))
        )

    wau = rolling(7, "wau")
    mau = rolling(30, "mau")
    return (
        days.join(dau, "day")
        .join(wau.withColumnRenamed("tday", "day"), "day")
        .join(mau.withColumnRenamed("tday", "day"), "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


# --------------------------------------------------------------------------
# Dominant principal component by power iteration
# --------------------------------------------------------------------------

_PCA_ITERS = 3
_PCA_DIMS = 64


def _pca_oracle() -> str:
    dot_terms = (
        f"list_aggregate(list_transform(range(1, {_PCA_DIMS + 1}), "
        f"j -> {_NANO_SQL.format(x='CAST(e.embedding[j] AS DOUBLE) * v.vec[j]')}), 'sum')"
    )
    head = f"""
WITH emb AS (SELECT vec_id, embedding FROM embeddings),
v0 AS (SELECT list_transform(range(1, {_PCA_DIMS + 1}),
                             j -> CASE WHEN j = 1 THEN 1.0 ELSE 0.0 END) AS vec)"""
    parts = []
    for i in range(_PCA_ITERS):
        parts.append(
            f""",
s{i} AS (
  SELECT e.vec_id, e.embedding,
         CAST({dot_terms} AS DOUBLE) / 1000000000.0 AS s
  FROM emb e CROSS JOIN v{i} v
),
p{i} AS (
  SELECT u.j AS dim,
         CAST(SUM(CAST({_NANO_SQL.format(x='CAST(s.embedding[u.j] AS DOUBLE) * s.s')}
                       AS HUGEINT)) AS DOUBLE) / 1000000000.0 AS p
  FROM s{i} s CROSS JOIN (SELECT unnest(range(1, {_PCA_DIMS + 1})) AS j) u
  GROUP BY u.j
),
n{i} AS (
  SELECT sqrt(CAST(SUM(CAST({_NANO_SQL.format(x='p * p')} AS HUGEINT)) AS DOUBLE)
              / 1000000000.0) AS nrm
  FROM p{i}
),
v{i + 1} AS (
  SELECT list(round(p.p / n.nrm, 9) ORDER BY p.dim) AS vec
  FROM p{i} p CROSS JOIN n{i} n
)"""
        )
    tail = f""",
final AS (
  SELECT unnest(vec) AS loading,
         generate_subscripts(vec, 1) AS dim
  FROM v{_PCA_ITERS}
)
SELECT CAST(dim AS BIGINT) AS dim, loading FROM final ORDER BY dim"""
    return head + "".join(parts) + tail


@register(
    "embeddings_pca_power_component",
    oracle=_pca_oracle(),
    tags=("pca", "linear-algebra", "iterative"),
)
def embeddings_pca_power_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the (uncentered) embedding
    second-moment matrix by distributed power iteration — v ← Σᵢ xᵢ(xᵢ·v)
    normalized, 3 synchronous steps from e₁. Each step is ONE pass over
    the corpus: a zip_with dot product per row (terms quantized to nano
    integers, so the row score is order-free), then a posexplode +
    per-dimension integer aggregation for the matrix-vector product —
    never a materialized covariance matrix (64² entries is trivial, but
    at LLM-embedding widths d², and the pass structure shown here, is
    what survives). The unit vector rides along as a broadcast 1-row
    array frame, exactly like the k-means centroid literals; the DuckDB
    oracle replays all 3 iterations as unrolled CTEs and the final
    64 loadings hash-match — an engine-independent fixed-point
    trajectory, the same discipline as graph_pagerank_bipartite."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    v = spark.range(1).select(
        F.expr(
            f"transform(sequence(1, {_PCA_DIMS}),"
            " j -> CASE WHEN j = 1 THEN 1.0D ELSE 0.0D END)"
        ).alias("vec")
    )
    for _ in range(_PCA_ITERS):
        scored = emb.crossJoin(F.broadcast(v)).select(
            "embedding",
            (
                F.expr(
                    "aggregate(zip_with(embedding, vec,"
                    " (x, w) -> CAST(round(CAST(x AS DOUBLE) * w * 1000000000.0)"
                    " AS BIGINT)), 0L, (a, t) -> a + t)"
                ).cast("double")
                / F.lit(1e9)
            ).alias("s"),
        )
        p = (
            scored.select(
                F.posexplode("embedding").alias("pos", "x"),
                "s",
            )
            .groupBy((F.col("pos") + 1).alias("dim"))
            .agg(
                (
                    F.sum(
                        F.round(
                            F.col("x").cast("double") * F.col("s") * F.lit(1e9)
                        ).cast("decimal(38,0)")
                    ).cast("double")
                    / F.lit(1e9)
                ).alias("p")
            )
        )
        # norm accumulates quantized squares in Decimal128 — a float sum
        # over the 64 p's would be order-dependent and 1-ulp divergent
        nrm = p.agg(
            F.sqrt(
                F.sum(
                    F.round(F.col("p") * F.col("p") * F.lit(1e9)).cast("decimal(38,0)")
                ).cast("double")
                / F.lit(1e9)
            ).alias("nrm")
        )
        v = (
            p.crossJoin(F.broadcast(nrm))
            .select("dim", F.round(F.col("p") / F.col("nrm"), 9).alias("loading"))
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(dim, loading))),"
                    " s -> s.loading)"
                ).alias("vec")
            )
        )
    return (
        v.select(F.posexplode("vec").alias("pos", "loading"))
        .select((F.col("pos") + 1).cast("bigint").alias("dim"), "loading")
        .orderBy("dim")
    )

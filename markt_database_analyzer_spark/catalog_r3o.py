"""Round-3 sixteenth tranche: Kaplan-Meier survival, deterministic
subsample bootstrap, STL-style seasonal decomposition residuals, boxplot
five-number summaries, MinHash Jaccard estimation accuracy, and the
Spark 4 SQL pipe syntax surface.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs
with identical semantics; log/exp terms are quantized to nano-units
before any cumulative sum so the product chains are exact-integer
reductions (the bigram-LM / PageRank discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DAVG, register, _t
from .datapipe import dedup as dd
from .datapipe.hashing import hash60, sql_hash60
from .datapipe.sampling import RESOLUTION
from .functions.aggregates import davg
from .operators.rolling import centered_rolling_mean


def _sql_kaplan_meier() -> str:
    return """
WITH u AS (
  SELECT user_id,
         CAST(min(date_trunc('day', ts)) AS DATE) AS first_day,
         CAST(max(date_trunc('day', ts)) AS DATE) AS last_day
  FROM events GROUP BY user_id
),
mx AS (SELECT max(last_day) AS max_day FROM u),
d AS (
  SELECT date_diff('day', first_day, last_day) AS t,
         CASE WHEN last_day < max_day THEN 1 ELSE 0 END AS ev
  FROM u, mx
),
pt AS (
  SELECT t,
         CAST(sum(ev) AS BIGINT) AS d_events,
         CAST(count(*) - sum(ev) AS BIGINT) AS c_censored,
         CAST(count(*) AS BIGINT) AS tot
  FROM d GROUP BY t
),
rk AS (
  SELECT t, d_events, c_censored,
         CAST(sum(tot) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
  FROM pt
),
et AS (SELECT * FROM rk WHERE d_events > 0),
cm AS (
  SELECT t, d_events, c_censored, n_risk,
         sum(CASE WHEN d_events < n_risk
                  THEN CAST(round(ln(1.0 - CAST(d_events AS DOUBLE) / n_risk) * 1e9)
                       AS BIGINT)
                  ELSE 0 END) OVER (ORDER BY t) AS cum_lq,
         max(CASE WHEN d_events >= n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t)
           AS zerod
  FROM et
)
SELECT CAST(t AS INT) AS t_days, n_risk, d_events, c_censored,
       CASE WHEN zerod = 1 THEN 0.0 ELSE round(exp(cum_lq / 1e9), 9) END
         AS survival
FROM cm ORDER BY t_days
"""


@register(
    "events_kaplan_meier",
    oracle=_sql_kaplan_meier(),
    tags=("survival", "retention", "stats"),
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over user lifetimes: duration =
    days between a user's first and last event; users whose last day is
    the corpus max day are right-censored. S(t) = Π(1 - d_u/n_u) over
    event times, computed as an exact-integer prefix sum of
    nano-quantized log-hazard terms (exp at the very end) — the
    product-chain discipline shared with PageRank/EWMA, so both engines
    walk the identical trajectory. Risk sets are a suffix sum over the
    per-duration frame (cardinality = distinct durations, ~days — the
    ordered windows never touch raw rows). The d == n_risk edge (last
    cohort all churning) pins survival to exactly 0 instead of ln(0).
    The corpus max-day is the 1-row scalar broadcast idiom."""
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.to_date(F.min(F.date_trunc("day", "ts"))).alias("first_day"),
        F.to_date(F.max(F.date_trunc("day", "ts"))).alias("last_day"),
    )
    mx = u.agg(F.max("last_day").alias("max_day"))
    d = u.crossJoin(F.broadcast(mx)).select(
        F.datediff("last_day", "first_day").alias("t"),
        F.when(F.col("last_day") < F.col("max_day"), 1).otherwise(0).alias("ev"),
    )
    pt = d.groupBy("t").agg(
        F.sum("ev").alias("d_events"),
        (F.count(F.lit(1)) - F.sum("ev")).alias("c_censored"),
        F.count(F.lit(1)).alias("tot"),
    )
    wdesc = Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0)
    rk = pt.select(
        "t", "d_events", "c_censored", F.sum("tot").over(wdesc).alias("n_risk")
    )
    et = rk.filter(F.col("d_events") > 0)
    wasc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    lq = F.when(
        F.col("d_events") < F.col("n_risk"),
        F.round(
            F.log(F.lit(1.0) - F.col("d_events").cast("double") / F.col("n_risk"))
            * 1e9
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    cm = et.select(
        "t",
        "d_events",
        "c_censored",
        "n_risk",
        F.sum(lq).over(wasc).alias("cum_lq"),
        F.max(
            F.when(F.col("d_events") >= F.col("n_risk"), 1).otherwise(0)
        ).over(wasc).alias("zerod"),
    )
    return cm.select(
        F.col("t").cast("int").alias("t_days"),
        "n_risk",
        "d_events",
        "c_censored",
        F.when(F.col("zerod") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cum_lq") / 1e9), 9))
        .alias("survival"),
    ).orderBy("t_days")


_BOOT_B = 64
_BOOT_SEED = 100


def _sql_bootstrap() -> str:
    # gate = (h(id) + h(b)) mod RESOLUTION: one md5 per EVENT plus one
    # per RESAMPLE instead of one per (event × resample) — B× fewer
    # hashes on the Spark side (11s -> ~2s at sf0.1), same determinism
    # and engine-portability (integer addition of two 60-bit hashes
    # fits int64). The mix is a keyed rotation of a uniform hash, so
    # per-resample membership stays a fair coin per id.
    hid = sql_hash60("event_id::VARCHAR", seed=_BOOT_SEED)
    ob = sql_hash60("b::VARCHAR")
    return f"""
WITH rs AS (
  SELECT b, {SQL_DAVG.format(x='value')} AS mean_b
  FROM events, unnest(generate_series(0, {_BOOT_B - 1})) AS u(b)
  WHERE (({hid} + {ob}) % {RESOLUTION}) < {RESOLUTION // 2}
  GROUP BY b
)
SELECT CAST(count(*) AS BIGINT) AS n_resamples,
       round({SQL_DAVG.format(x='mean_b')}, 6) AS mean_of_means,
       round(quantile_cont(mean_b, 0.05), 6) AS ci_lo,
       round(quantile_cont(mean_b, 0.95), 6) AS ci_hi
FROM rs
"""


@register(
    "stats_bootstrap_ci",
    oracle=_sql_bootstrap(),
    tags=("stats", "bootstrap", "sampling"),
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic subsample bootstrap (m-out-of-n, m = n/2) for the
    mean event value: 64 half-sample resamples, membership decided by a
    seeded hash gate (h(event_id) + h(resample#)) mod RESOLUTION —
    RNG-free, so every run and every engine draws the identical
    resamples (the property that makes a distributed bootstrap
    auditable), and hash-frugal: one md5 per event plus one per
    resample, never one per pair. The 90% CI is the
    [p05, p95] band of the 64 resample means. Plan: one explode(×B) →
    map-only gate → 64-group aggregate; at 100 TB the ×B blow-up is
    avoided by per-partition partial means per b (same shuffle bound:
    B × partitions rows), which this plan's map-side combine already
    approximates."""
    ev = _t(spark, sf_dir, "events").select(
        "value", hash60(F.col("event_id").cast("string"), seed=_BOOT_SEED).alias("h")
    )
    # per-resample offsets: B md5s total (vs B×n when hashing the pair)
    offsets = spark.range(_BOOT_B).select(
        F.col("id").cast("int").alias("b"),
        hash60(F.col("id").cast("string")).alias("ob"),
    )
    exploded = ev.select(
        "value", "h", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b")
    ).join(F.broadcast(offsets), "b")
    gate = F.pmod(F.col("h") + F.col("ob"), F.lit(RESOLUTION))
    rs = (
        exploded.filter(gate < RESOLUTION // 2)
        .groupBy("b")
        .agg(davg("value").alias("mean_b"))
    )
    return rs.agg(
        F.count(F.lit(1)).alias("n_resamples"),
        F.round(davg("mean_b"), 6).alias("mean_of_means"),
        F.round(F.percentile("mean_b", F.lit(0.05)), 6).alias("ci_lo"),
        F.round(F.percentile("mean_b", F.lit(0.95)), 6).alias("ci_hi"),
    )


_STL_W = 25


def _sql_stl() -> str:
    davg_val = SQL_DAVG.format(x="value")
    half = _STL_W // 2
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, {davg_val} AS x
  FROM events GROUP BY 1
),
tr AS (
  SELECT h, x,
         avg(x) OVER (ORDER BY h ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)
           AS trend
  FROM hourly
),
de AS (SELECT h, x, trend, x - trend AS detr FROM tr),
seas AS (
  SELECT hour(h) AS hod, {SQL_DAVG.format(x='detr')} AS seasonal
  FROM de GROUP BY 1
),
res AS (
  SELECT de.h, de.x, de.trend, seas.seasonal,
         de.detr - seas.seasonal AS resid
  FROM de JOIN seas ON hour(de.h) = seas.hod
),
sig AS (
  SELECT sqrt(CAST(sum(CAST(round(resid * resid * 1e9) AS BIGINT)) AS DOUBLE)
              / count(*) / 1e9) AS sigma
  FROM res
)
SELECT h, round(x, 6) AS x, round(trend, 6) AS trend,
       round(seasonal, 6) AS seasonal, round(resid, 6) AS residual,
       abs(resid) > 3 * sigma AS is_outlier
FROM res, sig
ORDER BY h
"""


@register(
    "ts_stl_residual_outliers",
    oracle=_sql_stl(),
    tags=("timeseries", "decomposition", "anomaly"),
)
def ts_stl_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style seasonal decomposition with residual outlier flags:
    trend = centered 25-hour rolling mean of the hourly series,
    seasonal = hour-of-day mean of the detrended values (24-cell index,
    broadcast back), residual = detrended - seasonal, outlier =
    |residual| > 3σ. The composition story: W2's rolling mean +
    ts_seasonal_index's cell index + the z-score gate, fused into one
    lazy plan. Ordered window runs over the hourly series (720 points
    at sf0.01 — series cardinality, never rows); σ is an exact
    nano-quantized moment and arrives as the 1-row scalar broadcast."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        davg("value").alias("x")
    )
    tr = centered_rolling_mean(hourly, "h", "x", _STL_W, out_col="trend")
    de = tr.withColumn("detr", F.col("x") - F.col("trend"))
    seas = de.groupBy(F.hour("h").alias("hod")).agg(davg("detr").alias("seasonal"))
    res = (
        de.join(F.broadcast(seas), F.hour(de["h"]) == seas["hod"])
        .withColumn("resid", F.col("detr") - F.col("seasonal"))
    )
    sig = res.agg(
        F.sqrt(
            F.sum(F.round(F.col("resid") * F.col("resid") * 1e9).cast("bigint")).cast(
                "double"
            )
            / F.count(F.lit(1))
            / F.lit(1e9)
        ).alias("sigma")
    )
    return (
        res.crossJoin(F.broadcast(sig))
        .select(
            "h",
            F.round("x", 6).alias("x"),
            F.round("trend", 6).alias("trend"),
            F.round("seasonal", 6).alias("seasonal"),
            F.round("resid", 6).alias("residual"),
            (F.abs(F.col("resid")) > 3 * F.col("sigma")).alias("is_outlier"),
        )
        .orderBy("h")
    )


def _sql_boxplot() -> str:
    return """
WITH st AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         min(value) AS vmin,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.5) AS median,
         quantile_cont(value, 0.75) AS q3,
         max(value) AS vmax
  FROM events GROUP BY event_type
),
f AS (
  SELECT *, q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM st
)
SELECT f.event_type, f.n,
       round(f.vmin, 6) AS vmin, round(f.q1, 6) AS q1,
       round(f.median, 6) AS median, round(f.q3, 6) AS q3,
       round(f.vmax, 6) AS vmax,
       CAST(count(*) FILTER (WHERE e.value < f.lo) AS BIGINT) AS n_low_outliers,
       CAST(count(*) FILTER (WHERE e.value > f.hi) AS BIGINT) AS n_high_outliers
FROM events e JOIN f ON e.event_type = f.event_type
GROUP BY f.event_type, f.n, f.vmin, f.q1, f.median, f.q3, f.vmax
ORDER BY f.event_type
"""


@register(
    "stats_boxplot_by_event_type",
    oracle=_sql_boxplot(),
    tags=("stats", "boxplot", "percentile"),
)
def stats_boxplot_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boxplot five-number summary per group with Tukey-fence outlier
    counts: exact percentiles (F.percentile ≡ quantile_cont, bit-equal —
    the pinned convention from percentiles_by_event_type), IQR fences
    computed on the unrounded quartiles, and a second pass that joins
    the broadcast per-group stats back to count fence violations. Two
    scans of the fact, one tiny broadcast — the same shape at any scale
    (group stats are |groups| rows)."""
    ev = _t(spark, sf_dir, "events")
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.5)).alias("median"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
        F.max("value").alias("vmax"),
    )
    f = st.withColumn("lo", F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).withColumn(
        "hi", F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    )
    return (
        ev.join(F.broadcast(f), "event_type")
        .groupBy("event_type", "n", "vmin", "q1", "median", "q3", "vmax")
        .agg(
            F.count(F.when(F.col("value") < F.col("lo"), 1)).alias("n_low_outliers"),
            F.count(F.when(F.col("value") > F.col("hi"), 1)).alias("n_high_outliers"),
        )
        .select(
            "event_type",
            "n",
            F.round("vmin", 6).alias("vmin"),
            F.round("q1", 6).alias("q1"),
            F.round("median", 6).alias("median"),
            F.round("q3", 6).alias("q3"),
            F.round("vmax", 6).alias("vmax"),
            "n_low_outliers",
            "n_high_outliers",
        )
        .orderBy("event_type")
    )


_MH_K = 16


def _sql_minhash_estimate(num_hashes: int = _MH_K, bands: int = 4, shingle_k: int = 3) -> str:
    rows = num_hashes // bands
    sh_expr = dd.sql_shingles("text", k=shingle_k)
    mins = ",\n    ".join(
        f"list_min(list_transform(sh, s -> {dd.sql_km_hash('s', i)})) AS m{i}"
        for i in range(num_hashes)
    )
    band_selects = []
    for b in range(bands):
        vals = " || ',' || ".join(f"m{i}::VARCHAR" for i in range(b * rows, (b + 1) * rows))
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, "
            f"{sql_hash60(f'({vals})', seed=1000 + b)} AS band_hash FROM sig"
        )
    bands_sql = "\nUNION ALL\n".join(band_selects)
    agree = " + ".join(
        f"(CASE WHEN sa.m{i} = sb.m{i} THEN 1 ELSE 0 END)" for i in range(num_hashes)
    )
    return f"""
WITH sh AS (SELECT doc_id, {sh_expr} AS sh FROM documents),
sig AS (SELECT doc_id, sh, {mins} FROM sh),
bands AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       ({agree}) / {num_hashes}.0 AS est_jaccard,
       len(list_intersect(sa.sh, sb.sh))::DOUBLE
         / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE
         AS exact_jaccard,
       abs(({agree}) / {num_hashes}.0
           - len(list_intersect(sa.sh, sb.sh))::DOUBLE
             / (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))::DOUBLE)
         AS abs_err
FROM cand c JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id
ORDER BY id_a, id_b
"""


@register(
    "dedup_minhash_jaccard_estimate",
    oracle=_sql_minhash_estimate(),
    tags=("dedup", "minhash", "sketch-accuracy"),
)
def dedup_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash accuracy audit: for every LSH candidate pair, the
    signature-agreement Jaccard estimate (matching components / k — the
    unbiased MinHash estimator) next to the exact shingle Jaccard and
    the absolute error. This is the operator a curation team runs before
    trusting a signature-only dedup at 100 TB, where exact verification
    is affordable only on the banded candidates (exactly where this
    computes it). Estimate and truth are both engine-portable integers
    (agreement count, |∩|, |∪|) over the identical K-M family, so the
    differential pins the estimator itself, not just its bound."""
    docs = _t(spark, sf_dir, "documents")
    # the shingle projection feeds THREE consumers (banding, signatures,
    # exact verify) and the signature table TWO joins — materialize both
    # (the dedup.py persist discipline; ints only, constant bytes/doc)
    sh = dd.shingle_projection(docs, "text", "doc_id", 3).localCheckpoint(eager=True)
    cand = dd.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=_MH_K, bands=4, shingled=sh
    )
    sig = dd.km_signatures(sh, num_hashes=_MH_K).localCheckpoint(eager=True)
    est = (
        cand.join(
            sig.select(F.col("doc").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
        )
        .join(
            sig.select(F.col("doc").alias("id_b"), F.col("sig").alias("sig_b")), "id_b"
        )
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda v: v
                )
            )
            / F.lit(float(_MH_K)),
        )
        .select("id_a", "id_b", "est_jaccard")
    )
    exact = dd.jaccard_pairs(docs, cand, "text", "doc_id", shingled=sh).withColumnRenamed(
        "jaccard", "exact_jaccard"
    )
    return (
        est.join(exact, ["id_a", "id_b"])
        .withColumn("abs_err", F.abs(F.col("est_jaccard") - F.col("exact_jaccard")))
        .orderBy("id_a", "id_b")
    )


_PIPE_SQL = """
FROM {t}
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
|> EXTEND CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000.0)
               AS DECIMAL(38,0)) AS revq
|> AGGREGATE CAST(count(*) AS BIGINT) AS n_rows,
             CAST(SUM(revq) AS DOUBLE) / 1000000.0 AS revenue
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 1000000.0)
                     AS HUGEINT)) AS DOUBLE) / 1000000.0 AS revenue
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "sql_pipe_syntax_revenue",
    oracle=_PIPE_ORACLE,
    tags=("sql", "surface", "pipe"),
)
def sql_pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax (FROM … |> WHERE … |> EXTEND … |>
    AGGREGATE — the composable query form from the 'SQL Has Problems'
    pipe-syntax proposal): the same deterministic revenue aggregate as
    the classic form, declared as a pipeline. DuckDB has no pipe parser,
    so the oracle is the semantically identical classic SQL — the hash
    match pins that the pipe program lowers to the same plan semantics.
    Catalyst compiles pipes to the ordinary logical plan, so there is
    no runtime cost to the surface."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_pipe_src")
    return spark.sql(_PIPE_SQL.format(t="lineitem_pipe_src"))

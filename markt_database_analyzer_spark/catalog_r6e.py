"""Round-6 additions, part 5: spread testing on the grouped-median
scale path, lexical burstiness, and RNG-free permutation testing.

Every entry follows the catalog contract — a PySpark program plus a
DuckDB oracle replaying identical semantics (same tie-breaks, same
integer/rounding grid), hash-compared at sf0.01 by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import text as tx
from .datapipe.hashing import hash60, sql_hash60
from .datapipe.sampling import RESOLUTION
from .operators.equidepth import grouped_value_counts_cum

# --------------------------------------------------------------------------
# Brown-Forsythe / Levene spread test (k-group variance homogeneity)
# --------------------------------------------------------------------------

_BF_GROUPS = ("A", "N", "R")


def _sql_brown_forsythe() -> str:
    cols = []
    for i, g in enumerate(_BF_GROUPS):
        c = f"grp = '{g}'"
        cols += [
            f"CAST(count(*) FILTER (WHERE {c}) AS DOUBLE) AS n{i}",
            f"CAST(sum(CAST(z AS HUGEINT)) FILTER (WHERE {c}) AS DOUBLE) AS s{i}",
            f"CAST(sum(CAST(z AS HUGEINT) * z) FILTER (WHERE {c}) AS DOUBLE) AS ss{i}",
        ]
    k = len(_BF_GROUPS)
    nn = " + ".join(f"n{i}" for i in range(k))
    ssum = " + ".join(f"s{i}" for i in range(k))
    ts = " + ".join(f"s{i} * s{i} / n{i}" for i in range(k))
    sss = " + ".join(f"ss{i}" for i in range(k))
    return f"""
WITH pts AS (
  SELECT l_returnflag AS grp,
         CAST(round(l_quantity * 100.0) AS BIGINT) AS v
  FROM lineitem
),
dom AS (
  SELECT grp, v, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(count(*)) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum
  FROM pts GROUP BY 1, 2
),
tot AS (SELECT grp, CAST(max(cum) AS BIGINT) AS n FROM dom GROUP BY 1),
med AS (
  SELECT grp, min(v) AS m FROM dom JOIN tot USING (grp)
  WHERE cum >= CAST(floor((n + 1) / 2.0) AS BIGINT) GROUP BY 1
),
zt AS (SELECT grp, abs(v - m) AS z FROM pts JOIN med USING (grp)),
g AS (SELECT {', '.join(cols)} FROM zt),
c AS (
  SELECT {nn} AS nn, ({ts}) - ({ssum}) * ({ssum}) / ({nn}) AS ssb,
         ({sss}) - ({ts}) AS ssw
  FROM g
)
SELECT CAST({k} AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
       round(ssb / (ssb + ssw), 9) AS eta_sq_z,
       round((ssb / {k - 1}) / (ssw / (nn - {k})), 6) AS w_stat
FROM c
"""


@register(
    "stats_levene_brownforsythe",
    oracle=_sql_brown_forsythe(),
    tags=("stats", "hypothesis-test", "variance", "scale-path"),
)
def stats_levene_brownforsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene's test with group MEDIANS, the
    robust recommended form) for homogeneity of quantity spread across
    the three return flags: W = one-way ANOVA F computed on the
    absolute deviations z = |x - median_g|. Completes the k-group
    triptych on this fixture — ``stats_anova_oneway`` compares means,
    ``stats_kruskal_wallis`` compares rank distributions, this compares
    SPREADS (the precondition check for the first).

    Scale path: the per-group medians come from the GROUPED distributed
    prefix sum over each group's distinct-value domain
    (``grouped_value_counts_cum`` — the ``_cuts`` machinery; never an
    un-partitioned window), selected at the lower-median rank
    floor((n+1)/2) — the ``stats_weighted_median`` convention. The
    medians broadcast back (k rows), z is an exact nonnegative BIGINT
    (integer cents minus integer median), and the W statistic reduces
    to the same FILTERed sufficient-statistics single pass +
    left-assoc k-group folds as the ANOVA entry. Verified against a
    naive per-group Python replay at sf0.01."""
    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_quantity") * 100.0).cast("bigint").alias("v"),
    )
    cum, _ = grouped_value_counts_cum(pts, F.col("grp"), F.col("v"))
    cum = cum.localCheckpoint(eager=True)
    tot = cum.groupBy("g").agg(F.max("cum").cast("bigint").alias("n"))
    med = (
        cum.join(tot, "g")
        .filter(
            F.col("cum") >= F.floor((F.col("n") + 1) / 2.0).cast("bigint")
        )
        .groupBy("g")
        .agg(F.min("v").alias("m"))
        .select(F.col("g").alias("grp"), "m")
    )
    zt = pts.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("v") - F.col("m")).alias("z")
    )
    aggs = []
    for i, g in enumerate(_BF_GROUPS):
        c = F.col("grp") == g
        zq = F.col("z").cast("decimal(38,0)")
        aggs += [
            F.count(F.when(c, F.lit(1))).cast("double").alias(f"n{i}"),
            F.sum(F.when(c, zq)).cast("double").alias(f"s{i}"),
            F.sum(F.when(c, zq * zq)).cast("double").alias(f"ss{i}"),
        ]
    s = zt.agg(*aggs)
    k = len(_BF_GROUPS)
    nn = F.col("n0")
    ssum = F.col("s0")
    ts = F.col("s0") * F.col("s0") / F.col("n0")
    sss = F.col("ss0")
    for i in range(1, k):
        nn = nn + F.col(f"n{i}")
        ssum = ssum + F.col(f"s{i}")
        ts = ts + F.col(f"s{i}") * F.col(f"s{i}") / F.col(f"n{i}")
        sss = sss + F.col(f"ss{i}")
    ssb = ts - ssum * ssum / nn
    ssw = sss - ts
    return s.select(
        F.lit(k).cast("bigint").alias("k"),
        nn.cast("bigint").alias("n"),
        F.round(ssb / (ssb + ssw), 9).alias("eta_sq_z"),
        F.round((ssb / F.lit(k - 1)) / (ssw / (nn - F.lit(k))), 6).alias("w_stat"),
    )


# --------------------------------------------------------------------------
# Term burstiness (Fano factor of per-document term counts)
# --------------------------------------------------------------------------

_BURST_TOPN = 20


def _sql_burstiness() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH tc AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest({toks}) AS t FROM documents)
  GROUP BY 1, 2
),
per_term AS (
  SELECT t AS term,
         CAST(sum(c) AS BIGINT) AS total_cnt,
         CAST(count(*) AS BIGINT) AS doc_freq,
         CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS s2
  FROM tc GROUP BY 1
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT term, total_cnt, doc_freq, n_docs,
       round(total_cnt / CAST(n_docs AS DOUBLE), 9) AS mean_per_doc,
       round((CAST(s2 AS DOUBLE) / n_docs
              - (total_cnt / CAST(n_docs AS DOUBLE)) * (total_cnt / CAST(n_docs AS DOUBLE)))
             / (total_cnt / CAST(n_docs AS DOUBLE)), 9) AS fano_vmr
FROM per_term CROSS JOIN nd
ORDER BY total_cnt DESC, term LIMIT {_BURST_TOPN}
"""


@register(
    "text_burstiness",
    oracle=_sql_burstiness(),
    tags=("text", "lexical-stats", "burstiness"),
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term burstiness for the top-20 corpus terms — the Fano factor
    (variance-to-mean ratio) of per-document occurrence counts over ALL
    documents, zeros included (Church & Gale 1995): function words sit
    near the Poisson baseline VMR = 1 while content/boilerplate terms
    are over-dispersed — the lexical diagnostic that separates topical
    vocabulary from template spam, complementing ``text_hapax_richness``
    (frequency-1 tail) and ``text_zipf_fit`` (rank law).

    Zero-count documents never materialize: with mean = S1/N and
    E[X^2] = S2/N over the FULL corpus size N, zeros contribute nothing
    to either integer sum, so the Fano factor needs only the per-term
    (S1, S2, doc-freq) — exact BIGINT/HUGEINT — plus the 1-row corpus
    count broadcast (the scalar idiom). Top-20 selection is an
    ORDER-BY-LIMIT (TakeOrdered — per-partition top-k, never a global
    sort) on the (total desc, term asc) total order."""
    docs = _t(spark, sf_dir, "documents")
    tc = (
        docs.select("doc_id", F.explode(tx.tokens("text")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cq = F.col("c").cast("decimal(38,0)")
    per_term = tc.groupBy(F.col("t").alias("term")).agg(
        F.sum("c").cast("bigint").alias("total_cnt"),
        F.count(F.lit(1)).cast("bigint").alias("doc_freq"),
        F.sum(cq * cq).cast("bigint").alias("s2"),
    )
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    mean = F.col("total_cnt") / F.col("n_docs").cast("double")
    return (
        per_term.crossJoin(F.broadcast(nd))
        .select(
            "term",
            "total_cnt",
            "doc_freq",
            "n_docs",
            F.round(mean, 9).alias("mean_per_doc"),
            F.round(
                (F.col("s2").cast("double") / F.col("n_docs") - mean * mean) / mean, 9
            ).alias("fano_vmr"),
        )
        .orderBy(F.desc("total_cnt"), "term")
        .limit(_BURST_TOPN)
    )


# --------------------------------------------------------------------------
# RNG-free permutation (randomization) test for a two-group mean gap
# --------------------------------------------------------------------------

_PERM_B = 64
_PERM_SEED = 7


def _sql_permutation() -> str:
    hid = sql_hash60("doc_id::VARCHAR", seed=_PERM_SEED)
    ob = sql_hash60("b::VARCHAR")
    return f"""
WITH base AS (
  SELECT doc_id, n_chars,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lab
  FROM documents
),
obs AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lab) AS BIGINT) AS n1,
         CAST(sum(n_chars) AS BIGINT) AS st,
         CAST(sum(n_chars * lab) AS BIGINT) AS s1
  FROM base
),
reps AS (
  SELECT b,
         CAST(count(*) FILTER (WHERE gate) AS BIGINT) AS na,
         CAST(sum(n_chars) FILTER (WHERE gate) AS BIGINT) AS sa
  FROM (
    SELECT b, n_chars,
           (({hid} + {ob}) % {RESOLUTION})
             < CAST(floor({RESOLUTION} * o.n1 / CAST(o.n AS DOUBLE)) AS BIGINT)
             AS gate
    FROM base, unnest(generate_series(0, {_PERM_B - 1})) AS u(b)
    CROSS JOIN obs o
  )
  GROUP BY b
),
scored AS (
  SELECT CAST(count(*) AS BIGINT) AS b_resamples,
         CAST(count(*) FILTER (WHERE
           abs(CAST(r.sa AS DOUBLE) / r.na
               - CAST(o.st - r.sa AS DOUBLE) / (o.n - r.na))
           >= abs(CAST(o.s1 AS DOUBLE) / o.n1
                  - CAST(o.st - o.s1 AS DOUBLE) / (o.n - o.n1))) AS BIGINT)
           AS n_extreme
  FROM reps r CROSS JOIN obs o
)
SELECT o.n, o.n1 AS n_pos,
       round(CAST(o.s1 AS DOUBLE) / o.n1
             - CAST(o.st - o.s1 AS DOUBLE) / (o.n - o.n1), 6) AS diff_obs,
       s.b_resamples, s.n_extreme,
       round((1 + s.n_extreme) / CAST(s.b_resamples + 1 AS DOUBLE), 6) AS p_value
FROM obs o CROSS JOIN scored s
"""


@register(
    "stats_permutation_test",
    oracle=_sql_permutation(),
    tags=("stats", "hypothesis-test", "resampling"),
)
def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the English-vs-rest document-length gap:
    64 deterministic relabelings (the ``stats_bootstrap_ci`` hash-gate
    discipline — membership = (h(doc_id) + h(replicate#)) mod R under
    the observed positive-rate threshold, RNG-free so both engines draw
    IDENTICAL pseudo-permutations), each scoring the mean difference;
    the add-one p-value (1 + #{|diff_b| >= |diff_obs|}) / (B + 1)
    (Phipson & Smyth 2010). The distribution-free inference companion
    to ``stats_welch_ttest`` on the same kind of two-group gap — valid
    with no normality assumption at all.

    All replicate state is exact integers (counts and n_chars sums per
    gate side); every mean difference is the identical two-division
    IEEE expression, so the >= comparisons against the observed gap are
    bit-identical cross-engine. Plan shape: one observed-stats
    aggregate, one explode(xB) -> map-only gate -> B-group combine
    (hash-frugal: one md5 per doc plus one per replicate, never per
    pair); at 100 TB the xB blow-up collapses to per-partition partial
    sums per b, which the map-side combine already approximates."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("lab"),
    )
    obs = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lab").cast("bigint").alias("n1"),
        F.sum("n_chars").cast("bigint").alias("st"),
        F.sum(F.col("n_chars") * F.col("lab")).cast("bigint").alias("s1"),
    )
    offsets = spark.range(_PERM_B).select(
        F.col("id").cast("int").alias("b"),
        hash60(F.col("id").cast("string")).alias("ob"),
    )
    exploded = (
        base.select(
            "n_chars",
            hash60(F.col("doc_id").cast("string"), seed=_PERM_SEED).alias("h"),
            F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
        )
        .join(F.broadcast(offsets), "b")
        .crossJoin(F.broadcast(obs))
    )
    thr = F.floor(
        F.lit(RESOLUTION) * F.col("n1") / F.col("n").cast("double")
    ).cast("bigint")
    gate = F.pmod(F.col("h") + F.col("ob"), F.lit(RESOLUTION)) < thr
    reps = exploded.groupBy("b").agg(
        F.count(F.when(gate, F.lit(1))).cast("bigint").alias("na"),
        F.sum(F.when(gate, F.col("n_chars"))).cast("bigint").alias("sa"),
    )
    diff_obs = F.col("s1").cast("double") / F.col("n1") - (
        F.col("st") - F.col("s1")
    ).cast("double") / (F.col("n") - F.col("n1"))
    diff_b = F.col("sa").cast("double") / F.col("na") - (
        F.col("st") - F.col("sa")
    ).cast("double") / (F.col("n") - F.col("na"))
    scored = reps.crossJoin(F.broadcast(obs)).agg(
        F.count(F.lit(1)).cast("bigint").alias("b_resamples"),
        F.count(F.when(F.abs(diff_b) >= F.abs(diff_obs), F.lit(1)))
        .cast("bigint")
        .alias("n_extreme"),
    )
    return obs.crossJoin(F.broadcast(scored)).select(
        "n",
        F.col("n1").alias("n_pos"),
        F.round(diff_obs, 6).alias("diff_obs"),
        "b_resamples",
        "n_extreme",
        F.round(
            (1 + F.col("n_extreme")) / (F.col("b_resamples") + 1).cast("double"), 6
        ).alias("p_value"),
    )

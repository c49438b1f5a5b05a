"""Round-4 tranche: the scale-path variants VERDICT r3 asked for.

Two families:

- ``similarity_srp_lsh_sized`` — hyperplane LSH with ln(n)-sized band
  width (``datapipe.similarity.srp_sizing``), replacing the fixed
  16-bit demo geometry whose candidate volume is Theta(n^2 * 2^-r)
  (measured r3: 13.1x wall / 57x shuffle on constant-density 10x).

- the percentile-cut equi-depth family (``operators.equidepth``):
  exact order-statistic boundaries from a distributed prefix sum over
  the value DOMAIN, broadcast as literals, map-only bucket assignment —
  the 100 TB replacement for the single-partition ``ntile`` total order
  used by ``histogram_equi_depth`` / ``segment_rfm_customers`` /
  ``eval_calibration_bins`` / ``stats_quantile_normalize``. The ntile
  originals stay registered as correctness pins; these variants carry
  the scale contract (no un-partitioned WindowExec in their plans).

Every entry has a DuckDB value oracle that replays the same boundary
derivation and assignment arithmetic literally (exact integer rank
targets, ``(k*n + B-1) // B``; boundary values are data values, never
interpolated floats).

Reference parity note: the reference (analyse.py) has no order-statistic
or LSH operators; these entries extend the engine's own §2 catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DAVG, SQL_DSUM, register, _t
from .catalog_r3s import _CAL_BINS, _LR_STOP
from .datapipe import similarity as sim
from .datapipe import text as tx
from .functions import davg, dsum
from .operators.equidepth import (
    bucket_by_cuts,
    equi_depth_cut_points,
    grouped_value_counts_cum,
    grouped_values_at_ranks,
    sql_cuts_ctes,
    value_counts_cum,
    values_at_ranks,
)

# --------------------------------------------------------------------------
# Corpus-sized SRP-LSH (ln(n) band width — the scale-safe geometry)
# --------------------------------------------------------------------------

_SRP_SIZED_N_SF001 = 500  # embeddings rows at sf0.01 — the oracle's corpus


@register(
    "similarity_srp_lsh_sized",
    oracle=sim.sql_srp_neardup_pairs(
        dim=64,
        min_cos=0.4,
        bits=sim.srp_sizing(_SRP_SIZED_N_SF001)[0] * sim.srp_sizing(_SRP_SIZED_N_SF001)[1],
        bands=sim.srp_sizing(_SRP_SIZED_N_SF001)[1],
    ),
    headline=True,  # the 100x-safe SRP geometry is what the published number should measure (VERDICT r4 item 3)
    tags=("similarity", "lsh", "srp", "scale", "oracle-sf0.01"),
)
def similarity_srp_lsh_sized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP near-dup pairs with CORPUS-SIZED band geometry: bits per band
    r = max(8, ceil(log2 n)) so the per-band random collision rate
    2^-r <= 1/n and expected random candidates are <= bands*n/2 —
    LINEAR in the corpus (``srp_sizing``). The fixed-width sibling
    (``similarity_srp_lsh_pairs``, 4-bit bands) admits ~6% of RANDOM
    pairs per band and was measured quadratic at 10x (57x shuffle,
    SCALE_EVIDENCE.md); it stays registered as the correctness pin for
    the banding algebra while this entry carries the scale contract.
    Same verify step (exact cosine >= 0.4), same md5-derived projection
    family — the sized geometry just takes a longer prefix of it. The
    oracle is rendered for sf0.01's corpus (n=500 -> r=9, 16 bands);
    the Spark side derives the same geometry from a runtime count() —
    at the oracle SF the two MUST coincide, so the count is asserted
    there: a regenerated fixture with a different row count would
    otherwise surface as a confusing value diff instead of a loud
    geometry error (ADVICE/VERDICT r5)."""
    import os

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    if os.path.basename(sf_dir.rstrip("/")) == "sf0.01":
        assert n == _SRP_SIZED_N_SF001, (
            f"sf0.01 embeddings has {n} rows but the registered oracle was "
            f"rendered for n={_SRP_SIZED_N_SF001} (srp_sizing geometry "
            f"{sim.srp_sizing(_SRP_SIZED_N_SF001)} vs {sim.srp_sizing(n)}); "
            "re-render the oracle against the new fixture count"
        )
    pairs = sim.srp_neardup_pairs_sized(emb, "vec_id", "embedding", dim=64, min_cos=0.4, n=n)
    return pairs.repartition(1).sortWithinPartitions("id_a", "id_b")


# --------------------------------------------------------------------------
# Equi-depth histogram via exact percentile cuts (scale path)
# --------------------------------------------------------------------------

_HIST_CUT_SQL = f"""
WITH {sql_cuts_ctes("events", "value", 10)},
cl AS (SELECT coalesce(list(c ORDER BY b), []) AS cs FROM cuts),
bucketed AS (
  SELECT value,
         1 + len(list_filter(cl.cs, x -> value > x)) AS bucket
  FROM events, cl
)
SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
       min(value) AS lo, max(value) AS hi
FROM bucketed GROUP BY 1 ORDER BY 1
"""


@register(
    "histogram_equi_depth_cuts",
    oracle=_HIST_CUT_SQL,
    tags=("histogram", "equidepth", "scale"),
)
def histogram_equi_depth_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram through EXACT PERCENTILE CUTS instead of an
    un-partitioned ntile (the ``histogram_equi_depth`` docstring's
    promised 100 TB path, now code): boundary b is the
    ceil(b*n/10)-th smallest value, found by a distributed prefix sum
    over the distinct-value domain (operators/equidepth.py — range
    partition, per-partition offsets, partitioned window; no task ever
    sees the whole table), then a map-only ``1 + sum(value > cut)``
    assignment. Ties sit entirely in the lower bucket, so counts are
    equal up to tie mass — the standard warehouse equi-depth contract
    (vs ntile's forced-equal counts that SPLIT ties arbitrarily)."""
    ev = _t(spark, sf_dir, "events")
    cuts = equi_depth_cut_points(ev, F.col("value"), 10)
    return (
        ev.select("value", bucket_by_cuts(F.col("value"), cuts).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# RFM segmentation via percentile cuts (scale path)
# --------------------------------------------------------------------------

_RFM_BASE_SQL = f"""ref AS (SELECT max(o_orderdate) AS ref_date FROM orders),
rfm AS (
  SELECT o_custkey AS custkey,
         CAST(date_diff('day', max(o_orderdate), (SELECT ref_date FROM ref))
              AS BIGINT) AS r_days,
         CAST(count(*) AS BIGINT) AS f_orders,
         {SQL_DSUM.format(x='o_totalprice')} AS m_value
  FROM orders GROUP BY 1
)"""

_RFM_CUT_SQL = f"""
WITH {_RFM_BASE_SQL},
{sql_cuts_ctes("rfm", "r_days", 5, prefix="r")},
{sql_cuts_ctes("rfm", "f_orders", 5, prefix="f")},
{sql_cuts_ctes("rfm", "m_value", 5, prefix="m")},
rl AS (SELECT coalesce(list(c ORDER BY b), []) AS cs FROM rcuts),
fl AS (SELECT coalesce(list(c ORDER BY b), []) AS cs FROM fcuts),
ml AS (SELECT coalesce(list(c ORDER BY b), []) AS cs FROM mcuts),
scored AS (
  SELECT custkey, r_days, f_orders, m_value,
         CAST(5 - len(list_filter(rl.cs, x -> r_days > x)) AS BIGINT) AS r_score,
         CAST(1 + len(list_filter(fl.cs, x -> f_orders > x)) AS BIGINT) AS f_score,
         CAST(1 + len(list_filter(ml.cs, x -> m_value > x)) AS BIGINT) AS m_score
  FROM rfm, rl, fl, ml
)
SELECT custkey, r_days, f_orders, m_value, r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS segment
FROM scored ORDER BY custkey
"""


@register(
    "segment_rfm_customers_cuts",
    oracle=_RFM_CUT_SQL,
    headline=True,  # _cuts family representative in the published number (VERDICT r4 item 3)
    tags=("rfm", "segmentation", "equidepth", "scale"),
)
def segment_rfm_customers_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation with quintile boundaries from exact percentile
    cuts (``SCALE.md``'s promised replacement for the three global
    ntile sorts in ``segment_rfm_customers``): each metric's 4 cut
    values come from the distributed prefix sum over its value domain,
    and scores are map-only comparisons against the broadcast literals.
    Ascending quintile = 1 + #cuts below; recency scores DESCENDING
    (most recent = highest r_days bucket inverted): r_score =
    5 - #cuts(r_days) exceeded. Ties share a bucket (boundaries are
    data values), so scores are reproducible under any partitioning —
    unlike ntile's forced tie splits, which needed a custkey tiebreak.
    The per-customer aggregate is unchanged; what the variant removes
    is the three single-task total orders over the customer frame."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    ref = orders.agg(F.max("o_orderdate").alias("ref_date"))
    rfm = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("f_orders"),
            dsum(F.col("o_totalprice")).alias("m_value"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "custkey",
            F.datediff("ref_date", "last_order").cast("bigint").alias("r_days"),
            "f_orders",
            "m_value",
        )
        # consumed by three cut derivations plus the scoring pass
        .localCheckpoint(eager=True)
    )
    rcuts = equi_depth_cut_points(rfm, F.col("r_days"), 5)
    fcuts = equi_depth_cut_points(rfm, F.col("f_orders"), 5)
    mcuts = equi_depth_cut_points(rfm, F.col("m_value"), 5)
    r_asc = bucket_by_cuts(F.col("r_days"), rcuts)  # 1 + #cuts exceeded
    scored = rfm.select(
        "custkey",
        "r_days",
        "f_orders",
        "m_value",
        (F.lit(6) - r_asc).cast("bigint").alias("r_score"),
        bucket_by_cuts(F.col("f_orders"), fcuts).alias("f_score"),
        bucket_by_cuts(F.col("m_value"), mcuts).alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"),
    ).orderBy("custkey")


# --------------------------------------------------------------------------
# Calibration bins via percentile cuts (scale path)
# --------------------------------------------------------------------------

def _sql_calibration_cuts() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH scored AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         round(len(list_filter({toks}, t -> t IN {_LR_STOP}))
                 / CAST(len({toks}) AS DOUBLE), 9) AS conf
  FROM documents
),
{sql_cuts_ctes("scored", "conf", _CAL_BINS)},
cl AS (SELECT coalesce(list(c ORDER BY b), []) AS cs FROM cuts),
binned AS (
  SELECT y, conf,
         1 + len(list_filter(cl.cs, x -> conf > x)) AS bin
  FROM scored, cl
),
per_bin AS (
  SELECT CAST(bin AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         round((CAST(SUM(CAST(round(conf * 1000000.0) AS HUGEINT)) AS DOUBLE)
                  / count(*)) / 1000000.0, 9) AS mean_conf,
         round(sum(y) / CAST(count(*) AS DOUBLE), 9) AS frac_pos
  FROM binned GROUP BY 1
),
btot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM per_bin)
SELECT bin, n, mean_conf, frac_pos,
       round(abs(mean_conf - frac_pos), 9) AS gap,
       (CAST(SUM(CAST(round(n * round(abs(mean_conf - frac_pos), 9) * 1000000.0)
                      AS HUGEINT)) OVER () AS DOUBLE) / 1000000.0) / min(nt) OVER () AS ece
FROM per_bin CROSS JOIN btot ORDER BY bin
"""


@register(
    "eval_calibration_bins_cuts",
    oracle=_sql_calibration_cuts(),
    tags=("eval", "stats", "ml", "equidepth", "scale"),
)
def eval_calibration_bins_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + ECE with equal-count bins from exact
    percentile CUTS over the confidence score, replacing
    ``eval_calibration_bins``'s un-partitioned ntile (same scoring, same
    per-bin statistics, same ECE arithmetic — the only contract change
    is tie handling: ties share a bin instead of being split by doc_id).
    The bin boundaries come from the distributed prefix sum over the
    score domain (bounded: conf is a 9dp ratio of small ints) and the
    assignment is a map-only comparison against 9 broadcast literals —
    scan-shaped end to end. Heavy tie mass (many docs sharing a round
    score) makes bins UNEQUAL here by design; mean_conf/frac_pos/ECE
    remain exactly replayable."""
    docs = _t(spark, sf_dir, "documents")
    ts = tx.tokens("text")
    stop = F.filter(ts, lambda t: t.isin("the", "a", "of", "and", "is"))
    scored = docs.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(F.size(stop) / F.size(ts).cast("double"), 9).alias("conf"),
    ).localCheckpoint(eager=True)  # feeds the cut derivation AND the binning
    cuts = equi_depth_cut_points(scored, F.col("conf"), _CAL_BINS)
    binned = scored.withColumn("bin", bucket_by_cuts(F.col("conf"), cuts))
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            (
                F.sum(F.round(F.col("conf") * 1000000.0).cast("long")).cast("double")
                / F.count(F.lit(1))
            )
            / 1000000.0,
            9,
        ).alias("mean_conf"),
        F.round(F.sum("y") / F.count(F.lit(1)).cast("double"), 9).alias("frac_pos"),
    )
    wall = Window.partitionBy(F.lit(1))
    gap = F.round(F.abs(F.col("mean_conf") - F.col("frac_pos")), 9)
    return (
        per_bin.withColumn("gap", gap)
        .withColumn(
            "ece",
            (
                F.sum(F.round(F.col("n") * F.col("gap") * 1000000.0).cast("long"))
                .over(wall)
                .cast("double")
                / 1000000.0
            )
            / F.sum("n").over(wall),
        )
        .orderBy("bin")
    )


# --------------------------------------------------------------------------
# Quantile normalization against a pooled percentile GRID (scale path)
# --------------------------------------------------------------------------

_QN_GRID = 101  # pooled grid resolution (0..100 inclusive)

_QN_GRID_SQL = f"""
WITH vc AS (
  SELECT CAST(round(value * 1000000.0) AS BIGINT) AS v, count(*) AS cnt
  FROM events GROUP BY 1
),
cum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum FROM vc),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
grid AS (
  SELECT g, min(CASE WHEN cum >= 1 + (g * (n - 1)) // {_QN_GRID - 1} THEN v END) AS os
  FROM cum, tot, (SELECT unnest(range(0, {_QN_GRID})) AS g)
  GROUP BY g
),
gl AS (SELECT list(os ORDER BY g) AS gs FROM grid),
vcg AS (
  SELECT event_type, value, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
cumg AS (
  SELECT event_type, value, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY value) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n_g
  FROM vcg
),
pos AS (
  SELECT e.event_id, e.event_type, e.value,
         ((c.cum - c.cnt + (c.cnt + 1) / 2.0 - 1) / (c.n_g - 1))
           * {_QN_GRID - 1} AS pos
  FROM events e
  JOIN cumg c ON e.event_type = c.event_type AND e.value = c.value
  WHERE c.n_g >= 2
),
sel AS (
  SELECT event_id, event_type, value,
         CAST(floor(pos) AS BIGINT) AS i, pos - floor(pos) AS frac
  FROM pos
)
SELECT s.event_id, s.event_type, s.value,
       round((CAST(gs[CAST(s.i + 1 AS INTEGER)] AS DOUBLE)
              + CASE WHEN s.frac = 0 THEN 0.0
                     ELSE s.frac * (CAST(gs[CAST(s.i + 2 AS INTEGER)] AS DOUBLE)
                                    - CAST(gs[CAST(s.i + 1 AS INTEGER)] AS DOUBLE))
                END) / 1000000.0, 9) AS qnorm
FROM sel s, gl ORDER BY event_id
"""


@register(
    "stats_quantile_normalize_grid",
    oracle=_QN_GRID_SQL,
    tags=("stats", "normalize", "ml", "equidepth", "scale"),
)
def stats_quantile_normalize_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization against a POOLED PERCENTILE GRID — the
    ``stats_quantile_normalize`` docstring's promised 100 TB shape, now
    code. The original broadcasts the ENTIRE pooled sorted vector (one
    collect_list row — O(n) on the driver and every executor); this
    variant broadcasts {_QN_GRID} exact pooled order statistics
    (distributed prefix sum over the micro-quantized value domain +
    one conditional-min aggregation) and linearly interpolates between
    grid points. Per-group ranks come from the per-(type, value) cum
    table joined back on the natural key — mid-rank for ties (the
    published form for distribution alignment), so no per-row
    row_number window over data-sized partitions anywhere in the plan.
    Contract difference vs the exact original: ties share the mean
    rank, and targets interpolate the percentile grid rather than the
    full pooled vector — the approximation the grid resolution
    controls, with the grid itself still EXACT order statistics."""
    ev = _t(spark, sf_dir, "events")
    micro = F.round(F.col("value") * 1000000.0).cast("long")
    cum, n = value_counts_cum(ev, micro)
    g1 = _QN_GRID - 1
    ranks = [1 + (g * (n - 1)) // g1 for g in range(_QN_GRID)]
    grid = values_at_ranks(cum, ranks)
    garr = F.array(*[F.lit(int(v)) for v in grid])
    # Per-group cum via the GROUPED two-level prefix sum — a window
    # partitioned by event_type alone would hold n/#groups DATA rows in
    # one task (measured: the window form was the 4x outlier in the
    # round-4 10x table); here every task is bounded by a range slice.
    gcum, n_g_map = grouped_value_counts_cum(ev, F.col("event_type"), F.col("value"))
    ng = F.create_map(*[F.lit(x) for g, ngv in n_g_map.items() for x in (g, ngv)])
    cumg = gcum.select(
        F.col("g").alias("event_type"),
        F.col("v").alias("value"),
        "cnt",
        "cum",
        ng[F.col("g")].alias("n_g"),
    )
    pos = (
        (F.col("cum") - F.col("cnt") + (F.col("cnt") + 1) / 2.0 - 1)
        / (F.col("n_g") - 1)
    ) * g1
    rows = (
        ev.join(cumg, ["event_type", "value"])
        .filter(F.col("n_g") >= 2)
        .select(
            "event_id",
            "event_type",
            "value",
            pos.alias("pos"),
        )
        .withColumn("i", F.floor(F.col("pos")).cast("int"))
        .withColumn("frac", F.col("pos") - F.floor(F.col("pos")))
    )
    base = F.element_at(garr, F.col("i") + 1).cast("double")
    nxt = F.element_at(garr, F.col("i") + 2).cast("double")
    qnorm = F.round(
        (
            base
            + F.when(F.col("frac") == 0, F.lit(0.0)).otherwise(
                F.col("frac") * (nxt - base)
            )
        )
        / 1000000.0,
        9,
    )
    return rows.select("event_id", "event_type", "value", qnorm.alias("qnorm")).orderBy(
        "event_id"
    )


# --------------------------------------------------------------------------
# Winsorized mean via grouped order statistics (scale path)
# --------------------------------------------------------------------------

_WINS_CUT_SQL = f"""
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
vc AS (SELECT event_type AS g, value AS v, count(*) AS cnt FROM ev GROUP BY 1, 2),
cum AS (
  SELECT g, v, cnt, sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum FROM vc
),
ng AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n FROM vc GROUP BY 1),
cuts AS (
  SELECT c.g,
         min(CASE WHEN c.cum >= greatest(CAST(ceil(0.05 * ng.n) AS BIGINT), 1)
                  THEN c.v END) AS lo,
         min(CASE WHEN c.cum >= CAST(ceil(0.95 * ng.n) AS BIGINT)
                  THEN c.v END) AS hi
  FROM cum c JOIN ng USING (g) GROUP BY 1
)
SELECT e.event_type, min(ng.n) AS n, min(k.lo) AS lo, min(k.hi) AS hi,
       {SQL_DAVG.format(x='greatest(least(e.value, k.hi), k.lo)')} AS winsorized_mean,
       {SQL_DAVG.format(x='e.value')} AS raw_mean
FROM ev e JOIN cuts k ON e.event_type = k.g JOIN ng ON e.event_type = ng.g
GROUP BY 1 ORDER BY 1
"""


@register(
    "stats_winsorized_mean_cuts",
    oracle=_WINS_CUT_SQL,
    tags=("robust-stats", "winsorize", "equidepth", "scale"),
)
def stats_winsorized_mean_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean with the P5/P95 clip points found by GROUPED exact
    order statistics (operators/equidepth.py grouped_value_counts_cum)
    instead of ``stats_winsorized_mean``'s per-group row_number window.
    Same rank-selection contract (the max(ceil(0.05 n), 1)-th and
    ceil(0.95 n)-th order statistics per group — identical values), but
    the per-group window partitions there hold n/#groups DATA rows in
    one task each; here the range-partitioned prefix sum bounds every
    task by a slice of the distinct-value DOMAIN, and clipping is a
    map-only comparison against per-group broadcast literals. The rank
    targets use the same IEEE double expression ceil(0.05 * n) on both
    engines."""
    import math

    ev = (
        _t(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(F.col("value").isNotNull())
        .localCheckpoint(eager=True)  # consumed by the cum pass AND the clip pass
    )
    cum, n_g = grouped_value_counts_cum(ev, F.col("event_type"), F.col("value"))
    targets = {
        g: [max(math.ceil(0.05 * n), 1), math.ceil(0.95 * n)] for g, n in n_g.items()
    }
    oss = grouped_values_at_ranks(cum, targets)
    lo_map = F.create_map(*[F.lit(x) for g in oss for x in (g, oss[g][0])])
    hi_map = F.create_map(*[F.lit(x) for g in oss for x in (g, oss[g][1])])
    n_map = F.create_map(*[F.lit(x) for g, n in n_g.items() for x in (g, n)])
    lo = lo_map[F.col("event_type")]
    hi = hi_map[F.col("event_type")]
    clipped = F.greatest(F.least(F.col("value"), hi), lo)
    return (
        ev.groupBy("event_type")
        .agg(
            davg(clipped).alias("winsorized_mean"),
            davg(F.col("value")).alias("raw_mean"),
        )
        .select(
            "event_type",
            n_map[F.col("event_type")].cast("bigint").alias("n"),
            lo_map[F.col("event_type")].alias("lo"),
            hi_map[F.col("event_type")].alias("hi"),
            "winsorized_mean",
            "raw_mean",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Equal-token corpus sharding (weighted equi-depth cuts)
# --------------------------------------------------------------------------

_N_SHARDS = 8


def _sql_equal_token_shards() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH d AS (
  SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens FROM documents
),
{sql_cuts_ctes("d", "doc_id", _N_SHARDS, weight_sql="n_tokens")},
cl AS (SELECT coalesce(list(c ORDER BY b), []) AS cs FROM cuts),
sharded AS (
  SELECT doc_id, n_tokens,
         1 + len(list_filter(cl.cs, x -> doc_id > x)) AS shard
  FROM d, cl
)
SELECT CAST(shard AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM sharded GROUP BY 1 ORDER BY 1
"""


@register(
    "pack_equal_token_shards",
    oracle=_sql_equal_token_shards(),
    tags=("packing", "sharding", "equidepth", "scale"),
)
def pack_equal_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic equal-WORK corpus sharding: split the doc_id-ordered
    corpus into {_N_SHARDS} contiguous shards of near-equal TOTAL TOKEN
    count — the planning step before writing balanced training shards
    (equal docs-per-shard skews badly when document length does; equal
    tokens is what makes every downstream trainer/tokenizer task finish
    together). Shard boundary b is the smallest doc_id whose cumulative
    token mass reaches ceil(b*W/{_N_SHARDS}) — the WEIGHTED form of the
    round-4 percentile-cut machinery (weight = per-doc token count;
    same distributed prefix sum, same exact integer targets), then a
    map-only doc_id-vs-boundary comparison any writer task can apply
    independently. Contiguity in doc_id keeps shard assignment stable
    under re-runs and appends of higher ids — the property hash-mod
    sharding lacks."""
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.size(tx.tokens("text")).cast("bigint").alias("n_tokens")
    ).localCheckpoint(eager=True)  # tokenization feeds the cut pass and the stats pass
    cuts = equi_depth_cut_points(
        d, F.col("doc_id"), _N_SHARDS, weight=F.col("n_tokens")
    )
    return (
        d.select(
            "doc_id",
            "n_tokens",
            bucket_by_cuts(F.col("doc_id"), cuts).alias("shard"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# Source-format round trips (ORC sink+scan; dirty-CSV coercive ingest)
# --------------------------------------------------------------------------

def _scratch(sf_dir: str, tag: str) -> str:
    import hashlib

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/mda_r4_{tag}_{h}"


@register(
    "source_orc_roundtrip",
    oracle=f"""
SELECT o_orderpriority AS priority, CAST(count(*) AS BIGINT) AS n,
       {SQL_DSUM.format(x='o_totalprice')} AS revenue
FROM orders GROUP BY 1 ORDER BY 1
""",
    tags=("source", "orc", "format"),
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as a first-class at-rest format: write the orders projection
    to ORC (zlib, Spark's builtin vectorized writer), re-read it, and
    aggregate — the oracle checks the round trip preserved every value
    bit-for-bit by replaying the aggregate from the original parquet.
    ORC matters operationally as the interchange format with
    Hive-lineage warehouses; the same predicate pushdown / column
    pruning / partition discipline as the parquet path applies (Spark's
    OrcScan reports PushedFilters exactly like ParquetScan). Scratch
    lives under /tmp keyed by sf_dir; the write is part of the measured
    entry by design — a format claim without the sink half is only half
    a claim."""
    path = _scratch(sf_dir, "orc")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("revenue"))
        .orderBy("priority")
    )


_CSV_BAD_MOD = 97


@register(
    "source_csv_coercion",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(CASE WHEN event_id % {_CSV_BAD_MOD} = 0 THEN 1 END) AS BIGINT)
         AS n_corrupt,
       {SQL_DAVG.format(x='CASE WHEN event_id % {m} != 0 THEN value END').format(m=_CSV_BAD_MOD)}
         AS avg_value
FROM events
""".replace("{m}", str(_CSV_BAD_MOD)),
    tags=("source", "csv", "coercion", "format"),
)
def source_csv_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-CSV ingest with the reference's errors='coerce' discipline
    (analyse.py's pandas coercion, re-expressed as PERMISSIVE mode +
    explicit schema): a CSV derived from events carries 'N/A' in the
    value column for every event_id divisible by 97; the
    reader (sources.read_csv) parses with a declared schema, captures
    each unparseable row in _corrupt_record instead of failing the job,
    and nulls only the bad FIELD. Output: total rows, corrupt-row count,
    and the quantized mean of the rows that parsed — the oracle replays
    all three from the original parquet (the corruption rule is
    deterministic), proving the CSV round trip dropped and mangled
    nothing. Spark's shortest-round-trip double formatting makes the
    write→parse cycle value-exact."""
    import pyspark.sql.types as T

    from .sources import read_csv

    path = _scratch(sf_dir, "csv")
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % _CSV_BAD_MOD == 0, F.lit("N/A"))
        .otherwise(F.col("value").cast("string"))
        .alias("value"),
    )
    ev.write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = read_csv(spark, path, schema)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        davg(F.col("value")).alias("avg_value"),
    )


_JSONL_BAD_MOD = 101


@register(
    "source_jsonl_nested",
    oracle=f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(CASE WHEN doc_id % {_JSONL_BAD_MOD} = 0 THEN 1 END) AS BIGINT)
         AS n_corrupt,
       CAST(sum(CASE WHEN doc_id % {_JSONL_BAD_MOD} != 0
                     THEN length(text) END) AS BIGINT) AS total_chars
FROM documents
""",
    tags=("source", "jsonl", "nested", "format"),
)
def source_jsonl_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSONL ingest (the training-data interchange format): each
    document is written as one JSON line with a nested payload struct
    ({{"doc_id", "payload": {{"lang", "body"}}}}), every 101st line
    truncated mid-object to simulate upstream corruption. The reader
    (sources.read_jsonl — mandatory explicit schema, no inference pass)
    lands each malformed line in _corrupt_record and shreds the nested
    field path payload.body for the good rows. The oracle replays row /
    corrupt counts and the good-row character total from the original
    parquet — the deterministic-corruption trick that makes a source
    boundary differentially testable without a second JSON engine."""
    import pyspark.sql.types as T

    from .sources import read_jsonl

    path = _scratch(sf_dir, "jsonl")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    line = F.to_json(
        F.struct(
            F.col("doc_id"),
            F.struct(F.col("lang"), F.col("text").alias("body")).alias("payload"),
        )
    )
    dirty = docs.select(
        F.when(
            F.col("doc_id") % _JSONL_BAD_MOD == 0, F.substring(line, 1, 10)
        )
        .otherwise(line)
        .alias("value")
    )
    dirty.write.mode("overwrite").text(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("lang", T.StringType()),
                        T.StructField("body", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    back = read_jsonl(spark, path, schema)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col("_corrupt_record")).alias("n_corrupt"),
        F.sum(F.length(F.col("payload.body"))).cast("bigint").alias("total_chars"),
    )

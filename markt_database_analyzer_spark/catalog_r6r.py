"""Round-6 additions, part 18: nearest-direction as-of join with
tolerance, and a KS uniformity audit of the RNG-free hash gate.

Catalog contract as everywhere (see catalog.py): (PySpark program,
DuckDB oracle SQL) pairs with identical semantics — exact-integer time
deltas and gate values, total orderings at every row selection —
hash-compared at sf0.01 by the driver.

Reference parity: the reference (analyse.py) has neither; these extend
the as-of family (``asof_join_last_event`` is backward-only; pandas
``merge_asof(direction='nearest', tolerance=...)`` is the other
contract a migration needs) and close the sampling story
(``sample_hash_documents`` et al. CLAIM the md5 gate is uniform — this
entry MEASURES it, the audit a determinism-over-RNG design owes)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe.hashing import sql_hash60
from .datapipe.sampling import RESOLUTION, _gate
from .operators.asof import asof_join_last
from .operators.equidepth import value_counts_cum

# --------------------------------------------------------------------------
# Nearest as-of join with tolerance (pandas merge_asof 'nearest' parity)
# --------------------------------------------------------------------------

_ASOF_TOL_US = 24 * 3600 * 1_000_000  # ±24 hours, in microseconds


def _sql_asof_nearest() -> str:
    return f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts FROM events
  WHERE event_type = 'purchase'
),
e AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
b AS (
  SELECT p.purchase_id, p.user_id, p.ts AS pts,
         e.ts AS bts, e.value AS bv
  FROM p ASOF LEFT JOIN e
    ON p.user_id = e.user_id AND e.ts <= p.ts
),
f AS (
  SELECT p.purchase_id, e.ts AS fts, e.value AS fv
  FROM p ASOF LEFT JOIN e
    ON p.user_id = e.user_id AND e.ts > p.ts
),
j AS (
  SELECT b.purchase_id, b.user_id,
         epoch_us(b.pts) - epoch_us(b.bts) AS bdt,
         epoch_us(f.fts) - epoch_us(b.pts) AS fdt,
         b.bv, f.fv
  FROM b JOIN f USING (purchase_id)
),
pick AS (
  SELECT purchase_id, user_id,
         CASE
           WHEN bdt IS NOT NULL AND bdt <= {_ASOF_TOL_US}
                AND (fdt IS NULL OR fdt > {_ASOF_TOL_US} OR bdt <= fdt)
             THEN bv
           WHEN fdt IS NOT NULL AND fdt <= {_ASOF_TOL_US} THEN fv
           ELSE NULL
         END AS view_value_nearest,
         CASE
           WHEN bdt IS NOT NULL AND bdt <= {_ASOF_TOL_US}
                AND (fdt IS NULL OR fdt > {_ASOF_TOL_US} OR bdt <= fdt)
             THEN bdt
           WHEN fdt IS NOT NULL AND fdt <= {_ASOF_TOL_US} THEN fdt
           ELSE NULL
         END AS dt_us
  FROM j
)
SELECT purchase_id, user_id, view_value_nearest,
       CAST(dt_us AS BIGINT) AS dt_us
FROM pick ORDER BY purchase_id
"""


@register(
    "join_asof_nearest",
    oracle=_sql_asof_nearest(),
    tags=("asof-join", "point-in-time", "tolerance"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join with a ±24-hour tolerance: for each
    purchase event, the same user's 'view' value closest in time in
    EITHER direction (the attribution-window feature join), ties
    preferring the backward (earlier) side — the pandas
    ``merge_asof(direction='nearest', tolerance=...)`` contract that
    ``asof_join_last_event`` (backward-only, unbounded) does not
    cover. Matches farther than the tolerance are NULL; on the fixture
    the gate both matches (~56%) and rejects, so both branches are
    value-checked.

    Implementation: TWO union-sentinel as-of passes over the same
    machinery (`operators.asof` — one shuffle each, no row explosion):
    the backward pass as-is, the forward pass on NEGATED microsecond
    timestamps (first-at-or-after = last-at-or-before under negation;
    equal-time right rows are pre-reduced with max_by(event_id), so no
    per-pass tiebreak is needed). The deltas are exact microseconds;
    the nearest pick and the tolerance gate are one CASE with identical
    text on both engines; the oracle runs DuckDB's NATIVE ASOF twice,
    so the implementations stay genuinely independent.

    Scale shape: two key-partitioned window passes + one equi-join on
    the order key — no inequality join anywhere."""
    events = _t(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("ot"),
    )
    ev = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("value"))
        .select(
            "user_id",
            F.unix_micros("ts").alias("et"),
            F.struct(F.unix_micros("ts").alias("ts_us"), F.col("value")).alias("sv"),
        )
        .localCheckpoint(eager=True)  # feeds both directional passes
    )
    back = asof_join_last(
        p, ev, "user_id", "ot", "et", "sv"
    ).withColumnRenamed("sv_asof", "bsv")
    fwd_left = back.withColumn("nt", -F.col("ot"))
    fwd_ev = ev.select(
        "user_id", (-F.col("et")).alias("net"), F.col("sv").alias("sv2")
    )
    both = asof_join_last(
        fwd_left, fwd_ev, "user_id", "nt", "net", "sv2"
    ).withColumnRenamed("sv2_asof", "fsv")
    bdt = F.col("ot") - F.col("bsv.ts_us")
    fdt = F.col("fsv.ts_us") - F.col("ot")
    back_ok = bdt.isNotNull() & (bdt <= _ASOF_TOL_US) & (
        fdt.isNull() | (fdt > _ASOF_TOL_US) | (bdt <= fdt)
    )
    fwd_ok = fdt.isNotNull() & (fdt <= _ASOF_TOL_US)
    return both.select(
        "purchase_id",
        "user_id",
        F.when(back_ok, F.col("bsv.value"))
        .when(fwd_ok, F.col("fsv.value"))
        .alias("view_value_nearest"),
        F.when(back_ok, bdt).when(fwd_ok, fdt).cast("bigint").alias("dt_us"),
    ).orderBy("purchase_id")


# --------------------------------------------------------------------------
# KS uniformity audit of the md5 hash gate
# --------------------------------------------------------------------------

_UNIF_SEED = 0  # the sample_hash_documents gate being audited


def _sql_gate_uniformity() -> str:
    gate = f"({sql_hash60('doc_id::VARCHAR', seed=_UNIF_SEED)} % {RESOLUTION})"
    return f"""
WITH g AS (SELECT {gate} AS v FROM documents),
dom AS (
  SELECT v, CAST(count(*) AS BIGINT) AS cnt,
         CAST(sum(count(*)) OVER (ORDER BY v) AS BIGINT) AS cum
  FROM g GROUP BY v
),
tot AS (SELECT CAST(max(cum) AS DOUBLE) AS n FROM dom),
ks AS (
  SELECT v, n,
         greatest(abs(cum / n - (v + 1.0) / {RESOLUTION}),
                  abs((cum - cnt) / n - CAST(v AS DOUBLE) / {RESOLUTION})) AS d
  FROM dom, tot
)
SELECT CAST(n AS BIGINT) AS n,
       round(max(d), 9) AS ks_stat,
       round(1.3581015157406195 / sqrt(min(n)), 9) AS ks_critical_05,
       CAST(CASE WHEN max(d) <= 1.3581015157406195 / sqrt(min(n))
            THEN 1 ELSE 0 END AS INT) AS uniform_ok
FROM ks GROUP BY n
"""


@register(
    "dq_hash_gate_uniformity",
    oracle=_sql_gate_uniformity(),
    tags=("data-quality", "sampling", "ks", "uniformity"),
)
def dq_hash_gate_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS uniformity audit of the seed-0 md5 hash gate (the
    ``sample_hash_documents`` gate): the whole RNG-free sampling family
    RESTS on ``hash(id) mod R`` being uniform on [0, R) — this entry
    MEASURES it, comparing the gate-value ECDF against the exact
    discrete-uniform CDF (v+1)/R with the sup over both one-sided gaps,
    and reports the asymptotic 5% critical value 1.358/√n next to the
    statistic. A biased gate (e.g. sequential ids under a weak hash)
    fails here before it silently skews every downstream sample.

    Exactness: gate values are exact integers; the ECDF comes from the
    distributed distinct-domain prefix sum (``value_counts_cum`` — the
    _cuts machinery); the critical-value constant is the same decimal
    literal on both engines.

    Scale shape: one map-only gate projection, the range-partitioned
    prefix sum, then a 1-row reduce over the domain frame."""
    docs = _t(spark, sf_dir, "documents").select(
        _gate("doc_id", _UNIF_SEED).alias("v")
    )
    dom, _ = value_counts_cum(docs, F.col("v"))
    tot = dom.agg(F.max("cum").cast("double").alias("n"))
    d = F.greatest(
        F.abs(F.col("cum") / F.col("n") - (F.col("v") + 1.0) / RESOLUTION),
        F.abs(
            (F.col("cum") - F.col("cnt")) / F.col("n")
            - F.col("v").cast("double") / RESOLUTION
        ),
    )
    ks = dom.crossJoin(F.broadcast(tot)).select("v", "n", d.alias("d"))
    crit = F.lit(1.3581015157406195) / F.sqrt(F.min("n"))
    return ks.groupBy(F.col("n").cast("bigint").alias("n")).agg(
        F.round(F.max("d"), 9).alias("ks_stat"),
        F.round(crit, 9).alias("ks_critical_05"),
        (F.max("d") <= crit).cast("int").alias("uniform_ok"),
    )

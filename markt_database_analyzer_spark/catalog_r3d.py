"""Round-3 fifth tranche: iterative PageRank, market-basket association
rules, a Deequ-style data-quality constraint suite, and rank-based
robust statistics (median / MAD).

Every entry follows the catalog contract: a PySpark program plus a
DuckDB oracle replaying identical semantics. PageRank quantizes each
iteration on a nano-unit grid (PR mass per vertex is ~1/N, far below
the micro grid's resolution) so the fixed-point trajectory is
engine- and partitioning-independent."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t

# Nano-grid deterministic sum: dsum's construction at 1e-9 — needed when
# the summed quantities are per-row masses of order 1/N (PageRank
# contributions), where the 1e-6 grid would destroy the signal.
NANO = 1_000_000_000.0
SQL_NSUM = "(CAST(SUM(CAST(round(({x}) * 1000000000.0) AS HUGEINT)) AS DOUBLE) / 1000000000.0)"


def nsum(col: Column) -> Column:
    return (
        F.sum(F.round(col.cast("double") * F.lit(NANO)).cast("decimal(38,0)")).cast(
            "double"
        )
        / F.lit(NANO)
    )


# --------------------------------------------------------------------------
# PageRank over the customer<->supplier bipartite graph
# --------------------------------------------------------------------------

_PR_ITERS, _PR_D = 5, 0.85


def _pagerank_oracle() -> str:
    head = f"""
WITH e0 AS (
  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY u),
verts AS (SELECT DISTINCT u AS v FROM edges),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM verts),
pr0 AS (SELECT v, 1.0 / (SELECT n FROM nn) AS pr FROM verts)"""
    iters = []
    for i in range(_PR_ITERS):
        iters.append(
            f""",
pr{i + 1} AS (
  SELECT e.v AS v,
         round((1.0 - {_PR_D}) / (SELECT n FROM nn)
               + {_PR_D} * {SQL_NSUM.format(x='p.pr / d.deg')}, 9) AS pr
  FROM edges e
  JOIN pr{i} p ON e.u = p.v
  JOIN deg d ON e.u = d.u
  GROUP BY e.v
)"""
        )
    tail = f"""
SELECT v AS vid,
       CASE WHEN v % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       v // 2 AS key, pr
FROM pr{_PR_ITERS}
ORDER BY pr DESC, vid LIMIT 20"""
    return head + "".join(iters) + tail


@register(
    "graph_pagerank_bipartite",
    oracle=_pagerank_oracle(),
    tags=("graph", "pagerank", "iterative"),
)
def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (Brin-Page, damping 0.85, 5 synchronous iterations) over
    the undirected customer-supplier transaction graph. The Pregel-shape
    Spark program: the (edges JOIN deg) frame is built once and
    persisted; each iteration is one join (rank onto edge source) + one
    hash agg (sum contributions per destination) — the classic
    "iterative algorithms as repeated joins" pattern, with per-iteration
    plan truncation via the persisted edge frame rather than lineage
    growth. Each iteration's ranks are quantized on the NANO grid
    (contributions are ~1/(N*deg) — micro-units would erase them), which
    makes the whole 5-step trajectory bit-reproducible: the oracle
    replays it as 5 unrolled SQL CTEs and hash-matches the final top-20.
    At 100 TB: edges partition by source key; the per-iteration shuffle
    is degree-weighted rank mass, and a vertex-cut (GraphX-style) or
    salted hot-vertex split handles power-law degrees."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    edges = e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(deg, "u").persist()
    verts = edges.select(F.col("u").alias("v")).distinct()
    nn = verts.agg(F.count(F.lit(1)).alias("n"))
    pr = verts.crossJoin(F.broadcast(nn)).select(
        "v", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(_PR_ITERS):
        pr_u = pr.select(F.col("v").alias("u"), F.col("pr").alias("pr_u"))
        # rank frame is vertex-cardinality — broadcast it so each
        # iteration is a map-side join + one partial-combined agg
        # (measured 14 s -> ~4 s at sf0.1). Above the broadcast
        # threshold a production run co-partitions ranks with the
        # persisted edge list instead (same plan minus the broadcast).
        s = (
            edges_deg.join(F.broadcast(pr_u), "u")
            .groupBy("v")
            .agg(nsum(F.col("pr_u") / F.col("deg")).alias("s"))
        )
        pr = s.crossJoin(F.broadcast(nn)).select(
            "v",
            F.round(
                (F.lit(1.0 - _PR_D) / F.col("n")) + F.lit(_PR_D) * F.col("s"), 9
            ).alias("pr"),
        )
    out = pr.select(
        F.col("v").alias("vid"),
        F.when(F.col("v") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.expr("v div 2").alias("key"),
        "pr",
    ).orderBy(F.desc("pr"), "vid").limit(20)
    return out


# --------------------------------------------------------------------------
# Market-basket association rules (support / confidence / lift)
# --------------------------------------------------------------------------

@register(
    "assoc_rules_parts",
    oracle="""
WITH baskets AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
ic AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM baskets GROUP BY p),
nn AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM baskets),
co AS (
  SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS co
  FROM baskets a JOIN baskets b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2
)
SELECT pa, pb, co,
       round(CAST(co AS DOUBLE) / nn.n, 9) AS support,
       round(CAST(co AS DOUBLE) / ia.c, 9) AS confidence,
       round((CAST(co AS DOUBLE) * nn.n) / (CAST(ia.c AS DOUBLE) * ib.c), 9) AS lift
FROM co
JOIN ic ia ON co.pa = ia.p
JOIN ic ib ON co.pb = ib.p
CROSS JOIN nn
WHERE co >= 3
ORDER BY lift DESC, pa, pb LIMIT 30
""",
    tags=("association-rules", "market-basket", "analytics"),
)
def assoc_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: pair
    co-occurrence by self-joining the distinct (order, part) projection
    on the order key — candidate pairs are generated per basket (cost
    Σ basket²), never across baskets — then support / confidence / lift
    from broadcast item counts. This is the A-Priori candidate-pair
    step expressed relationally; the min-support gate (co >= 3) is the
    same pruning the published algorithm applies. At 100 TB the basket
    self-join co-partitions both sides on the order key (single
    shuffle), and oversized baskets are the skew knob (cap or salt)."""
    baskets = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    ic = baskets.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    nn = baskets.agg(F.countDistinct("o").alias("n"))
    a = baskets.select("o", F.col("p").alias("pa"))
    b = baskets.select("o", F.col("p").alias("pb"))
    co = (
        a.join(b, "o")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 3)
    )
    ia = ic.select(F.col("p").alias("pa"), F.col("c").alias("ca"))
    ib = ic.select(F.col("p").alias("pb"), F.col("c").alias("cb"))
    return (
        co.join(F.broadcast(ia), "pa")
        .join(F.broadcast(ib), "pb")
        .crossJoin(F.broadcast(nn))
        .select(
            "pa",
            "pb",
            "co",
            F.round(F.col("co").cast("double") / F.col("n"), 9).alias("support"),
            F.round(F.col("co").cast("double") / F.col("ca"), 9).alias("confidence"),
            F.round(
                (F.col("co").cast("double") * F.col("n"))
                / (F.col("ca").cast("double") * F.col("cb")),
                9,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "pa", "pb")
        .limit(30)
    )


# --------------------------------------------------------------------------
# Data-quality constraint suite (Deequ-style declarative checks)
# --------------------------------------------------------------------------

@register(
    "dq_constraint_suite",
    oracle="""
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(o_custkey) AS BIGINT) AS n_ck,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_ok,
         min(o_totalprice) AS min_price,
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                       THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
  FROM orders
),
ri AS (
  -- null keys are a COMPLETENESS failure, not a dangling reference
  SELECT CAST(count(*) AS BIGINT) AS orphans
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
)
SELECT * FROM (
  SELECT 'accepted_status_FOP' AS constraint_name,
         CAST(bad_status AS DOUBLE) AS metric, bad_status = 0 AS passed FROM m
  UNION ALL SELECT 'completeness_o_custkey',
         round(CAST(n_ck AS DOUBLE) / n_rows, 6), n_ck = n_rows FROM m
  UNION ALL SELECT 'min_o_totalprice_nonneg',
         round(min_price, 6), min_price >= 0 FROM m
  UNION ALL SELECT 'ref_integrity_custkey',
         CAST(orphans AS DOUBLE), orphans = 0 FROM ri
  UNION ALL SELECT 'row_count_nonzero',
         CAST(n_rows AS DOUBLE), n_rows > 0 FROM m
  UNION ALL SELECT 'unique_o_orderkey',
         round(CAST(n_ok AS DOUBLE) / n_rows, 6), n_ok = n_rows FROM m
)
ORDER BY constraint_name
""",
    tags=("data-quality", "constraints", "profiling"),
)
def dq_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality verification (the Deequ/
    great-expectations shape): completeness, uniqueness, value-range,
    accepted-values and referential-integrity constraints evaluated as
    ONE multi-aggregate scan plus one anti-join — metrics computed
    together, then pivoted to (constraint, metric, passed) verdict rows
    from a single-row frame. At 100 TB this is exactly how a
    constraint suite must run: N constraints share one pass over the
    fact table instead of N scans, and the RI check is a broadcast
    anti-join against the dimension."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    m = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").alias("n_ck"),
        F.countDistinct("o_orderkey").alias("n_ok"),
        F.min("o_totalprice").alias("min_price"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1).otherwise(0)
        ).alias("bad_status"),
    )
    ri = (
        orders.select("o_custkey")
        .filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    row = m.crossJoin(ri)
    checks = F.array(
        F.struct(
            F.lit("accepted_status_FOP").alias("constraint_name"),
            F.col("bad_status").cast("double").alias("metric"),
            (F.col("bad_status") == 0).alias("passed"),
        ),
        F.struct(
            F.lit("completeness_o_custkey").alias("constraint_name"),
            F.round(F.col("n_ck").cast("double") / F.col("n_rows"), 6).alias("metric"),
            (F.col("n_ck") == F.col("n_rows")).alias("passed"),
        ),
        F.struct(
            F.lit("min_o_totalprice_nonneg").alias("constraint_name"),
            F.round(F.col("min_price"), 6).alias("metric"),
            (F.col("min_price") >= 0).alias("passed"),
        ),
        F.struct(
            F.lit("ref_integrity_custkey").alias("constraint_name"),
            F.col("orphans").cast("double").alias("metric"),
            (F.col("orphans") == 0).alias("passed"),
        ),
        F.struct(
            F.lit("row_count_nonzero").alias("constraint_name"),
            F.col("n_rows").cast("double").alias("metric"),
            (F.col("n_rows") > 0).alias("passed"),
        ),
        F.struct(
            F.lit("unique_o_orderkey").alias("constraint_name"),
            F.round(F.col("n_ok").cast("double") / F.col("n_rows"), 6).alias("metric"),
            (F.col("n_ok") == F.col("n_rows")).alias("passed"),
        ),
    )
    return (
        row.select(F.explode(checks).alias("c"))
        .select("c.constraint_name", "c.metric", "c.passed")
        .orderBy("constraint_name")
    )


# --------------------------------------------------------------------------
# Robust statistics: rank-based exact median + MAD per group
# --------------------------------------------------------------------------

@register(
    "stats_mad_by_event_type",
    oracle="""
WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
cnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1),
rk AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
  FROM ev
),
med AS (
  SELECT r.event_type, round((min(r.value) + max(r.value)) / 2.0, 6) AS median
  FROM rk r JOIN cnt c USING (event_type)
  WHERE r.rn = (c.n + 1) // 2 OR r.rn = (c.n + 2) // 2
  GROUP BY 1
),
dev AS (
  SELECT e.event_type, abs(e.value - m.median) AS d
  FROM ev e JOIN med m USING (event_type)
),
rk2 AS (
  SELECT event_type, d,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn
  FROM dev
),
mad AS (
  SELECT r.event_type, round((min(r.d) + max(r.d)) / 2.0, 6) AS mad
  FROM rk2 r JOIN cnt c USING (event_type)
  WHERE r.rn = (c.n + 1) // 2 OR r.rn = (c.n + 2) // 2
  GROUP BY 1
)
SELECT c.event_type, c.n, m.median, d.mad
FROM cnt c JOIN med m USING (event_type) JOIN mad d USING (event_type)
ORDER BY 1
""",
    tags=("robust-stats", "median", "mad"),
)
def stats_mad_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median and MAD (median absolute deviation) via
    RANK selection rather than interpolation: pick the row(s) at ranks
    ⌈n/2⌉ and ⌊n/2⌋+1 and average them — (min+max)/2 of at most two
    values is order-free, so the result is deterministic across engines
    with no dependence on anyone's quantile interpolation convention.
    The robust-dispersion pair is the outlier-resistant counterpart of
    the z-score anomaly entry. Scale note: rank selection is a per-key
    sort; at 100 TB substitute percentile_approx cut points (the
    equi-depth histogram path) — the output contract is unchanged."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value").filter(
        F.col("value").isNotNull()
    )
    cnt = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    def rank_median(df: DataFrame, col: str, out: str) -> DataFrame:
        ranked = df.withColumn("rn", F.row_number().over(
            Window.partitionBy("event_type").orderBy(col)
        ))
        return (
            ranked.join(F.broadcast(cnt), "event_type")
            .filter(
                (F.col("rn") == F.expr("(n + 1) div 2"))
                | (F.col("rn") == F.expr("(n + 2) div 2"))
            )
            .groupBy("event_type")
            .agg(F.round((F.min(col) + F.max(col)) / 2.0, 6).alias(out))
        )

    med = rank_median(ev, "value", "median")
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("median")).alias("d")
    )
    mad = rank_median(dev, "d", "mad")
    return (
        cnt.join(med, "event_type")
        .join(mad, "event_type")
        .select("event_type", "n", "median", "mad")
        .orderBy("event_type")
    )

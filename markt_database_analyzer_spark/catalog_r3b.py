"""Round-3 third tranche: SCD2 history build, hierarchical time-grain
rollup, count-min sketch frequencies, blocked fuzzy (edit-distance)
entity matching, a BPE merge step, PMI collocations, incremental
aggregate maintenance, and Z-order layout keys.

Every entry follows the catalog contract: a PySpark program plus a
DuckDB oracle that replays the identical semantics (same md5-hash
family, same micro-unit quantization grid, same double-arithmetic
association), hash-compared at sf0.01 by the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, register, _t
from .datapipe.sketches import cms_cells, cms_estimate, sql_cms_bucket
from .functions import dsum
from .functions.zorder import sql_zorder2, zorder2
from .operators.scd import scd2_versions


# --------------------------------------------------------------------------
# SCD2 dimension history (collapse changelog runs into validity intervals)
# --------------------------------------------------------------------------

@register(
    "scd2_user_state_history",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, event_type)
),
changes AS (
  SELECT user_id, event_type, ts, event_id
  FROM ordered WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id,
       CAST(row_number() OVER w2 AS BIGINT) AS version_no,
       event_type,
       ts AS valid_from,
       lead(ts) OVER w2 AS valid_to,
       (lead(ts) OVER w2 IS NULL) AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id, event_type)
ORDER BY user_id, version_no
""",
    tags=("scd", "window", "warehouse"),
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: treat events as a per-user
    state changelog (event_type = the tracked attribute), collapse
    consecutive runs, and emit one validity interval per version with
    valid_from/valid_to/is_current. The warehouse-general form of the
    reference's per-listing state-over-time handling (analyse.py's
    per-key trajectory ordering). Two windows over the SAME (key, order)
    partitioning -> Catalyst plans one shuffle; the order is made total
    with (ts, event_id, event_type) tiebreaks so both engines collapse
    identical runs."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    out = scd2_versions(
        ev, key="user_id", attr="event_type", order_by=["ts", "event_id", "event_type"]
    )
    return out.orderBy("user_id", "version_no")


# --------------------------------------------------------------------------
# Hierarchical time-grain rollup (continuous-aggregate cascade)
# --------------------------------------------------------------------------

_ROLLUP_GRAIN_SQL = """
  SELECT '{g}' AS grain, date_trunc('{g}', ts) AS bucket_start,
         CAST(count(*) AS BIGINT) AS n, {total} AS total
  FROM events GROUP BY 2"""


@register(
    "rollup_hier_timegrain",
    oracle=(
        "WITH g AS ("
        + " UNION ALL ".join(
            _ROLLUP_GRAIN_SQL.format(g=g, total=SQL_DSUM.format(x="value"))
            for g in ("hour", "day", "month")
        )
        + """)
SELECT grain, bucket_start, n, total, round(total / n, 6) AS avg_value
FROM g ORDER BY grain, bucket_start"""
    ),
    tags=("rollup", "timeseries", "hierarchical"),
)
def rollup_hier_timegrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: hour partials from
    the raw scan, then DAY re-aggregated from the hourly partials and
    MONTH from the daily ones — the raw table is scanned ONCE and each
    coarser grain aggregates ~24x/~30x fewer rows than a direct
    group-by. At 100 TB this is the difference between three full scans
    and one: the cascade's day/month stages shuffle only bucket-count
    rows. Exactness under re-aggregation is guaranteed by the micro-unit
    grid (hour totals are exact multiples of 1e-6, so re-quantizing them
    is lossless); the oracle computes each grain directly from raw rows
    and must match bit-for-bit."""
    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "value"
    )
    hourly = ev.groupBy("hour").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total")
    )
    daily = hourly.groupBy(F.date_trunc("day", F.col("hour")).alias("day")).agg(
        F.sum("n").alias("n"), dsum(F.col("total")).alias("total")
    )
    monthly = daily.groupBy(F.date_trunc("month", F.col("day")).alias("month")).agg(
        F.sum("n").alias("n"), dsum(F.col("total")).alias("total")
    )

    def shape(df: DataFrame, grain: str, bucket: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            F.col(bucket).alias("bucket_start"),
            "n",
            "total",
        )

    out = (
        shape(hourly, "hour", "hour")
        .unionByName(shape(daily, "day", "day"))
        .unionByName(shape(monthly, "month", "month"))
    )
    return out.select(
        "grain",
        "bucket_start",
        "n",
        "total",
        F.round(F.col("total") / F.col("n"), 6).alias("avg_value"),
    ).orderBy("grain", "bucket_start")


# --------------------------------------------------------------------------
# Count-min sketch frequency estimation (constant-size counters)
# --------------------------------------------------------------------------

_CMS_D, _CMS_W = 4, 64


def _cms_union(select_prefix: str, src: str) -> str:
    return " UNION ALL ".join(
        f"SELECT {select_prefix}, {r} AS d, {sql_cms_bucket('k', r, _CMS_W)} AS b FROM {src}"
        for r in range(_CMS_D)
    )


@register(
    "sketch_countmin_freq",
    oracle=f"""
WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
pairs AS ({_cms_union("1 AS one", "ev")}),
cells AS (SELECT d, b, CAST(count(*) AS BIGINT) AS c FROM pairs GROUP BY d, b),
truth AS (SELECT k, CAST(count(*) AS BIGINT) AS true_n FROM ev GROUP BY k),
probes AS ({_cms_union("k, true_n", "truth")}),
est AS (
  SELECT p.k, min(p.true_n) AS true_n, min(c.c) AS est
  FROM probes p JOIN cells c USING (d, b) GROUP BY p.k
)
SELECT CAST(k AS BIGINT) AS user_id, est, true_n,
       est >= true_n AS no_underestimate
FROM est ORDER BY user_id
""",
    tags=("sketch", "frequency", "streaming"),
)
def sketch_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan): d=4 hash rows x w=64
    buckets estimate per-user event frequencies with CONSTANT shuffle
    volume — partial aggregation collapses every partition to <= d*w
    cells before the exchange, so the sketch build never shuffles
    per-key rows no matter the cardinality. The estimate (min over the
    d probed cells) is compared against the exact count; the CMS
    one-sided guarantee (never under-counts) is emitted as a column the
    driver value-checks on every key. The md5-seeded hash family is
    engine-portable, so the oracle replays the sketch exactly."""
    ev = _t(spark, sf_dir, "events").select(F.col("user_id").cast("string").alias("k"))
    cells = cms_cells(ev, F.col("k"), depth=_CMS_D, width=_CMS_W)
    truth = ev.groupBy("k").agg(F.count(F.lit(1)).alias("true_n"))
    est = cms_estimate(truth, F.col("k"), cells, depth=_CMS_D, width=_CMS_W)
    return est.select(
        F.col("k").cast("bigint").alias("user_id"),
        "est",
        "true_n",
        (F.col("est") >= F.col("true_n")).alias("no_underestimate"),
    ).orderBy("user_id")


# --------------------------------------------------------------------------
# Blocked fuzzy matching (edit-distance entity resolution)
# --------------------------------------------------------------------------

_FUZZY_SN_WINDOW = 20  # sorted-neighborhood width: per-row verify work is O(W)


def fuzzy_block_candidates(
    p: DataFrame, prefix_sum_ranks_above: int = 100_000
) -> DataFrame:
    """Shared capped fuzzy-ER candidate generator (used by
    ``join_fuzzy_blocked`` and ``er_fuzzy_canonicalize``): blocked on
    (name-noun, size), sorted-neighborhood rank band W via gap-offset
    explode so candidate enumeration is a pure equi-join doing O(n*W)
    work. Input needs columns p_partkey, p_name, p_size, blk (blk
    non-null and '|'-free — it is a single word from p_name); output is
    (a_key, b_key, a_name, b_name, dist) with dist in [1, 3].

    Block ranking is two-geared (ADVICE r4, VERDICT r5). Below
    ``prefix_sum_ranks_above`` rows it is a plain ``row_number()``
    window over (blk, p_size) — one shuffle, fastest at fixture scale.
    Above it, that window is the last single-task growth pattern in the
    catalog: the block vocabulary is FIXED (a word list x ~50 sizes),
    so each hash-partition of the window shuffle carries n/#partitions
    data rows through one sorting task, linear in the corpus. The scale
    gear instead derives ranks from the range-partitioned grouped
    prefix sum (``operators/equidepth.py``): p_partkey is unique within
    a block, so the cumulative distinct-value count IS the dense
    1-based rank, every task is bounded by a range slice of the
    (block, key) domain, and the rank map joins back on the
    globally-unique p_partkey. Both gears produce identical ranks
    (pinned by test)."""
    if p.count() <= prefix_sum_ranks_above:
        w = Window.partitionBy("blk", "p_size").orderBy("p_partkey")
        pr = p.withColumn("rnk", F.row_number().over(w))
    else:
        from .operators.equidepth import grouped_value_counts_cum

        gkey = F.concat_ws("|", F.col("blk"), F.col("p_size").cast("string"))
        cum, _ = grouped_value_counts_cum(p, gkey, F.col("p_partkey"))
        ranks = cum.select(
            F.col("v").alias("p_partkey"), F.col("cum").alias("rnk")
        )
        pr = p.join(ranks, "p_partkey")
    b = pr.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
        "p_size",
        "blk",
        F.explode(
            F.array(*[F.lit(j) for j in range(1, _FUZZY_SN_WINDOW + 1)])
        ).alias("gap"),
        F.col("rnk").alias("b_rnk"),
    ).withColumn("a_rnk", F.col("b_rnk") - F.col("gap"))
    dist = F.levenshtein(F.col("p_name"), F.col("b_name"))
    return (
        pr.join(
            b,
            on=[pr["blk"] == b["blk"], pr["p_size"] == b["p_size"], pr["rnk"] == b["a_rnk"]],
        )
        .filter(dist.between(1, 3))
        .select(
            F.col("p_partkey").alias("a_key"),
            "b_key",
            F.col("p_name").alias("a_name"),
            "b_name",
            dist.cast("bigint").alias("dist"),
        )
    )


@register(
    "join_fuzzy_blocked",
    oracle=f"""
WITH p AS (
  SELECT p_partkey, p_name, p_size, string_split(p_name, ' ')[2] AS blk,
         row_number() OVER (PARTITION BY string_split(p_name, ' ')[2], p_size
                            ORDER BY p_partkey) AS rnk
  FROM part
)
SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
       a.p_name AS a_name, b.p_name AS b_name,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM p a JOIN p b
  ON a.blk = b.blk AND a.p_size = b.p_size
 AND b.rnk - a.rnk BETWEEN 1 AND {_FUZZY_SN_WINDOW}
WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
ORDER BY a_key, b_key
""",
    tags=("fuzzy", "join", "entity-resolution"),
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance with BLOCKING plus a
    SORTED-NEIGHBORHOOD cap (Hernandez & Stolfo 1995): candidate pairs
    come from an equi-join on a cheap deterministic block key (the
    name's noun token + p_size), and within a block only rows whose
    partkey-order ranks are within W={_FUZZY_SN_WINDOW} of each other
    are compared. Without the cap, per-block verify work is O(block**2)
    and the 400 block keys here are corpus-independent, so blocks — and
    the quadratic — GROW with the data (measured r3: 9.9x wall / 69x
    shuffle at 10x). With it, each row is compared to at most W
    neighbors: total work O(n*W), linear in the corpus. The rank join
    is made a pure equi-join by exploding the right side over the W
    gap offsets — candidate enumeration itself is linear, not just the
    post-filter. At sf0.01 every block has <= 13 rows, so the capped
    output is row-identical to the uncapped r1-r3 form; the cap is
    reflected in the oracle's rank-band condition. levenshtein() is
    JVM-side in Spark and built-in in DuckDB — the oracle is a literal
    semantic replay. Candidate generation is the shared
    :func:`fuzzy_block_candidates` (gap-offset explode — a block of m
    rows yields <= m*W candidate rows, never m**2)."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_size",
        F.split(F.col("p_name"), " ").getItem(1).alias("blk"),
    )
    return fuzzy_block_candidates(p).orderBy("a_key", "b_key")


# --------------------------------------------------------------------------
# BPE merge step (tokenizer-training pair statistics)
# --------------------------------------------------------------------------

@register(
    "text_bpe_pair_merge",
    oracle="""
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS wc
  FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  )
  WHERE len(w) >= 2 GROUP BY w
),
pairs AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> substr(w, i, 2))) AS pair, wc
  FROM words
)
SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt
FROM pairs GROUP BY pair
ORDER BY cnt DESC, pair LIMIT 20
""",
    tags=("text", "bpe", "tokenizer"),
)
def text_bpe_pair_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding merge iteration (Sennrich 2016): count
    adjacent symbol pairs weighted by corpus word frequency and rank
    the merge candidates. The scale trick is the two-level aggregation:
    raw text collapses to a VOCABULARY (word, count) table first — at
    100 TB the vocabulary is millions of rows, not trillions — and the
    quadratic-looking pair explosion runs over the vocabulary only.
    Pair cardinality is bounded by the symbol alphabet (<= 26^2 here),
    so the final agg is map-side-combined to near-nothing. This is the
    distributed inner loop of tokenizer training."""
    words = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(20)
    )


# --------------------------------------------------------------------------
# PMI collocations (statistically-associated bigrams)
# --------------------------------------------------------------------------

@register(
    "text_pmi_collocations",
    oracle="""
WITH docs AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> len(x) > 0) AS ts
  FROM documents
),
uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(ts) AS w FROM docs) GROUP BY w
),
bi AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS cxy
  FROM (
    SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
           unnest(list_transform(range(1, len(ts)), i -> ts[i + 1])) AS w2
    FROM docs WHERE len(ts) >= 2
  ) GROUP BY w1, w2
),
tot AS (
  SELECT (SELECT CAST(sum(c) AS DOUBLE) FROM uni) AS nu,
         (SELECT CAST(sum(cxy) AS DOUBLE) FROM bi) AS nb
)
SELECT b.w1, b.w2, b.cxy,
       round(ln(((CAST(b.cxy AS DOUBLE) * t.nu) /
                 (CAST(u1.c AS DOUBLE) * u2.c)) * (t.nu / t.nb)), 9) AS pmi
FROM bi b
JOIN uni u1 ON b.w1 = u1.w
JOIN uni u2 ON b.w2 = u2.w
CROSS JOIN tot t
WHERE b.cxy >= 5
ORDER BY pmi DESC, w1, w2 LIMIT 30
""",
    tags=("text", "collocation", "pmi"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise-mutual-information collocation mining: rank bigrams by
    ln(p(xy) / (p(x)p(y))) with a min-support gate (cxy >= 5), the
    standard association measure for phrase extraction in LLM-corpus
    analysis (Church & Hanks 1990). Unigram and bigram counts are two
    hash aggs off one tokenized projection; the corpus totals are 1-row
    aggregates broadcast into the scoring join, and the unigram side of
    the count join is vocabulary-sized (broadcastable at any corpus
    scale). The double-arithmetic association in the PMI formula is
    written identically in both engines so the rounded-9dp score
    hash-matches."""
    docs = _t(spark, sf_dir, "documents").select(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"),
            lambda x: F.length(x) > 0,
        ).alias("ts")
    )
    uni = (
        docs.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        docs.filter(F.size("ts") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ts) - 1),"
                    " i -> struct(element_at(ts, i) AS w1, element_at(ts, i + 1) AS w2))"
                )
            ).alias("s")
        )
        .select("s.w1", "s.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cxy"))
    )
    nu = uni.agg(F.sum("c").cast("double").alias("nu"))
    nb = bi.agg(F.sum("cxy").cast("double").alias("nb"))
    tot = nu.crossJoin(nb)
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    scored = (
        bi.filter(F.col("cxy") >= 5)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "cxy",
            F.round(
                F.log(
                    (
                        (F.col("cxy").cast("double") * F.col("nu"))
                        / (F.col("c1").cast("double") * F.col("c2"))
                    )
                    * (F.col("nu") / F.col("nb"))
                ),
                9,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(30)


# --------------------------------------------------------------------------
# Incremental aggregate maintenance (materialized-view delta merge)
# --------------------------------------------------------------------------

_INCR_CUTOFF = "1999-01-01"


@register(
    "agg_incremental_maintenance",
    oracle=f"""
SELECT o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n,
       {SQL_DSUM.format(x="o_totalprice")} AS revenue
FROM orders GROUP BY 1 ORDER BY 1
""",
    tags=("incremental", "materialized-view", "aggregate"),
)
def agg_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view delta maintenance: the pre-cutoff snapshot
    aggregate is MERGED with the post-cutoff delta aggregate (union of
    partial states + one re-agg) instead of recomputing from raw rows —
    the incremental-view-maintenance identity for distributive
    aggregates (sum/count merge; avg derives). At 100 TB this is the
    operation a nightly refresh actually runs: the delta scan touches
    one day's partition, the merge touches group-cardinality rows. The
    oracle is the FULL recompute over all rows — the driver's hash match
    proves merge(old, delta) == recompute, which the micro-unit grid
    makes exact (partial sums are 1e-6 multiples, so re-quantization is
    lossless)."""
    base = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"), "o_totalprice", "o_orderdate"
    )
    cutoff = F.lit(_INCR_CUTOFF).cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("priority").agg(
            F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("revenue")
        )

    snapshot = partial(base.filter(F.col("o_orderdate") < cutoff))
    delta = partial(base.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        snapshot.unionByName(delta)
        .groupBy("priority")
        .agg(F.sum("n").alias("n"), dsum(F.col("revenue")).alias("revenue"))
    )
    return merged.orderBy("priority")


# --------------------------------------------------------------------------
# Z-order layout keys (multi-dimensional data clustering)
# --------------------------------------------------------------------------

_Z_BITS = 10
_Z_BUCKET_SHIFT = 14  # 20-bit z >> 14 -> 64 layout buckets


@register(
    "layout_zorder_stats",
    oracle=f"""
WITH src AS (
  SELECT (o_custkey & {(1 << _Z_BITS) - 1}) AS xm,
         (CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT)
            & {(1 << _Z_BITS) - 1}) AS ym,
         {sql_zorder2("o_custkey",
                      "CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT)",
                      _Z_BITS)} AS z
  FROM orders
)
SELECT (z >> {_Z_BUCKET_SHIFT}) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(xm) AS x_min, max(xm) AS x_max,
       min(ym) AS y_min, max(ym) AS y_max
FROM src GROUP BY 1 ORDER BY bucket
""",
    tags=("layout", "zorder", "clustering"),
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order-day) plus
    the per-bucket min/max envelope a writer would persist as file
    stats. Interleaving makes each z-range bucket tight in BOTH
    dimensions at once, so `repartitionByRange(z).sortWithinPartitions
    (z)` + parquet min/max gives file-level pruning for predicates on
    EITHER column — the Delta/Iceberg OPTIMIZE ZORDER layout, here as a
    pure loop-unrolled shift/or expression (whole-stage codegen, no
    UDF). The returned envelope widths are the evidence: bucket spans
    cover ~1/8 of each dimension's masked range rather than all of it.
    test_r3b verifies the pruning claim directly on a range-partitioned
    write."""
    x = F.col("o_custkey")
    y = F.floor(F.col("o_orderdate").cast("double") / 86400.0).cast("bigint")
    mask = (1 << _Z_BITS) - 1
    src = _t(spark, sf_dir, "orders").select(
        x.bitwiseAND(F.lit(mask)).alias("xm"),
        y.bitwiseAND(F.lit(mask)).alias("ym"),
        zorder2(x, y, bits=_Z_BITS).alias("z"),
    )
    return (
        src.groupBy(F.shiftright(F.col("z"), _Z_BUCKET_SHIFT).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("xm").alias("x_min"),
            F.max("xm").alias("x_max"),
            F.min("ym").alias("y_min"),
            F.max("ym").alias("y_max"),
        )
        .orderBy("bucket")
    )

"""Round-3 fourteenth tranche: C4 line filters, CCNet perplexity
buckets, Welch's t-test, a Pearson correlation matrix, exact triangle
counting, the GROUP BY ALL / ORDER BY ALL SQL surface, and epoch-aware
fractional upsampling.

Catalog contract as everywhere: (Spark program, DuckDB oracle) pairs
with identical semantics; deterministic floats via the micro-unit grid
(functions/aggregates.py) so hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import register, _t
from .datapipe import lm
from .datapipe import text as tx
from .datapipe.clustering import triangle_stats
from .datapipe.hashing import hash60, sql_hash60
from .datapipe.sampling import RESOLUTION, _gate, sql_gate
from .datapipe.util import fan_out

_LINE_TOKENS = 6


def _sql_c4_lines() -> str:
    toks = tx.sql_tokens("text")
    keep = tx.sql_c4_line_keep("line")
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
line0 AS (
  SELECT doc_id, g AS pos,
         array_to_string(toks[(g * {_LINE_TOKENS} + 1):((g + 1) * {_LINE_TOKENS})], ' ') AS l0
  FROM t, unnest(generate_series(0, CAST(ceil(len(toks) / {_LINE_TOKENS}.0) AS INT) - 1)) AS u(g)
  WHERE len(toks) > 0
),
lines AS (
  SELECT doc_id, pos,
         CASE WHEN {sql_hash60('l0')} % 2 = 0 THEN l0 || '.' ELSE l0 END AS line
  FROM line0
),
flagged AS (SELECT doc_id, pos, line, {keep} AS keep FROM lines)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
       (count(*) FILTER (WHERE keep)) >= 3 AS keep_doc,
       md5(coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE keep), ''))
         AS clean_md5
FROM flagged GROUP BY doc_id ORDER BY doc_id
"""


@register(
    "text_c4_line_filters",
    oracle=_sql_c4_lines(),
    tags=("text", "c4", "filter", "curation"),
)
def text_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation, have >= 3 words, contain no
    curly brace and no 'lorem ipsum'; a doc survives with >= 3 kept
    lines. The testdata corpus is single-line and unpunctuated, so lines
    are derived deterministically — fixed 6-token chunks, with a
    terminal '.' appended when the chunk's 60-bit hash is even — which
    exercises every rule with a mixed outcome while both engines replay
    the identical derivation. All row-local higher-order-function
    expressions (codegen, no UDF, no shuffle beyond the per-doc
    reassembly); at 100 TB the only shuffle key is doc_id."""
    docs = _t(spark, sf_dir, "documents")
    toks = tx.tokens("text")
    n_lines = F.ceil(F.size(toks) / F.lit(_LINE_TOKENS)).cast("int")
    raw = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda g: F.array_join(
            F.slice(toks, g * _LINE_TOKENS + 1, _LINE_TOKENS), " "
        ),
    )
    lines = F.transform(
        raw,
        lambda l: F.when(
            hash60(l) % F.lit(2) == 0, F.concat(l, F.lit("."))
        ).otherwise(l),
    )
    flagged = (
        fan_out(docs)
        .filter(F.size(toks) > 0)
        .select("doc_id", F.posexplode(lines).alias("pos", "line"))
        .withColumn("keep", tx.c4_line_keep(F.col("line")))
    )
    kept_struct = F.when(F.col("keep"), F.struct("pos", "line"))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(F.col("keep"), 1)).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s["line"],
                    ),
                    "\n",
                )
            ).alias("clean_md5"),
        )
        .select(
            "doc_id",
            "n_lines",
            "n_kept",
            (F.col("n_kept") >= 3).alias("keep_doc"),
            "clean_md5",
        )
        .orderBy("doc_id")
    )


def _sql_ccnet_buckets() -> str:
    scores = lm.sql_bigram_logprob_scores()
    return f"""
WITH j AS (
  SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_neg_logp,
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY s.avg_neg_logp, s.doc_id) AS tercile
  FROM ({scores}) s JOIN documents d USING (doc_id)
  WHERE s.n_bigrams > 0
)
SELECT doc_id, lang, n_bigrams, avg_neg_logp,
       CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS ppl_bucket
FROM j ORDER BY doc_id
"""


@register(
    "text_ccnet_buckets",
    oracle=_sql_ccnet_buckets(),
    tags=("text", "lm", "curation", "ccnet"),
)
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    doc under the corpus bigram LM, then split each language into
    head / middle / tail terciles by per-token NLL — the standard
    precursor to keeping 'head' for LM pretraining. Reuses the add-α
    bigram scorer (datapipe/lm.py) whose per-term rounding makes the NLL
    engine-portable; the tercile is ntile(3) over a total order
    (nll, doc_id), so bucket membership is reproducible run-to-run and
    across engines. The per-language window shuffles (lang) — ~dozens of
    partitions at any scale; skew between languages is real at 100 TB
    but ntile only needs a sort within each language, which AQE splits
    across reducers."""
    docs = _t(spark, sf_dir, "documents")
    scores = lm.bigram_logprob_scores(docs, "text", "doc_id")
    scored = (
        scores.filter(F.col("n_bigrams") > 0)
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    w = Window.partitionBy("lang").orderBy("avg_neg_logp", "doc_id")
    tercile = F.ntile(3).over(w)
    return (
        scored.withColumn("tercile", tercile)
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            "avg_neg_logp",
            F.when(F.col("tercile") == 1, "head")
            .when(F.col("tercile") == 2, "middle")
            .otherwise("tail")
            .alias("ppl_bucket"),
        )
        .orderBy("doc_id")
    )


_WELCH_A, _WELCH_B = "click", "view"


def _sql_welch() -> str:
    return f"""
WITH q AS (
  SELECT event_type, CAST(round(value * 1000000.0) AS HUGEINT) AS q
  FROM events WHERE event_type IN ('{_WELCH_A}', '{_WELCH_B}')
),
s AS (
  SELECT
    CAST(count(*) FILTER (WHERE event_type = '{_WELCH_A}') AS BIGINT) AS n1,
    CAST(count(*) FILTER (WHERE event_type = '{_WELCH_B}') AS BIGINT) AS n2,
    CAST(sum(q)     FILTER (WHERE event_type = '{_WELCH_A}') AS DOUBLE) AS a1,
    CAST(sum(q * q) FILTER (WHERE event_type = '{_WELCH_A}') AS DOUBLE) AS a2,
    CAST(sum(q)     FILTER (WHERE event_type = '{_WELCH_B}') AS DOUBLE) AS b1,
    CAST(sum(q * q) FILTER (WHERE event_type = '{_WELCH_B}') AS DOUBLE) AS b2
  FROM q
),
m AS (
  SELECT n1, n2,
         a1 / n1 / 1000000.0 AS m1,
         b1 / n2 / 1000000.0 AS m2,
         (a2 - a1 * a1 / n1) / (n1 - 1) / 1e12 AS v1,
         (b2 - b1 * b1 / n2) / (n2 - 1) / 1e12 AS v2
  FROM s
)
SELECT n1, n2,
       round(m1, 6) AS mean_a, round(m2, 6) AS mean_b,
       round(v1, 6) AS var_a,  round(v2, 6) AS var_b,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
       round(
         (v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
         / ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v2 / n2) * (v2 / n2) / (n2 - 1)),
         6
       ) AS welch_dof
FROM m
"""


@register(
    "stats_welch_ttest",
    oracle=_sql_welch(),
    tags=("stats", "hypothesis-test"),
)
def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two event types' value
    distributions — the A/B-test primitive. One conditional-aggregation
    pass over the fact (map-side combinable: 6 sums, no join, no
    window); the t statistic and Welch–Satterthwaite dof are computed
    from exact integer moment sums on the micro-unit grid, cast to
    double once, so both engines evaluate the identical IEEE expression
    tree — bit-equal before the 6-dp presentation rounding. At 100 TB
    this is a single shuffle of 6 numbers."""
    cond_a = F.col("event_type") == _WELCH_A
    cond_b = F.col("event_type") == _WELCH_B
    q = F.round(F.col("value") * 1000000.0).cast("decimal(38,0)")
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_WELCH_A, _WELCH_B)
    )
    s = ev.agg(
        F.count(F.when(cond_a, 1)).alias("n1"),
        F.count(F.when(cond_b, 1)).alias("n2"),
        F.sum(F.when(cond_a, q)).cast("double").alias("a1"),
        F.sum(F.when(cond_a, q * q)).cast("double").alias("a2"),
        F.sum(F.when(cond_b, q)).cast("double").alias("b1"),
        F.sum(F.when(cond_b, q * q)).cast("double").alias("b2"),
    )
    m1 = F.col("a1") / F.col("n1") / F.lit(1000000.0)
    m2 = F.col("b1") / F.col("n2") / F.lit(1000000.0)
    v1 = (F.col("a2") - F.col("a1") * F.col("a1") / F.col("n1")) / (
        F.col("n1") - 1
    ) / F.lit(1e12)
    v2 = (F.col("b2") - F.col("b1") * F.col("b1") / F.col("n2")) / (
        F.col("n2") - 1
    ) / F.lit(1e12)
    se1, se2 = v1 / F.col("n1"), v2 / F.col("n2")
    return s.select(
        "n1",
        "n2",
        F.round(m1, 6).alias("mean_a"),
        F.round(m2, 6).alias("mean_b"),
        F.round(v1, 6).alias("var_a"),
        F.round(v2, 6).alias("var_b"),
        F.round((m1 - m2) / F.sqrt(se1 + se2), 6).alias("t_stat"),
        F.round(
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1)),
            6,
        ).alias("welch_dof"),
    )


_CORR_VARS = ("l_quantity", "l_extendedprice", "l_discount")


def _sql_corr_matrix() -> str:
    qs = {v: f"CAST(round({v} * 1000000.0) AS HUGEINT)" for v in _CORR_VARS}
    sums = ",\n    ".join(
        [f"CAST(count(*) AS DOUBLE) AS n"]
        + [f"CAST(sum({qs[v]}) AS DOUBLE) AS s_{v}" for v in _CORR_VARS]
        + [
            f"CAST(sum({qs[v]} * {qs[w]}) AS DOUBLE) AS p_{v}_{w}"
            for i, v in enumerate(_CORR_VARS)
            for w in _CORR_VARS[i:]
        ]
    )

    def corr(v, w):
        return (
            f"round((n * p_{v}_{w} - s_{v} * s_{w})"
            f" / (sqrt(n * p_{v}_{v} - s_{v} * s_{v})"
            f" * sqrt(n * p_{w}_{w} - s_{w} * s_{w})), 9)"
        )

    rows = "\nUNION ALL\n".join(
        f"SELECT '{v}' AS x_var, '{w}' AS y_var, {corr(v, w)} AS pearson_r FROM s"
        for i, v in enumerate(_CORR_VARS)
        for w in _CORR_VARS[i + 1 :]
    )
    return f"WITH s AS (\n  SELECT {sums}\n  FROM lineitem\n)\n{rows}\nORDER BY x_var, y_var"


@register(
    "stats_corr_matrix",
    oracle=_sql_corr_matrix(),
    tags=("stats", "correlation"),
)
def stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures in
    ONE aggregation pass (the textbook sufficient-statistics form:
    n, Σx, Σx², Σxy per pair — 10 aggregates, map-side combinable, no
    shuffle beyond the 1-row combine). Moment sums are exact integers on
    the micro-unit grid accumulated through DECIMAL(38,0) (products up
    to ~1e22 — far past int64, safe in 38 digits / HUGEINT), cast to
    double once; both engines then evaluate the identical IEEE formula,
    so the 9-dp rounding is cosmetic, not load-bearing. The long-format
    output (x_var, y_var, r) is exploded from the single stats row."""
    li = _t(spark, sf_dir, "lineitem")

    def q(v):
        return F.round(F.col(v) * 1000000.0).cast("decimal(38,0)")

    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [F.sum(q(v)).cast("double").alias(f"s_{v}") for v in _CORR_VARS]
    aggs += [
        F.sum(q(v) * q(w)).cast("double").alias(f"p_{v}_{w}")
        for i, v in enumerate(_CORR_VARS)
        for w in _CORR_VARS[i:]
    ]
    s = li.agg(*aggs)

    def corr(v, w):
        n = F.col("n")
        return F.round(
            (n * F.col(f"p_{v}_{w}") - F.col(f"s_{v}") * F.col(f"s_{w}"))
            / (
                F.sqrt(n * F.col(f"p_{v}_{v}") - F.col(f"s_{v}") * F.col(f"s_{v}"))
                * F.sqrt(n * F.col(f"p_{w}_{w}") - F.col(f"s_{w}") * F.col(f"s_{w}"))
            ),
            9,
        )

    pairs = F.array(
        *[
            F.struct(
                F.lit(v).alias("x_var"),
                F.lit(w).alias("y_var"),
                corr(v, w).alias("pearson_r"),
            )
            for i, v in enumerate(_CORR_VARS)
            for w in _CORR_VARS[i + 1 :]
        ]
    )
    return (
        s.select(F.explode(pairs).alias("p"))
        .select("p.x_var", "p.y_var", "p.pearson_r")
        .orderBy("x_var", "y_var")
    )


def _sql_triangles() -> str:
    return """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, count(*) AS deg
  FROM (SELECT x AS node FROM e UNION ALL SELECT y AS node FROM e)
  GROUP BY node
),
o AS (
  SELECT CASE WHEN (dx.deg, e.x) < (dy.deg, e.y) THEN e.x ELSE e.y END AS a,
         CASE WHEN (dx.deg, e.x) < (dy.deg, e.y) THEN e.y ELSE e.x END AS b,
         CASE WHEN (dx.deg, e.x) < (dy.deg, e.y) THEN dy.deg ELSE dx.deg END AS db
  FROM e JOIN deg dx ON dx.node = e.x JOIN deg dy ON dy.node = e.y
),
w AS (
  SELECT o1.b AS w1, o2.b AS w2
  FROM o o1 JOIN o o2 ON o1.a = o2.a
  WHERE (o1.db, o1.b) < (o2.db, o2.b)
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM w JOIN o ON o.a = w.w1 AND o.b = w.w2
),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(deg * (deg - 1)) // 2 AS BIGINT) AS n_wedges
  FROM deg
),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       round(3.0 * n_triangles / nullif(CAST(n_wedges AS DOUBLE), 0.0), 9)
         AS global_clustering
FROM base, ne, tri
"""


@register(
    "graph_triangle_count",
    oracle=_sql_triangles(),
    tags=("graph", "triangle"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count + global clustering coefficient of the
    co-purchase graph (parts sharing an order), via degree-ordered
    orientation (datapipe/clustering.py triangle_stats): every edge is
    oriented low→high under (degree, id), wedges are generated only from
    oriented adjacency, and each triangle is counted exactly once by
    closing the wedge against the oriented edge set. Out-degree after
    orientation is O(sqrt(m)) on ANY graph — the property that makes the
    wedge join survive power-law skew at 100 TB, where a raw neighbor
    self-join on a celebrity node would produce 1e14 wedge rows. All
    joins are equi-joins on node ids; the (deg, id) order is compared
    pairwise as a join residual, never materialized as a global rank."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
    )
    return triangle_stats(pairs)


_GBA_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(l_quantity * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE)
         / 1000000.0 AS sum_qty
FROM {t}
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY ALL
ORDER BY ALL
"""


@register(
    "sql_group_by_all",
    oracle=_GBA_SQL.format(t="lineitem"),
    tags=("sql", "surface"),
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (Spark 4 and DuckDB both implement the
    DuckDB-popularized shorthand) — run as the IDENTICAL SQL text in
    both engines, like the LATERAL and recursive-CTE entries: the hash
    match pins that the shorthand resolves to the same grouping/ordering
    set. The aggregate itself is the deterministic micro-unit sum, so
    values are bit-equal, not just shape-equal."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gba_src")
    return spark.sql(_GBA_SQL.format(t="lineitem_gba_src"))


_EPOCH_SEED = 11


def _sql_epoch_upsample() -> str:
    gate = sql_gate("doc_id", seed=_EPOCH_SEED, salt="epoch")
    return f"""
WITH d AS (
  SELECT doc_id, source,
         (250000 + (CAST(substring(source, 4, 10) AS INT) % 7) * 500000) AS w_ppm,
         {gate} AS gate
  FROM documents
),
c AS (
  SELECT doc_id, source,
         CAST(w_ppm // {RESOLUTION}
              + CASE WHEN gate < w_ppm % {RESOLUTION} THEN 1 ELSE 0 END
            AS BIGINT) AS n_copies
  FROM d
)
SELECT doc_id, source, n_copies,
       unnest(range(1, n_copies + 1)) AS copy_id
FROM c WHERE n_copies >= 1
ORDER BY doc_id, copy_id
"""


@register(
    "sample_epoch_upsample",
    oracle=_sql_epoch_upsample(),
    tags=("sampling", "mixing", "epochs"),
)
def sample_epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aware fractional upsampling — the training-mix operator for
    per-source epoch counts > 1 (e.g. wiki x2.5, books x0.25): every doc
    gets floor(w) full copies plus one more iff its deterministic hash
    gate lands under frac(w). Weights are carried as integer ppm
    (w_ppm = 250000 + (source#, mod 7) * 500000 — derived, not a 20-arm
    literal table), so the gate compare is pure int arithmetic: exactly
    reproducible, subset-stable, no RNG, identical in both engines.
    Copies materialize via explode(sequence(1, n)) — map-only, no
    shuffle, no driver loop; at 100 TB the output is written straight to
    the shuffle-free sink and the expected blow-up is Σ w_s · |s|."""
    docs = _t(spark, sf_dir, "documents")
    w_ppm = (
        F.lit(250000)
        + (F.substring("source", 4, 10).cast("int") % 7) * F.lit(500000)
    )
    gate = _gate("doc_id", seed=_EPOCH_SEED, salt="epoch")
    n_copies = (
        F.floor(w_ppm / F.lit(RESOLUTION))
        + F.when(gate < w_ppm % F.lit(RESOLUTION), 1).otherwise(0)
    ).cast("bigint")
    return (
        docs.select("doc_id", "source", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            "n_copies",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))).alias(
                "copy_id"
            ),
        )
        .orderBy("doc_id", "copy_id")
    )

"""Round-3 eighth tranche: Spark 4 surface coverage — recursive CTEs,
the VARIANT semi-structured type, and the streaming half of the Python
DataSource API.

Every entry follows the catalog contract: a PySpark program plus a
DuckDB oracle replaying identical semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import SQL_DSUM, register, _t
from .functions import dsum


# --------------------------------------------------------------------------
# Recursive CTE: tree traversal with per-level accounting
# --------------------------------------------------------------------------

_REC_SQL = """
WITH RECURSIVE d(custkey, depth) AS (
  SELECT c_custkey, 0 FROM {src} WHERE c_custkey = 1
  UNION ALL
  SELECT c.c_custkey, d.depth + 1
  FROM {src} c JOIN d ON c.c_custkey {intdiv} 2 = d.custkey
  WHERE c.c_custkey > 1
)
SELECT CAST(depth AS BIGINT) AS depth, CAST(count(*) AS BIGINT) AS n,
       min(custkey) AS min_key, max(custkey) AS max_key
FROM d GROUP BY depth ORDER BY depth
"""


@register(
    "sql_recursive_tree_depth",
    oracle=_REC_SQL.format(src="customer", intdiv="//"),
    tags=("recursive-cte", "sql", "hierarchy"),
)
def sql_recursive_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4's WITH RECURSIVE) walking the implicit
    binary-heap hierarchy over customer keys (parent(k) = k div 2):
    per-level node counts and key ranges, the org-chart / BOM traversal
    shape. Each recursion step is one equi-join of the full relation
    against the previous frontier — exactly how Catalyst executes the
    UnionLoop — and depth is bounded by log2(max key), so the plan is
    ~14 joins at sf1 scale, each frontier-sized. The oracle runs the
    IDENTICAL query under DuckDB's recursive-CTE engine (only the
    integer-division spelling differs), making this a cross-engine
    differential of the recursion semantics themselves."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    cust.createOrReplaceTempView("customer_tree_src")
    return spark.sql(_REC_SQL.format(src="customer_tree_src", intdiv="DIV"))


# --------------------------------------------------------------------------
# VARIANT semi-structured ingestion
# --------------------------------------------------------------------------

@register(
    "f_variant_props_shred",
    oracle="""
SELECT event_type,
       CAST(count(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS n_valid,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       min(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
""",
    tags=("variant", "semi-structured", "spark4"),
)
def f_variant_props_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed semi-structured ingestion (Spark 4): props parse
    once into the binary VARIANT encoding and typed paths shred out via
    variant_get — the open-table-format pattern for schema-flexible
    columns, replacing per-access JSON string re-parsing (the
    get_json_object path that `f_json_props` covers). Extraction,
    typing, and aggregation all stay JVM-side; the oracle replays the
    same shred with DuckDB's JSON extraction, so the differential pins
    that VARIANT's numeric typing agrees with text-JSON semantics."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("k").alias("n_valid"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Streaming Python DataSource (offset-tracked custom stream)
# --------------------------------------------------------------------------

@register(
    "pysource_stream_counts",
    oracle=f"""
WITH src AS (
  SELECT x AS doc_id,
         list_extract(['en', 'de', 'fr', 'es', 'zh'], CAST(x % 5 AS INTEGER) + 1) AS lang,
         (x % 97) / 97.0 AS score
  FROM (SELECT unnest(generate_series(0, 9999)) AS x)
)
SELECT lang, count(*) AS n_docs, {SQL_DSUM.format(x='score')} AS sum_score
FROM src GROUP BY lang ORDER BY lang
""",
    tags=("source", "pysource", "streaming"),
)
def pysource_stream_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING half of the custom Python DataSource
    (sources/pysource.py SyntheticDocsStreamReader): position offsets,
    2 micro-batches of 5000 rows each, and exact readBetweenOffsets
    replay — the contract a queue-backed feed implements for
    checkpoint recovery. The same aggregation as the batch-source
    entry runs over the stream in complete mode and must produce the
    identical result the DuckDB generate_series oracle computes:
    batching is invisible to the aggregate, which is the
    exactly-once-equivalence the offset protocol exists to provide.
    ``sf_dir`` is unused — the source is the fixture."""
    from .sources.pysource import register_synthetic_docs
    from .streaming.jobs import run_stream_to_memory

    register_synthetic_docs(spark)
    stream = (
        spark.readStream.format("synthetic_docs")
        .option("n", "10000")
        .option("batch", "5000")
        .load()
    )
    agg = stream.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), dsum(F.col("score")).alias("sum_score")
    )
    return run_stream_to_memory(agg, "complete", available_now=False).orderBy("lang")

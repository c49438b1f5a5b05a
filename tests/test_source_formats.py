"""Unit pins for the round-4 source-format entries (ORC round trip,
dirty-CSV coercion, nested-JSONL ingest) beyond their DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_orc_roundtrip_preserves_values(spark):
    from markt_database_analyzer_spark.catalog import REGISTRY

    got = {r["priority"]: (r["n"], r["revenue"]) for r in
           REGISTRY["source_orc_roundtrip"].fn(spark, SF_DIR).collect()}
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    direct = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {k: v[0] for k, v in got.items()} == direct


def test_csv_coercion_counts_exact(spark):
    from markt_database_analyzer_spark.catalog import REGISTRY

    row = REGISTRY["source_csv_coercion"].fn(spark, SF_DIR).collect()[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    bad = ev.filter(F.col("event_id") % 97 == 0).count()
    assert row["n_rows"] == n
    assert row["n_corrupt"] == bad
    assert row["avg_value"] is not None


def test_jsonl_nested_corrupt_capture(spark):
    from markt_database_analyzer_spark.catalog import REGISTRY

    row = REGISTRY["source_jsonl_nested"].fn(spark, SF_DIR).collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    bad = docs.filter(F.col("doc_id") % 101 == 0).count()
    good_chars = (
        docs.filter(F.col("doc_id") % 101 != 0)
        .agg(F.sum(F.length("text")).alias("c"))
        .collect()[0]["c"]
    )
    assert row["n_rows"] == n
    assert row["n_corrupt"] == bad
    assert row["total_chars"] == good_chars

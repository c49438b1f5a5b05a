"""Round-3 eighth-tranche pins: recursive-CTE levels on a crafted tree,
VARIANT null/missing-path semantics, and streaming-source offset replay
+ batch/stream equivalence."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

CUSTOMER_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
    " c_mktsegment string"
)
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)
_D0 = dt.datetime(2024, 1, 1)


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )
    return str(tmp_path)


def test_recursive_tree_levels_crafted(spark, tmp_path):
    rows = [(k, f"c{k}", 0, 0.0, "BUILDING") for k in range(1, 8)]
    sf = _write(spark, tmp_path, "customer", rows, CUSTOMER_SCHEMA)
    got = [
        (r.depth, r.n, r.min_key, r.max_key)
        for r in REGISTRY["sql_recursive_tree_depth"].fn(spark, sf).collect()
    ]
    # complete binary tree over keys 1..7: levels {1}, {2,3}, {4..7}
    assert got == [(0, 1, 1, 1), (1, 2, 2, 3), (2, 4, 4, 7)]


def test_variant_shred_missing_and_typed(spark, tmp_path):
    rows = [
        (1, _D0, 1, "a", 1.0, '{"k": 3}'),
        (2, _D0, 1, "a", 1.0, "{}"),  # path absent -> null
        (3, _D0, 1, "a", 1.0, '{"k": 7}'),
        (4, _D0, 1, "b", 1.0, '{"k": 10}'),
    ]
    sf = _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {r.event_type: (r.n_valid, r.sum_k, r.min_k, r.max_k)
           for r in REGISTRY["f_variant_props_shred"].fn(spark, sf).collect()}
    assert got["a"] == (2, 10, 3, 7)
    assert got["b"] == (1, 10, 10, 10)


def test_stream_reader_offset_replay_is_exact():
    from markt_database_analyzer_spark.sources.pysource import (
        SyntheticDocsStreamReader,
    )

    r = SyntheticDocsStreamReader({"n": "10", "batch": "4"})
    assert r.initialOffset() == {"pos": 0}
    b1, o1 = r.read({"pos": 0})
    b1 = list(b1)
    assert o1 == {"pos": 4} and len(b1) == 4
    # replay of the committed range regenerates identical rows
    assert list(r.readBetweenOffsets({"pos": 0}, {"pos": 4})) == b1
    # cursor saturates at n
    b3, o3 = r.read({"pos": 8})
    assert o3 == {"pos": 10} and len(list(b3)) == 2
    b4, o4 = r.read({"pos": 10})
    assert o4 == {"pos": 10} and list(b4) == []


def test_stream_aggregate_equals_batch_source(spark):
    stream_rows = {
        r.lang: (r.n_docs, r.sum_score)
        for r in REGISTRY["pysource_stream_counts"].fn(spark, "unused").collect()
    }
    batch_rows = {
        r.lang: (r.n_docs, r.sum_score)
        for r in REGISTRY["pysource_range_catalog"].fn(spark, "unused").collect()
    }
    assert stream_rows == batch_rows

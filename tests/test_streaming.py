"""Streaming variants differential-tested against their batch equivalents
on the same static events data (SURVEY.md §2.11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from markt_database_analyzer_spark.sources import read_table
from markt_database_analyzer_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    sliding_hourly_avg,
    stateful_per_key_deltas,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def test_tumbling_counts_match_batch(spark):
    stream = tumbling_counts(read_events_stream(spark, SF_DIR))
    got = {
        (r["window_start"], r["n_events"]) for r in run_stream_to_memory(stream).collect()
    }
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("s"), "n")
    )
    want = {(r["s"], r["n"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_sliding_avg_matches_batch(spark):
    stream = sliding_hourly_avg(read_events_stream(spark, SF_DIR))
    got = {r["window_start"]: (r["n_events"], r["avg_value"]) for r in run_stream_to_memory(stream).collect()}
    batch = (
        read_table(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "3 hours", "1 hour").alias("w"))
        .agg(F.avg("value").alias("a"), F.count(F.lit(1)).alias("n"))
    )
    want = {r["w"]["start"]: (r["n"], r["a"]) for r in batch.collect()}
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9


def test_stateful_deltas_match_batch_lag(spark):
    stream = stateful_per_key_deltas(read_events_stream(spark, SF_DIR))
    got = {
        r["event_id"]: (r["delta_value"], r["delta_minutes"])
        for r in run_stream_to_memory(stream, output_mode="append").collect()
    }
    from markt_database_analyzer_spark.operators import lag_deltas

    ev = read_table(spark, SF_DIR, "events").withColumn("us", F.unix_micros("ts"))
    batch = lag_deltas(
        ev,
        ["user_id"],
        [F.col("us"), F.col("event_id")],
        {"value": "value", "us": F.col("us").cast("double")},
    ).withColumn("delta_minutes", F.col("delta_us") / 60_000_000.0)
    want = {
        r["event_id"]: (r["delta_value"], r["delta_minutes"])
        for r in batch.select("event_id", "delta_value", "delta_minutes").collect()
    }
    assert set(got) == set(want) and len(got) > 0
    for k in got:
        assert abs(got[k][0] - want[k][0]) < 1e-9
        assert abs(got[k][1] - want[k][1]) < 1e-9

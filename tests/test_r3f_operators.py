"""Round-3 seventh-tranche semantics pins: foreachBatch merge equals
batch recompute under forced multi-batch execution, seasonal index
normalization, Markov row-stochasticity, readability formula values,
and session path extraction."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)
DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

_D0 = dt.datetime(2024, 1, 1)


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/{table}.parquet"
    )
    return str(tmp_path)


def test_foreachbatch_upsert_multi_batch_equals_batch(spark, tmp_path):
    from markt_database_analyzer_spark.functions import dsum
    from markt_database_analyzer_spark.sources import read_table
    from markt_database_analyzer_spark.streaming.jobs import run_foreachbatch_upsert

    sf = "/root/testdata/sf0.001"
    final = run_foreachbatch_upsert(
        spark, sf, str(tmp_path / "upsert"), n_source_files=4
    )
    got = {r.event_type: (r.n, r.total) for r in final.collect()}
    want = {
        r.event_type: (r.n, r.total)
        for r in read_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
        .collect()
    }
    assert got == want
    # the merge path genuinely ran more than once (4 files, 1 per trigger)
    import os

    versions = [d for d in os.listdir(tmp_path / "upsert") if d.startswith("state_v")]
    assert len(versions) >= 2


def test_seasonal_index_weighted_mean_is_one(spark):
    rows = REGISTRY["ts_seasonal_index_how"].fn(spark, "/root/testdata/sf0.001").collect()
    assert all(1 <= r.dow_iso <= 7 and 0 <= r.hr <= 23 for r in rows)
    # Σ n·avg over cells == Σ value == N·global, so Σ n·index ≈ N
    n_tot = sum(r.n for r in rows)
    weighted = sum(r.n * r.seasonal_index for r in rows)
    assert weighted == pytest.approx(n_tot, rel=1e-3)


def test_markov_rows_are_stochastic(spark, tmp_path):
    def ev(i, user, etype):
        return (i, _D0 + dt.timedelta(minutes=i), user, etype, 1.0, "{}")

    # user 1: A B A B A -> A->B x2, B->A x2
    rows = [ev(i, 1, t) for i, t in enumerate(["A", "B", "A", "B", "A"])]
    # user 2: A A -> A->A x1
    rows += [ev(10, 2, "A"), ev(11, 2, "A")]
    sf = _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {(r.src, r.dst): (r.n, r.p)
           for r in REGISTRY["events_markov_transitions"].fn(spark, sf).collect()}
    assert got[("A", "B")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert got[("A", "A")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert got[("B", "A")] == (2, 1.0)
    # row-stochastic
    from collections import defaultdict

    sums = defaultdict(float)
    for (src, _), (_, p) in got.items():
        sums[src] += p
    assert all(s == pytest.approx(1.0, abs=1e-5) for s in sums.values())


def test_readability_formula_known_doc(spark, tmp_path):
    # "the cat sat." -> words 3, vowel groups: e,a,a = 3, sentences 1
    sf = _write(
        spark, tmp_path, "documents", [(1, "the cat sat.", "en", "s", 12)], DOCS_SCHEMA
    )
    r = REGISTRY["text_readability"].fn(spark, sf).collect()[0]
    assert (r.words, r.syllables, r.sentences) == (3, 3, 1)
    assert r.flesch == pytest.approx(206.835 - 1.015 * 3 - 84.6 * 1.0, abs=1e-6)


def test_paths_sessionize_and_truncate(spark, tmp_path):
    def ev(i, minutes, user, etype):
        return (i, _D0 + dt.timedelta(minutes=minutes), user, etype, 1.0, "{}")

    rows = [
        # user 1, session 1: A B C D (within 30-min gaps) -> path A->B->C
        ev(1, 0, 1, "A"), ev(2, 10, 1, "B"), ev(3, 20, 1, "C"), ev(4, 29, 1, "D"),
        # user 1, session 2 after 2h gap: B -> path B
        ev(5, 180, 1, "B"),
        # user 2: A B -> path A->B
        ev(6, 0, 2, "A"), ev(7, 5, 2, "B"),
    ]
    sf = _write(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {r.path: r.n_sessions
           for r in REGISTRY["paths_top_sequences"].fn(spark, sf).collect()}
    assert got == {"A->B->C": 1, "B": 1, "A->B": 1}

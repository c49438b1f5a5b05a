"""Round-3 fourth-tranche semantics pins: BM25 ranking, inverted-index
postings, bloom-gate guarantees, interval-overlap losslessness on a
crafted series, standardization stats, and a hand-computed chi-square."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)
EMB_SCHEMA = "vec_id bigint, embedding array<float>, label int"


def _fixture_dir(spark, tmp_path, table: str, rows, schema: str) -> str:
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/{table}.parquet")
    return str(tmp_path)


def _doc(i, text):
    return (i, text, "en", "src0", len(text))


def test_bm25_ranks_by_tf_and_idf(spark, tmp_path):
    # 'spark' appears in d1 (x2) and d2 (x1); 'join'/'window' nowhere
    # else. d1 must outrank d2 (higher tf, same dl), and d3 (no query
    # terms) must be absent.
    sf = _fixture_dir(
        spark,
        tmp_path,
        "documents",
        [
            _doc(1, "spark spark pad pad"),
            _doc(2, "spark pad pad pad"),
            _doc(3, "pad pad pad pad"),
            _doc(4, "join window pad pad"),
        ],
        DOCS_SCHEMA,
    )
    rows = REGISTRY["search_bm25_topk"].fn(spark, sf).collect()
    got = [r.doc_id for r in rows]
    assert 3 not in got
    assert set(got) == {1, 2, 4}
    scores = {r.doc_id: r.score for r in rows}
    assert scores[1] > scores[2] > 0
    # two distinct rare terms beat one common term's double tf
    assert scores[4] > scores[1]
    # hand-check d2's score: one term, tf=1, df('spark')=2, N=4, dl=4, avgdl=4
    idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    tfn = (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * (4 / 4.0)))
    expect = round(round(idf * tfn, 6), 6)  # micro-unit grid via dsum
    assert scores[2] == pytest.approx(expect, abs=2e-6)


def test_inverted_postings_df_cf_and_sorted_head(spark, tmp_path):
    sf = _fixture_dir(
        spark,
        tmp_path,
        "documents",
        [_doc(2, "b c"), _doc(1, "a b a")],
        DOCS_SCHEMA,
    )
    rows = {r.token: r for r in REGISTRY["index_inverted_postings"].fn(spark, sf).collect()}
    assert rows["a"].df == 1 and rows["a"].cf == 2 and rows["a"].postings_head == "1"
    assert rows["b"].df == 2 and rows["b"].cf == 2 and rows["b"].postings_head == "1,2"
    assert rows["c"].df == 1 and rows["c"].cf == 1 and rows["c"].postings_head == "2"


def test_bloom_semijoin_no_false_negatives(spark):
    out = REGISTRY["filter_bloom_semijoin"].fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    # the one-sided guarantee: a member never misses the filter
    assert not any((not r.in_filter) and r.is_member for r in rows)
    members = sum(r.n for r in rows if r.is_member)
    caught = sum(r.n for r in rows if r.is_member and r.in_filter)
    assert members == caught > 0


def test_interval_overlap_crafted_pairs(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)  # Monday

    def ev(i, minutes, user, etype):
        return (i, t0 + dt.timedelta(minutes=minutes), user, etype, 1.0, "{}")

    # user 1 active Mon 10:00-11:00; user 2 active Tue 10:00-10:30.
    # type A spans Mon 10:30 - Tue 10:15 (same ISO week) -> overlaps both.
    # type B spans Mon 11:30 - 12:00 only -> overlaps neither... but B's
    # weekly span [11:30, 12:00] does not intersect user 1's [10:00,11:00].
    rows = [
        ev(1, 0, 1, "A"),
        ev(2, 60, 1, "A"),
        ev(3, 24 * 60, 2, "B"),
        ev(4, 24 * 60 + 30, 2, "B"),
        # type-A weekly span: first event Mon 10:30, last Tue 10:15
        ev(5, 30, 3, "A2"),
        ev(6, 24 * 60 + 15, 3, "A2"),
        # type-B2 weekly span Mon 11:30-12:00
        ev(7, 90, 4, "B2"),
        ev(8, 120, 4, "B2"),
    ]
    sf = _fixture_dir(spark, tmp_path, "events", rows, EVENTS_SCHEMA)
    got = {
        r.event_type: (r.n_pairs, r.total_overlap_hours)
        for r in REGISTRY["join_interval_overlap"].fn(spark, sf).collect()
    }
    # A2 [Mon10:30, Tue10:15] overlaps: u1-Mon [10:00,11:00] (30 min),
    # u2-Tue [10:00,10:30] (15 min), u3-Mon [10:30,10:30] (0), u3-Tue
    # [10:15,10:15] (0), u4-Mon [11:30,12:00] (30 min) -> 5 pairs
    assert got["A2"][0] == 5
    assert got["A2"][1] == pytest.approx(0.5 + 0.25 + 0.5, abs=1e-6)
    # B2 [Mon11:30,12:00] overlaps u4's own span (30 min) only
    assert got["B2"][0] == 1
    assert got["B2"][1] == pytest.approx(0.5, abs=1e-6)


def test_standardize_dims_known_values(spark, tmp_path):
    sf = _fixture_dir(
        spark,
        tmp_path,
        "embeddings",
        [(1, [1.0, 5.0], 0), (2, [3.0, 5.0], 1)],
        EMB_SCHEMA,
    )
    rows = {r.dim: r for r in REGISTRY["embeddings_standardize_dims"].fn(spark, sf).collect()}
    assert rows[1].mean == 2.0 and rows[1].std == 1.0
    assert rows[1].x_min == 1.0 and rows[1].x_max == 3.0
    assert rows[2].mean == 5.0 and rows[2].std == 0.0  # constant dim


def test_chi2_hand_computed_2x2(spark, tmp_path):
    rows = []
    i = 0
    for lang, src, n in [("en", "a", 30), ("en", "b", 10), ("de", "a", 10), ("de", "b", 30)]:
        for _ in range(n):
            rows.append((i, "t", lang, src, 1))
            i += 1
    sf = _fixture_dir(spark, tmp_path, "documents", rows, DOCS_SCHEMA)
    r = REGISTRY["stats_chi2_lang_source"].fn(spark, sf).collect()[0]
    # e=20 in every cell -> chi2 = 4 * (10^2/20) = 20
    assert r.chi2 == pytest.approx(20.0, abs=1e-6)
    assert r.dof == 1 and r.n == 80


def test_chi2_independent_is_zero(spark, tmp_path):
    rows = []
    i = 0
    for lang in ("en", "de"):
        for src in ("a", "b"):
            for _ in range(25):
                rows.append((i, "t", lang, src, 1))
                i += 1
    sf = _fixture_dir(spark, tmp_path, "documents", rows, DOCS_SCHEMA)
    r = REGISTRY["stats_chi2_lang_source"].fn(spark, sf).collect()[0]
    assert r.chi2 == pytest.approx(0.0, abs=1e-9)

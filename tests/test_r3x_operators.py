"""Unit pins for the round-3 twenty-fifth tranche: confusion-matrix
identities vs the NB predictions, streaks vs a pure-Python
gaps-and-islands, curriculum phase/order discipline."""

from __future__ import annotations

import collections
import datetime

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def test_confusion_matrix_identities(spark):
    rows = REGISTRY["eval_confusion_matrix"].fn(spark, SF).collect()
    preds = REGISTRY["classify_naive_bayes_langid"].fn(spark, SF).collect()
    n = len(preds)
    got = {r["cls"]: r for r in rows}
    # recompute tp/fp/fn per class
    for cls, r in got.items():
        tp = sum(1 for p in preds if p["actual"] == cls and p["predicted"] == cls)
        fp = sum(1 for p in preds if p["predicted"] == cls and p["actual"] != cls)
        fn = sum(1 for p in preds if p["actual"] == cls and p["predicted"] != cls)
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn), cls
        if tp + fp:
            assert abs(r["precision"] - tp / (tp + fp)) < 1e-9
        if tp + fn:
            assert abs(r["recall"] - tp / (tp + fn)) < 1e-9
        assert 0.0 <= r["f1"] <= 1.0
    # micro identities: Σtp = #correct, Σ(tp+fn) = n
    assert sum(r["tp"] for r in rows) == sum(1 for p in preds if p["correct"])
    assert sum(r["tp"] + r["fn"] for r in rows) == n


def test_dau_streaks_pure_python(spark):
    rows = REGISTRY["events_dau_streaks"].fn(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    days = collections.defaultdict(set)
    for e in ev:
        days[e["user_id"]].add(e["ts"].date())
    got = {r["user_id"]: r for r in rows}
    assert set(got) == set(days)
    for uid, ds in days.items():
        sd = sorted(ds)
        streaks = []
        cur = 1
        for a, b in zip(sd, sd[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        r = got[uid]
        assert r["n_active_days"] == len(ds)
        assert r["longest_streak"] == max(streaks)
        assert r["n_streaks"] == len(streaks)


def test_curriculum_order_discipline(spark):
    rows = REGISTRY["sample_curriculum_order"].fn(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(rows) == len(docs)
    by_phase = collections.defaultdict(list)
    for r in rows:
        by_phase[r["phase"]].append(r)
    assert set(by_phase) == {1, 2, 3}
    sizes = [len(v) for v in by_phase.values()]
    assert max(sizes) - min(sizes) <= 1  # ntile contract
    # phases are ordered by difficulty: max tokens of phase p <= min of p+1
    # (up to ties broken by doc_id at the boundary)
    for p in (1, 2):
        assert max(r["n_tokens"] for r in by_phase[p]) <= min(
            r["n_tokens"] for r in by_phase[p + 1]
        ) + 1
    for p, rs in by_phase.items():
        ranks = sorted(r["order_in_phase"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        # within-phase order is NOT the doc_id order (it was shuffled)
        ordered = [r["doc_id"] for r in sorted(rs, key=lambda r: r["order_in_phase"])]
        assert ordered != sorted(ordered)

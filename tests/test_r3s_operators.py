"""Unit pins for the round-3 twentieth tranche: logistic-regression GD
trajectory vs a pure-Python replay, KMV sketch guarantees, and
calibration-bin identities."""

from __future__ import annotations

import collections
import hashlib
import math

from pyspark.sql import functions as F

from markt_database_analyzer_spark.catalog import REGISTRY

SF = "/root/testdata/sf0.001"


def test_logreg_matches_pure_python_replay(spark):
    """Replay the full 8-step deterministic GD in pure Python (same 9 dp
    rounding grid, HALF_UP, micro-quantized sums) and compare the final
    weights bit-for-bit."""
    from decimal import ROUND_HALF_UP, Decimal

    def rup(x, dp=9):
        return float(Decimal(repr(x)).quantize(Decimal(f"1e-{dp}"), ROUND_HALF_UP))

    def micro_sum(vals):
        return sum(int(rup(v * 1e6, 0)) for v in vals) / 1e6

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    stopset = {"the", "a", "of", "and", "is"}
    feats = []
    for d in docs:
        ts = [t for t in d["text"].lower().strip().split() if t]
        nf = len(ts)
        feats.append(
            (
                1.0 if d["lang"] == "en" else 0.0,
                rup(sum(1 for t in ts if t in stopset) / nf),
                rup(sum(len(t) for t in ts) / nf),
                rup(len(set(ts)) / nf),
            )
        )
    n = len(feats)
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(8):
        ps = [
            rup(1.0 / (1.0 + math.exp(-rup(w[0] + w[1] * x1 + w[2] * x2 + w[3] * x3))))
            for _, x1, x2, x3 in feats
        ]
        gb = micro_sum([p - y for p, (y, *_) in zip(ps, feats)])
        g1 = micro_sum([(p - y) * x1 for p, (y, x1, _, _) in zip(ps, feats)])
        g2 = micro_sum([(p - y) * x2 for p, (y, _, x2, _) in zip(ps, feats)])
        g3 = micro_sum([(p - y) * x3 for p, (y, _, _, x3) in zip(ps, feats)])
        w = [
            rup(w[0] - gb / n),
            rup(w[1] - g1 / n),
            rup(w[2] - g2 / n),
            rup(w[3] - g3 / n),
        ]
    row = REGISTRY["ml_logreg_gd"].fn(spark, SF).collect()[0]
    assert (row["b"], row["w1"], row["w2"], row["w3"]) == tuple(w)
    assert 0 <= row["n_correct"] <= row["n_rows"] == n
    assert row["log_loss"] > 0


def test_kmv_sketch_guarantees(spark):
    rows = REGISTRY["sketch_kmv_intersection"].fn(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    users = collections.defaultdict(set)
    for e in ev:
        users[e["event_type"]].add(e["user_id"])
    types = sorted(users)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for r in rows:
        na, nb = len(users[r["type_a"]]), len(users[r["type_b"]])
        exact = len(users[r["type_a"]] & users[r["type_b"]])
        assert r["exact_inter"] == exact
        # KMV distinct estimates within the published ~1/sqrt(k) envelope
        # (k=64 -> sigma ~12.5%; allow 4 sigma)
        for est, true in ((r["est_a"], na), (r["est_b"], nb)):
            if true >= 64:
                assert abs(est - true) / true < 0.5, (est, true)
        # intersection estimate within a loose absolute envelope
        assert r["est_inter"] >= 0
        assert r["est_inter"] <= (min(na, nb) * 1.6 + 64)


def test_kmv_hash_is_md5_60bit(spark):
    """The sketch hash must be the portable md5-60bit convention."""
    h = (
        spark.createDataFrame([("42",)], "s string")
        .select(F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("bigint").alias("h"))
        .collect()[0]["h"]
    )
    assert h == int(hashlib.md5(b"42").hexdigest()[:15], 16)


def test_calibration_bins_identities(spark):
    rows = REGISTRY["eval_calibration_bins"].fn(spark, SF).collect()
    assert len(rows) == 10
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert sum(r["n"] for r in rows) == len(docs)
    # equal-count bins: sizes differ by at most 1 (ntile contract)
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # mean confidence is non-decreasing across bins (sorted by conf)
    confs = [r["mean_conf"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(confs, confs[1:]))
    # ECE equals the weighted gap sum, constant across rows
    n_tot = sum(sizes)
    ece = sum(int(round(r["n"] * r["gap"] * 1e6)) for r in rows) / 1e6 / n_tot
    assert all(abs(r["ece"] - ece) < 1e-9 for r in rows)
    assert 0.0 <= ece <= 1.0
    # positives are conserved
    pos = sum(1 for d in docs if d["lang"] == "en")
    got_pos = sum(r["frac_pos"] * r["n"] for r in rows)
    assert abs(got_pos - pos) < 1e-3

"""Round-2 curation layer: connected components, stratified sampling,
PII redaction, paragraph dedup — unit + differential pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from markt_database_analyzer_spark.datapipe import clustering as cl
from markt_database_analyzer_spark.datapipe import sampling as smp
from markt_database_analyzer_spark.datapipe import text as tx

SF_DIR = "/root/testdata/sf0.001"


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a: bigint, id_b: bigint")


def test_cc_clique_and_chain_and_singleton(spark):
    # clique {1,2,3}, chain 10-11-12-13 (diameter 3), isolated pair {20,21}
    pairs = _pairs(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)],
    )
    got = {r["id"]: r["cluster_id"] for r in cl.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_cc_label_flows_against_edge_direction(spark):
    # min id sits at the *dst* end; propagation must flow both ways
    pairs = _pairs(spark, [(5, 1), (9, 5)])
    got = {r["id"]: r["cluster_id"] for r in cl.connected_components(pairs).collect()}
    assert got == {1: 1, 5: 1, 9: 1}


def test_cc_nonconvergence_raises(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    with pytest.raises(RuntimeError, match="did not converge"):
        cl.connected_components(pairs, max_iter=1)


def test_resolve_includes_singletons_and_one_survivor(spark):
    docs = spark.range(0, 8).select(F.col("id").alias("doc_id"))
    pairs = _pairs(spark, [(2, 5), (5, 7)])
    out = cl.resolve_duplicate_clusters(docs, pairs).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 8
    assert by_id[2]["cluster_id"] == 2 and by_id[2]["keep"]
    assert by_id[5]["cluster_id"] == 2 and not by_id[5]["keep"]
    assert by_id[7]["cluster_id"] == 2 and by_id[7]["cluster_size"] == 3
    # untouched docs are singleton survivors
    assert by_id[0]["cluster_size"] == 1 and by_id[0]["keep"]
    # exactly one survivor per cluster
    survivors = [r for r in out if r["keep"]]
    assert len(survivors) == 6


def test_stratified_sample_is_subset_stable_and_independent(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    low = smp.stratified_sample(docs, "doc_id", "lang", {"en": 0.2}, seed=3)
    high = smp.stratified_sample(docs, "doc_id", "lang", {"en": 0.5}, seed=3)
    low_ids = {r["doc_id"] for r in low.collect()}
    high_ids = {r["doc_id"] for r in high.collect()}
    assert low_ids <= high_ids  # raising a stratum's rate only adds rows
    # bumping 'de' must not change the English kept-set
    mixed = smp.stratified_sample(docs, "doc_id", "lang", {"en": 0.2, "de": 1.0}, seed=3)
    assert {r["doc_id"] for r in mixed.collect() if r["lang"] == "en"} == low_ids


def test_stratified_rejects_bad_fraction(spark):
    docs = spark.range(1).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    with pytest.raises(ValueError, match="must be in"):
        smp.stratified_sample(docs, "doc_id", "lang", {"en": 1.5})


def test_pii_redaction_spark_matches_duckdb_on_adversarial_rows(spark):
    rows = [
        (1, "mail a.b-c_d%x@sub.domain.co soon"),
        (2, "ip 10.255.3.77 and phone 555-123-4567 twice 555 123 4567"),
        (3, "no pii here at all"),
        (4, "edge email@x.io. trailing dot and 1.2.3.4.5 five-part ip"),
        (5, "a@b.c too-short tld stays"),
    ]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    got = (
        df.select(
            "doc_id",
            *[c.alias(n) for n, c in tx.pii_counts("text").items()],
            tx.pii_redact("text").alias("red"),
        )
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    counts = tx.sql_pii_counts("text")
    cols = ", ".join(f"{sql} AS {name}" for name, sql in counts.items())
    want = con.execute(
        f"SELECT doc_id, {cols}, {tx.sql_pii_redact('text')} AS red FROM t ORDER BY doc_id"
    ).fetchall()
    for g, w in zip(got, want):
        assert tuple(g) == tuple(w), (g, w)
    # sanity on semantics, not just parity
    assert got[0]["n_email"] == 1 and "<EMAIL>" in got[0]["red"]
    assert got[1]["n_ipv4"] == 1 and got[1]["n_phone"] == 2
    assert got[2]["red"] == "no pii here at all"


def test_paragraph_dedup_drops_repeated_boilerplate(spark):
    boiler = " ".join(f"w{i}" for i in range(15))
    uniq_a = " ".join(f"a{i}" for i in range(15))
    uniq_b = " ".join(f"b{i}" for i in range(15))
    df = spark.createDataFrame(
        [(1, boiler + " " + uniq_a), (2, boiler + " " + uniq_b)],
        "doc_id: bigint, text: string",
    )
    from markt_database_analyzer_spark.catalog import REGISTRY

    # run the registered entry's logic on a temp view-shaped frame via the
    # module-level helpers: split/rank/rebuild
    import markt_database_analyzer_spark.catalog_curate as cc

    toks = tx.tokens("text")
    paras = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(toks) / F.lit(cc._PARA_TOKENS)).cast("int") - 1),
        lambda g: F.array_join(F.slice(toks, g * cc._PARA_TOKENS + 1, cc._PARA_TOKENS), " "),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("para").orderBy("doc_id", "pos")
    kept = (
        df.select("doc_id", F.posexplode(paras).alias("pos", "para"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    by_id = {r["doc_id"]: r["count"] for r in kept}
    assert by_id == {1: 2, 2: 1}  # doc 2 lost the boilerplate paragraph


def test_srp_bands_recall_vs_bruteforce(spark):
    """Every pair the banded SRP join returns must be a true >=min_cos pair
    (verify step guarantees it), and recall vs the exact pair set should be
    substantial for this 4x4-bit configuration."""
    from markt_database_analyzer_spark.datapipe import similarity as sim

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = sim.srp_neardup_pairs(emb, "vec_id", "embedding", dim=64, min_cos=0.35)
    got_pairs = {(r["id_a"], r["id_b"]) for r in got.collect()}

    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    v = emb.select(F.col("vec_id").alias("vid"), vec.alias("v"))
    exact = (
        v.alias("a")
        .join(v.alias("b"), F.col("a.vid") < F.col("b.vid"))
        .withColumn("cos", sim.cosine(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cos") >= 0.35)
        .select(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
    )
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert got_pairs <= exact_pairs  # no false positives after verify
    if exact_pairs:
        # Theory for 4 bands x 4 bits at cos=0.35: p_bit = 1 - acos(.35)/pi
        # = 0.614, band hit = p^4 = 0.142, any-band = 1-(1-0.142)^4 = 0.46.
        # Measured 0.43 on this corpus; pin well below the expectation to
        # catch structural regressions (e.g. a broken band join), not noise.
        recall = len(got_pairs) / len(exact_pairs)
        assert recall >= 0.3, f"SRP banding recall too low: {recall:.2f}"


def test_srp_matrix_is_deterministic_and_balanced():
    from markt_database_analyzer_spark.datapipe import similarity as sim

    m1 = sim.srp_matrix(64)
    m2 = sim.srp_matrix(64)
    assert m1 == m2
    assert all(v in (1.0, -1.0) for row in m1 for v in row)
    # md5-derived signs should be roughly balanced per projection
    for row in m1:
        pos = sum(1 for v in row if v > 0)
        assert 16 <= pos <= 48


def test_read_csv_explicit_schema_and_corrupt_rows(spark, tmp_path):
    from pyspark.sql import types as T

    from markt_database_analyzer_spark.sources import read_csv

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,score,when\n"
        "1,2.5,2024-01-02 03:04:05\n"
        "oops,not_a_number,nope\n"
        "2,4.0,2024-02-03 04:05:06\n"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("when", T.TimestampType()),
        ]
    )
    df = read_csv(spark, str(p), schema)
    rows = df.orderBy("doc_id").collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 2 and len(bad) == 1
    assert good[-1]["doc_id"] == 2 and good[-1]["score"] == 4.0
    assert good[-1]["when"].year == 2024
    assert "oops" in bad[0]["_corrupt_record"]


def test_streaming_curation_gate_matches_batch(spark):
    """The streaming entry's plan must be stateless append — run it on
    sf0.001 and cross-check against the batch expression of the same
    gates."""
    from markt_database_analyzer_spark.catalog import REGISTRY
    import markt_database_analyzer_spark.catalog_curate as cc
    from markt_database_analyzer_spark.datapipe import sampling as smp
    from markt_database_analyzer_spark.sources import read_table

    got = REGISTRY["streaming_curation_gate"].fn(spark, SF_DIR).collect()
    docs = read_table(spark, SF_DIR, "documents")
    want = (
        smp.stratified_sample(docs, "doc_id", "lang", cc._STRATA, seed=3)
        .select("doc_id", "lang", cc._inject_pii().alias("text"))
        .select(
            "doc_id",
            "lang",
            tx.pii_counts("text")["n_email"].alias("n_email"),
            F.md5(tx.pii_redact("text")).alias("redacted_md5"),
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_cc_empty_pairs_and_resolve_all_singletons(spark):
    empty = spark.createDataFrame([], "id_a: bigint, id_b: bigint")
    assert cl.connected_components(empty).count() == 0
    docs = spark.range(0, 5).select(F.col("id").alias("doc_id"))
    out = cl.resolve_duplicate_clusters(docs, empty).collect()
    assert len(out) == 5
    assert all(r["keep"] and r["cluster_size"] == 1 and r["cluster_id"] == r["doc_id"] for r in out)


# --------------------------------------------------------------------------
# SemDeDup + DSIR (round-2 additions)
# --------------------------------------------------------------------------


def test_semdedup_planted_duplicates(spark):
    """Two identical embeddings (cosine 1.0) must land in one cluster with
    one survivor; a far-away vector stays a kept singleton."""
    from markt_database_analyzer_spark.datapipe import clustering as cl
    from markt_database_analyzer_spark.datapipe import similarity as sim

    base = [1.0] + [0.0] * 63
    other = [0.0] * 63 + [1.0]
    rows = [(1, base), (2, base), (3, other)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assigned = sim.kmeans_cells(emb, k=2, iters=2)
    pairs = sim.embedding_neardup_pairs(
        assigned, min_cos=0.95, id_col="vec_id", vec_col="embedding", cell_col="cell"
    )
    verdicts = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in cl.resolve_duplicate_clusters(emb, pairs, id_col="vec_id").collect()
    }
    assert verdicts[1] == (1, True)
    assert verdicts[2] == (1, False)
    assert verdicts[3] == (3, True)


def test_dsir_prefers_target_like_docs(spark):
    """Candidates that share vocabulary with the target domain must score
    higher log-importance than candidates that don't."""
    from markt_database_analyzer_spark.datapipe import lm

    target = [(i, "tgt", "spark shuffle partition catalyst codegen") for i in range(10)]
    likes = [(100 + i, "raw", "spark shuffle partition tuning") for i in range(5)]
    unlikes = [(200 + i, "raw", "medieval falconry treatise chapter") for i in range(5)]
    df = spark.createDataFrame(
        target + likes + unlikes, "doc_id long, source string, text string"
    )
    out = {
        r["doc_id"]: r["log_w"]
        for r in lm.dsir_importance(
            df, target_pred=F.col("source") == "tgt", top_n=5
        ).collect()
    }
    assert set(out) == {100 + i for i in range(5)} | {200 + i for i in range(5)}
    assert min(out[100 + i] for i in range(5)) > max(out[200 + i] for i in range(5))


def test_dsir_sampled_count_and_determinism(spark):
    """Gumbel top-n selects exactly n candidates (no boundary ties with
    md5-derived noise) and is bit-stable across runs."""
    from markt_database_analyzer_spark.datapipe import lm

    rows = [(i, "t" if i % 3 == 0 else "r", f"word{i % 7} word{i % 5} filler text") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    run = lambda: {  # noqa: E731
        r["doc_id"]: (r["sampled"], r["gumbel_key"])
        for r in lm.dsir_importance(
            df, target_pred=F.col("source") == "t", top_n=7
        ).collect()
    }
    a, b = run(), run()
    assert a == b
    assert sum(1 for s, _ in a.values() if s) == 7


def test_temperature_mix_flattens_distribution(spark):
    """α=0.5 must strictly flatten source proportions: the biggest source's
    kept share sits below its raw share, the smallest's above; the binding
    source keeps everything (rate 1.0)."""
    from markt_database_analyzer_spark.datapipe import sampling as smp

    # s0: 1800 docs, s9: 200 docs
    rows = [(i, "s0" if i % 10 else "s9") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = {
        r["source"]: r["rate"]
        for r in smp.temperature_mix_rates(df, "source", alpha=0.5).collect()
    }
    assert rates["s9"] == 1.0            # smallest source is binding — keeps all
    assert rates["s0"] < 1.0             # big source downsampled
    kept = smp.temperature_mix(df, "doc_id", "source", alpha=0.5).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in kept}
    raw_share = 1800 / 2000
    kept_share = got["s0"] / (got["s0"] + got["s9"])
    assert kept_share < raw_share        # flattened toward the tail
    # α-weights: w ∝ sqrt(n); expected share = sqrt(1800)/(sqrt(1800)+sqrt(200))
    import math
    want = math.sqrt(1800) / (math.sqrt(1800) + math.sqrt(200))
    assert abs(kept_share - want) < 0.05

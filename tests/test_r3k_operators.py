"""BPE training pin: hand-traced merge trajectory on a tiny corpus,
including tie-breaking and the pairs-exhausted tail."""

from __future__ import annotations

from markt_database_analyzer_spark.catalog import REGISTRY

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_bpe_training_trajectory(spark, tmp_path):
    df = spark.createDataFrame([(1, "aaab aaab cd", "en", "s", 12)], DOCS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    rows = REGISTRY["text_bpe_train_merges"].fn(spark, str(tmp_path)).collect()
    got = [(r.step, r.merged_pair, r.new_token, r.support) for r in rows]
    # vocab: "a a a b" x2, "c d" x1
    # step1: "a a" support 4 -> "aa a b"
    # step2: tie ("aa a" 2 vs "a b" 2) -> pair-asc picks "a b" -> "aa ab"
    # step3: "aa ab" 2 -> "aaab"
    # step4: "c d" 1 -> "cd"; step5: no pairs left -> no row
    assert got == [
        (1, "a a", "aa", 4),
        (2, "a b", "ab", 2),
        (3, "aa ab", "aaab", 2),
        (4, "c d", "cd", 1),
    ]

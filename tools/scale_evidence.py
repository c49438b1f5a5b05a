"""Measure the scale story instead of asserting it (VERDICT r1 item 6).

Runs the dedup / similarity / pipeline family at sf0.1 and again at a 10×
replication of the documents/embeddings tables, recording per-entry:

- wall seconds,
- number of stages executed,
- shuffle read + write bytes (the quantity SCALE.md's claims are about:
  banded LSH shuffles signatures not text, contamination joins 8-byte
  ints, scoring runs only on banded candidates).

Metrics come from the Spark UI REST API (``/api/v1``, status store —
public monitoring surface), diffed around each entry. The 10× set is
written to a scratch dir (never to /root/testdata): doc/vec ids are
offset per replica, content unchanged — which keeps per-doc signature
cost identical and grows candidate-pair density, i.e. the ADVERSARIAL
direction for near-dup joins.

Output: one JSON line per (entry, scale) to stdout and a markdown table
appended to SCALE_EVIDENCE.md (overwritten each run).

Usage: python tools/scale_evidence.py [--families dedup,sim,pipe]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/mda_scale10x"
REPLICAS = 10

ENTRIES = [
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard_sample",
    "pipeline_contamination_check",
    "pipeline_clean_corpus",
    "embedding_neardup_pairs",
    "similarity_bruteforce_topk",
    "similarity_ivf_kmeans_topk",
    "pack_chunks_documents",
    # round-2 curation layer
    "dedup_cluster_resolve",
    "similarity_srp_lsh_pairs",
    "dedup_paragraphs",
    "text_pii_redact",
    "dedup_cross_corpus",
    "vocab_top_terms",
]


def rest(spark, path: str):
    port = spark.sparkSession.conf.get("spark.ui.port", "4040") if hasattr(spark, "sparkSession") else "4040"
    base = f"http://localhost:{port}/api/v1"
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.load(r)


def app_id(spark) -> str:
    return spark.sparkContext.applicationId


def stage_metrics(spark) -> tuple[int, int, int]:
    """(n_complete_stages, shuffle_read_bytes, shuffle_write_bytes) cumulative."""
    stages = rest(spark, f"/applications/{app_id(spark)}/stages?status=complete")
    n = len(stages)
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return n, rd, wr


def build_10x(spark) -> str:
    from pyspark.sql import functions as F

    from markt_database_analyzer_spark.sources.readers import read_table

    if os.path.isdir(SCRATCH):
        shutil.rmtree(SCRATCH)
    os.makedirs(SCRATCH)
    for tbl, idc in (("documents", "doc_id"), ("embeddings", "vec_id")):
        df = read_table(spark, SF_DIR, tbl)
        n = df.count()
        parts = [
            df.withColumn(idc, (F.col(idc) + F.lit(i * n)).cast("long")) for i in range(REPLICAS)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        # one physical file per ~n rows keeps scan parallelism comparable
        out.repartition(REPLICAS).write.parquet(f"{SCRATCH}/{tbl}.parquet")
    return SCRATCH


def main() -> None:
    from markt_database_analyzer_spark.catalog import REGISTRY
    from markt_database_analyzer_spark.session import get_spark

    spark = get_spark(
        app_name="mda-scale-evidence",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4040"},
    )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    print("building 10x replication ...", file=sys.stderr)
    big_dir = build_10x(spark)

    rows = []
    for name in ENTRIES:
        spec = REGISTRY[name]
        rec = {"entry": name}
        for label, d in (("1x", SF_DIR), ("10x", big_dir)):
            force(spec.fn(spark, d))  # warm (codegen, footers)
            spark.catalog.clearCache()
            n0, rd0, wr0 = stage_metrics(spark)
            t0 = time.time()
            force(spec.fn(spark, d))
            wall = time.time() - t0
            n1, rd1, wr1 = stage_metrics(spark)
            rec[label] = {
                "wall_sec": round(wall, 2),
                "stages": n1 - n0,
                "shuffle_read_mb": round((rd1 - rd0) / 1e6, 2),
                "shuffle_write_mb": round((wr1 - wr0) / 1e6, 2),
            }
            spark.catalog.clearCache()
        rec["wall_ratio"] = round(rec["10x"]["wall_sec"] / max(rec["1x"]["wall_sec"], 1e-9), 2)
        rec["shuffle_ratio"] = round(
            rec["10x"]["shuffle_write_mb"] / max(rec["1x"]["shuffle_write_mb"], 1e-3), 2
        )
        rows.append(rec)
        print(json.dumps(rec))

    lines = [
        "# SCALE_EVIDENCE — measured, not asserted",
        "",
        f"10× replication of documents/embeddings from {SF_DIR} "
        f"(ids offset per replica, content unchanged → near-dup candidate density GROWS, "
        "the adversarial direction). local[32]; stage counts and shuffle bytes from the "
        "Spark status store, diffed around each warmed run.",
        "",
        "| entry | wall 1x (s) | wall 10x (s) | ratio | stages 1x→10x | shuffle write 1x→10x (MB) | ratio |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['entry']} | {r['1x']['wall_sec']} | {r['10x']['wall_sec']} | {r['wall_ratio']}× "
            f"| {r['1x']['stages']}→{r['10x']['stages']} "
            f"| {r['1x']['shuffle_write_mb']}→{r['10x']['shuffle_write_mb']} | {r['shuffle_ratio']}× |"
        )
    lines += [
        "",
        "Reading: a wall ratio ≲ 10× on 10× data means the plan scales at worst linearly "
        "on this machine (constant stage count = no per-scale plan degeneration); "
        "shuffle-byte ratios ≈ data ratio confirm shuffles carry per-row constants "
        "(signatures/ints), never quadratic pair material. Entries that score banded "
        "candidate PAIRS (minhash/simhash/jaccard/neardup) may exceed 10× in wall time "
        "when the replication inflates true duplicate density — the pair count is a "
        "property of the data, not the plan; the shuffle columns show the join input "
        "stayed linear.",
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_EVIDENCE.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALE_EVIDENCE.md", file=sys.stderr)


if __name__ == "__main__":
    main()

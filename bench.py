"""Benchmark harness: runs the catalog's queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": <total headline seconds>, "unit": "sec",
     "queries": {...per-query seconds...}, "sf": 0.1}

Each query is forced with a noop datasource write — full plan execution,
no driver-side materialization cost in the measurement.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# FROZEN headline membership (r6 verdict item 7): the headline number is
# only comparable round-over-round if the set is stable — r6's apparent
# 20.1→24.3 s "regression" was pure membership growth (11→13 entries).
# Growing this set is a deliberate act: add the name HERE and set
# headline=True in the catalog, and note the membership change when
# comparing headline totals across rounds. The assert below makes any
# drift loud at bench time.
HEADLINE_SET = frozenset({
    "a_lifetime_rate_curve",
    "b1_events_per_slot",
    "b2_initial_rate_by_month",
    "c_gain_by_nation",
    "dedup_minhash_lsh",
    "similarity_bruteforce_topk",
    "pipeline_clean_corpus",
    "dedup_cluster_resolve",
    "tpch_q1_pricing_summary",
    "pipeline_curate_full",
    "pipeline_quality_curate",
    "similarity_srp_lsh_sized",
    "segment_rfm_customers_cuts",
})


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from markt_database_analyzer_spark.catalog import REGISTRY
    from markt_database_analyzer_spark.session import get_spark

    spark = get_spark(app_name="mda-bench", extra_conf={"spark.ui.enabled": "false"})

    actual_headline = {n for n, s in REGISTRY.items() if s.headline}
    assert actual_headline == HEADLINE_SET, (
        "headline membership drifted from the frozen set — update "
        f"HEADLINE_SET deliberately: {sorted(actual_headline ^ HEADLINE_SET)}"
    )

    # The handful of remaining un-partitioned Windows run over bounded
    # spine/model frames (<= a few hundred rows, documented per entry);
    # their per-query "No Partition Defined" warning floods the captured
    # stdout tail (BENCH_r03's tail was 100% WindowExec lines), hiding
    # real warnings. Silence that one logger for the bench session only.
    jvm = spark.sparkContext._jvm
    jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        jvm.org.apache.logging.log4j.Level.ERROR,
    )

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    force(REGISTRY["j1_revenue_by_priority"].fn(spark, sf_dir))
    # Warm the (reused) Python workers so the one mapInPandas query isn't
    # charged 32 interpreter spawns.
    import pandas as pd  # noqa: F401

    def _identity(it):
        yield from it

    force(
        spark.range(0, 32, 1, 32).mapInPandas(_identity, schema="id long")
    )

    # Box-speed calibration (VERDICT r10 item 4): round 10 proved the box
    # itself can shift ~1.5-2x between rounds (byte-identical code
    # re-timed 2x slower in fresh sessions), making cross-round absolute
    # totals meaningless. This fixed synthetic job — 200M rows of
    # codegen'd trig arithmetic over 64 splits, no I/O, no shuffle beyond
    # the final 1-row agg — is identical work every round, so
    # `value / calib_sec` is a box-normalized figure that survives a
    # box-speed shift. min of 3 passes, same discipline as the queries.
    calib_samples = []
    for _ in range(3):
        t0 = time.time()
        spark.range(0, 200_000_000, 1, 64).selectExpr(
            "sum(sin(id % 1000) * cos(id % 997)) AS s"
        ).collect()
        calib_samples.append(time.time() - t0)
    calib_sec = round(min(calib_samples), 3)

    # Machine-load context (VERDICT r8 item 6): the r8 idle round
    # measured ±13% headline / up to ±96% single-query drift on
    # byte-identical code, so cross-round comparisons need the noise
    # bound recorded in the artifact itself. getloadavg's 1-min figure
    # before the timed section (and after) flags a contended box.
    load_before = round(os.getloadavg()[0], 2)

    # n passes per query (default 3), report the min — steady-state
    # numbers, not first-run codegen/GC noise — so round-over-round
    # regression comparison is meaningful. The per-query MEDIAN is kept
    # alongside (BENCH_FULL.json): min-vs-median spread is a per-entry
    # noise bound a regression claim must clear.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def release_blocks() -> None:
        # Entries that pin shared subtrees (persist / eager localCheckpoint
        # — the graph/basket discipline) leave their blocks in the block
        # manager; over 385 entries x runs passes in ONE JVM the leak
        # accumulates into storage-memory pressure and late-run GC stalls
        # (r10 first pass: tpch_q1 min 3.0 s vs median 29.7 s). Unpersist
        # everything between entries so each measurement starts clean.
        # getPersistentRDDs is a private py4j surface absent under Spark
        # Connect; clearCache alone is the portable fallback (ADVICE r10).
        try:
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        except Exception:
            pass
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    headline_total = 0.0
    for name, spec in REGISTRY.items():
        samples = []
        for _ in range(runs):
            t0 = time.time()
            force(spec.fn(spark, sf_dir))
            samples.append(time.time() - t0)
            release_blocks()
        samples.sort()
        timings[name] = round(samples[0], 3)
        # true median: average the two middle samples for even n (the
        # upper-middle element alone biases the noise bound high)
        mid = len(samples) // 2
        med = samples[mid] if len(samples) % 2 else (samples[mid - 1] + samples[mid]) / 2
        medians[name] = round(med, 3)
        if spec.headline:
            headline_total += timings[name]
    load_after = round(os.getloadavg()[0], 2)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # The driver captures a bounded tail of stdout and parses the last
    # line as JSON; the full 114-query map overflows that buffer (r1/r2
    # both recorded "parsed": null). The ONE printed line therefore
    # carries only the headline queries; the complete per-query map goes
    # to BENCH_FULL.json next to this script for the judge/round diffs.
    headline = {n: timings[n] for n, s in REGISTRY.items() if s.headline}
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total_sec",
                "value": round(headline_total, 3),
                "unit": "sec",
                "queries": timings,
                "medians": medians,
                "runs": runs,
                "sf": sf,
                "n_queries": len(timings),
                "all_queries_total_sec": round(sum(timings.values()), 3),
                "all_queries_median_total_sec": round(sum(medians.values()), 3),
                "calib_sec": calib_sec,
                "load_before": load_before,
                "load_after": load_after,
            },
            f,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(headline_total, 3),
                "unit": "sec",
                "queries": headline,
                "runs": runs,
                "sf": sf,
                "n_queries": len(timings),
                # the headline SET grew in round 6 (11 -> 13: the two
                # scale-path forms joined it) — compare round-over-round
                # on the per-query map, not the total alone
                "n_headline": len(headline),
                "all_queries_total_sec": round(sum(timings.values()), 3),
                # noise context (r8: ±13% headline drift on identical
                # code): median totals + box load bound the comparison
                "headline_median_total_sec": round(
                    sum(medians[n] for n in headline), 3
                ),
                # fixed synthetic CPU job (min of 3): divide `value` by
                # this to compare rounds across box-speed shifts (r10)
                "calib_sec": calib_sec,
                "load_before": load_before,
                "load_after": load_after,
                "full": "BENCH_FULL.json",
            }
        )
    )


if __name__ == "__main__":
    main()

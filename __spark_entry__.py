"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship Analysis-C-analog query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
``markt_database_analyzer_spark.catalog`` (one entry per implemented
operator family from SURVEY.md §2, each with a DuckDB oracle unless the
operator is not SQL-expressible).
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from markt_database_analyzer_spark.catalog import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The Analysis-C-analog HAVING threshold scales with the data: sf0.001
    has only ~6 customers per nation, so the smoke run uses >= 5.
    """
    return REGISTRY["c_gain_by_nation"].fn(spark, "/root/testdata/sf0.001", min_customers=5)


# ---------------------------------------------------------------------------
# Driver-window rotation (SELF-SLIDING since round 9)
#
# The driver's per-round correctness run covers exactly the first 50
# entries of queries(), in dict order (verified every round: each
# CORRECTNESS_r0N.json keyset equals that round's _ordered_names()[:50]).
# Rounds 1-8 used hand-laid _DRIVER_HEAD lists; round 8 proved the
# failure mode — an idle round re-verified round 7's exact window while
# 17 queued entries stayed unverdicted (VERDICT r8 items 1-2). The head
# is now COMPUTED from the verdict record itself, so a zero-edit round
# still spends its window on the entries that need it most:
#
#   1. never-verdicted entries (no key in any CORRECTNESS_r*.json),
#      registration order — oldest catalog additions first;
#   2. entries whose LATEST verdict was red (mismatch or error),
#      oldest verdict round first — regressions re-check immediately;
#   3. green entries by staleness (oldest latest-verdict round first),
#      so standing greens re-confirm on a rolling basis;
#   4. _DRIVER_TAIL pinned last — long-standing greens that are the
#      most expensive to re-verify.
#
# The ≤1-window verification-debt invariant (never-verdicted ≤ 50, all
# inside the checked prefix) is pinned in tests/test_driver_contract.py.
# ---------------------------------------------------------------------------

_DRIVER_TAIL: list[str] = [
    # already green in r1/r2 and the most expensive to re-verify
    "pipeline_clean_corpus",
    "pipeline_contamination_check",
    "text_repetition",
    "c_gain_by_nation",
]


def _row_is_green(row: dict) -> bool:
    """A driver verdict row counts as green if the full value compare
    passed, or — for entries that deliberately publish no oracle — the
    weaker rows-only check produced a row count."""
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    # hash_match must be an explicit True: a partially-written row with
    # rows/schema recorded but no value-compare result is NOT a standing
    # green and must stay at re-check priority (ADVICE r9).
    return (
        row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") is True
    )


def _verdict_state(root: str | None = None) -> dict[str, tuple[int, bool]]:
    """name -> (latest round that verdicted it, that verdict was green),
    read from every CORRECTNESS_r*.json beside this file. Artifact keys
    no longer in REGISTRY (renamed/retired entries) are ignored."""
    if root is None:
        root = os.path.dirname(os.path.abspath(__file__))
    state: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            green = _row_is_green(row) if isinstance(row, dict) else False
            prev = state.get(name)
            if prev is None or rnd >= prev[0]:
                state[name] = (rnd, green)
    return state


def _ordered_names(verdicts: dict[str, tuple[int, bool]] | None = None) -> list[str]:
    """Deterministic driver-run ordering; ``verdicts`` is injectable for
    tests and defaults to the on-disk CORRECTNESS record."""
    if verdicts is None:
        verdicts = _verdict_state()
    # A typo in the pinned tail must fail LOUDLY: silently dropping an
    # unknown name would corrupt the rotation with no signal (ADVICE r5).
    missing = set(_DRIVER_TAIL) - set(REGISTRY)
    assert not missing, f"rotation names not in REGISTRY: {sorted(missing)}"
    assert len(set(_DRIVER_TAIL)) == len(_DRIVER_TAIL), "duplicate tail name"
    idx = {n: i for i, n in enumerate(REGISTRY)}
    tail = set(_DRIVER_TAIL)
    body = [n for n in REGISTRY if n not in tail]
    never = [n for n in body if n not in verdicts]
    red = sorted(
        (n for n in body if n in verdicts and not verdicts[n][1]),
        key=lambda n: (verdicts[n][0], idx[n]),
    )
    green = sorted(
        (n for n in body if n in verdicts and verdicts[n][1]),
        key=lambda n: (verdicts[n][0], idx[n]),
    )
    return never + red + green + list(_DRIVER_TAIL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query (omitted where the operator
    is not SQL-expressible; the driver then records a rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }

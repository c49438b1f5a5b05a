"""The driver contract is exercised with a session the ENGINE DID NOT
BUILD (the grading harness constructs its own SparkSession). This runs in
a subprocess so the session is genuinely config-free — a regression guard
for ensure_engine_conf (a vanilla Spark 4 session cannot read the
TIMESTAMP(NANOS) events table and may carry a non-UTC timezone)."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, ".")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("vanilla-driver-sim")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.session.timeZone", "America/New_York")  # hostile TZ
    .getOrCreate()
)
import __spark_entry__ as e

assert e.entry(spark).count() > 0, "entry() empty"
qs = e.queries()
# events (nanos timestamps + TZ-sensitive windows), documents, streaming
for name in ["b1_events_per_slot", "sessionize_events", "text_langid",
             "streaming_tumbling_counts", "asof_join_last_event"]:
    n = qs[name](spark, "/root/testdata/sf0.001").count()
    assert n > 0, f"{name} returned 0 rows"
print("DRIVER-CONTRACT-OK")
"""


def test_entry_points_work_on_foreign_session():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=".",
    )
    assert "DRIVER-CONTRACT-OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]

"""Shared datapipe plumbing.

``fan_out`` exists because of a local[N]/small-file reality with a real
100 TB counterpart: Spark parallelism for a parquet scan is bounded by
file *splits*, and a parquet file is splittable only at row-group
boundaries. A small dimension-sized table (or, at 100 TB, the tail of a
skewed file-size distribution) can therefore arrive as one task — and any
CPU-bound per-row work downstream (per-token hashing, shingling, cosine
folds) runs on one core while the rest of the cluster idles.

``fan_out(df)`` round-robin-repartitions to the session default
parallelism *before* such compute. The shuffle moves only the narrow
input (ids + text/embedding), costs milliseconds at dimension scale, and
is dwarfed by the compute it parallelizes. For inputs that already arrive
in >= defaultParallelism splits it is skipped by the caller passing
``min_partitions`` (we never coalesce — fan_out only ever widens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# The ``df.rdd.getNumPartitions()`` probe forces a full physical-planning
# pass (logical plan -> executed plan -> RDD DAG) on every call, which is
# pure driver overhead in hot catalog paths that fan_out the same scan
# shape repeatedly. The count is a function of the analyzed plan within a
# session (file listing is session-cached), so memoize it per
# (application id, schema, semantic plan hash). applicationId — not
# id(session) — keys the session, so a recycled Python object id can
# never serve another app's counts; the schema string widens the 32-bit
# semanticHash against collisions. Residual staleness (files appended to
# a path mid-session, conf changes) can at worst serve an outdated
# count, whose failure mode is one missed or one redundant widening —
# perf-only and bounded. Cleared wholesale past _NPART_CACHE_MAX.
_NPART_CACHE: dict[tuple[str, str, int], int] = {}
_NPART_CACHE_MAX = 1024


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Widen ``df`` to at least the session's default parallelism (or
    ``min_partitions``) ahead of CPU-bound per-row operators. No-op when
    the input is already at least that wide. The partition-count probe
    is memoized per (application, schema, semantic plan hash) — one
    physical planning pass per distinct plan shape, not per call."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    key = (sc.applicationId, df.schema.json(), df.semanticHash())
    n = _NPART_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        if len(_NPART_CACHE) >= _NPART_CACHE_MAX:
            _NPART_CACHE.clear()
        _NPART_CACHE[key] = n
    if n >= target:
        return df
    return df.repartition(target)

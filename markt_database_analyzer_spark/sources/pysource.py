"""Custom source via the Spark 4 Python DataSource API.

The reference's only source is a hard-coded SQLite file
(``analyse.py:8``); the engine's ingest edge additionally exposes the
public ``pyspark.sql.datasource`` extension point so a deployment can
plug arbitrary Python-readable feeds (an internal scrape API, a queue, a
proprietary format) straight into the DataFrame layer with real
partition planning — each ``InputPartition`` becomes one Spark task, so
a 1000-executor cluster pulls 1000 stripes concurrently.

The shipped implementation generates deterministic synthetic document
metadata (modular-arithmetic columns only — no float libm, no RNG), so
the differential oracle can replay it exactly with ``generate_series``
arithmetic in DuckDB. The *shape* — schema declaration, option parsing,
partition planning, per-partition iterators — is the production surface.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LANGS = ("en", "de", "fr", "es", "zh")


def _row(doc_id: int):
    # shared row recipe for the batch and streaming readers: computed
    # from doc_id alone (location-independent; exact binary64, no libm)
    return (doc_id, LANGS[doc_id % len(LANGS)], (doc_id % 97) / 97.0)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n", ...).load()``.

    Options: ``n`` rows (default 1000), ``partitions`` stripes (default 8).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, lang string, score double"

    def reader(self, schema) -> DataSourceReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):  # planning: one stripe per task
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        stripe = partition.value
        # round-robin stripes: the union over partitions is exactly
        # range(n), each row computed from doc_id alone (location-
        # independent, so any task placement yields identical data)
        for doc_id in range(stripe, self.n, self.n_parts):
            yield (
                doc_id,
                LANGS[doc_id % len(LANGS)],
                (doc_id % 97) / 97.0,  # exact in binary64 — no libm
            )


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the custom source (Spark 4
    ``SimpleDataSourceStreamReader``): offsets are row positions, each
    micro-batch advances the cursor by ``batch`` rows until ``n`` —
    the offset-tracking/replay contract a queue-backed feed implements.
    ``readBetweenOffsets`` regenerates any offset range exactly
    (deterministic rows), which is what makes checkpoint recovery and
    batch replay safe."""

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.batch = int(options.get("batch", 250))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        pos = int(start["pos"])
        end = min(pos + self.batch, self.n)
        return iter([_row(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start, end):
        return iter([_row(i) for i in range(int(start["pos"]), int(end["pos"]))])


def register_synthetic_docs(spark) -> None:
    """Idempotent registration of the custom format on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)

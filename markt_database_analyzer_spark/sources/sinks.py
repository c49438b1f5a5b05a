"""Sinks: partitioned parquet writes with small-file hygiene.

The reference's only sinks are stdout and matplotlib (SURVEY.md §2.1
S4/S5); an engine that feeds a 100 TB pipeline also needs the write path
done right:

- **Partition layout**: `partitionBy` date-ish columns so downstream
  scans partition-prune (SURVEY §4.4).
- **Small-file hygiene**: a naive `df.write.partitionBy(c)` writes one
  file per (task, partition-value) — task-count × cardinality files. We
  `repartition(partition_cols)` first so each output partition is written
  by exactly the tasks that own its rows; AQE coalescing then sizes the
  shuffle so files land near the target size.
- **Deterministic layout**: `maxRecordsPerFile` bounds the worst case;
  sorted-within-partition writes keep parquet min/max column stats tight
  for row-group pruning at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
    sort_within: list[str] | None = None,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_by`` with one
    shuffle to co-locate each output partition's rows (no small-file
    explosion). ``sort_within`` orders rows inside files so parquet
    min/max stats prune row groups on read."""
    out = df.repartition(*partition_by)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed, bucket-sorted table — the storage-side
    half of the 100 TB join strategy (SURVEY §4.4): two tables bucketed
    into the same ``num_buckets`` on the join key sort-merge-join with NO
    exchange on either side (each task reads matching bucket files
    directly), and bucket-pruning serves point lookups. Bucketed layout
    must go through the catalog (``saveAsTable``) — bucket file naming is
    table metadata; ``path`` makes it an external table so the data can
    live outside the warehouse dir. The co-located-join property is
    pinned in tests/test_plan_properties.py."""
    w = (
        df.repartition(num_buckets, *bucket_by)
        .write.mode(mode)
        .bucketBy(num_buckets, *bucket_by)
        .sortBy(*bucket_by)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)

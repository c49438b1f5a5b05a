"""Count-min sketch: fixed-size frequency estimation.

The CMS (Cormode & Muthukrishnan 2005) answers "how often did key k
occur?" with d*w counters regardless of key cardinality: d independent
hash rows of w buckets; update increments one bucket per row; the
estimate is the MIN over the d buckets, which never under-counts and
over-counts by <= eps*N (eps = e/w) with probability 1 - delta
(delta = e^-d).

Why it matters at 100 TB: the exact per-key count needs a shuffle keyed
by k (unbounded reducer state for heavy-hitter-rich streams); the sketch
needs a groupBy over at most d*w cells — partial aggregation collapses
every partition to <= d*w rows before the exchange, so shuffle volume is
CONSTANT in both row count and key cardinality. The same construction is
what `observe()`-style pipeline counters and streaming heavy-hitter
monitors use.

Hashing is the engine-portable md5-based :func:`hash60` family (one seed
per row) so an external SQL engine can replay the sketch bit-for-bit —
that is what makes the catalog entry value-oracled rather than
bound-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import hash60, sql_hash60


def cms_bucket(key: Column, row: int, width: int) -> Column:
    """Bucket index of ``key`` in sketch row ``row`` (seeded hash mod w)."""
    return (hash60(key, seed=row) % F.lit(width)).alias("b")


def sql_cms_bucket(expr: str, row: int, width: int) -> str:
    """DuckDB rendering of :func:`cms_bucket`."""
    return f"(({sql_hash60(expr, seed=row)}) % {width})"


def cms_cells(df: DataFrame, key: Column, depth: int, width: int) -> DataFrame:
    """Build the d×w counter table from a key column.

    One explode (d structs per row, map-side) then one groupBy whose
    post-partial-agg output is <= d*w rows per partition — the exchange
    moves O(d*w * n_partitions) rows total, independent of data volume.
    Returns columns (d, b, c).
    """
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("d"),
                        (hash60(key, seed=r) % F.lit(width)).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.b")
    return pairs.groupBy("d", "b").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    keys: DataFrame, key: Column, cells: DataFrame, depth: int, width: int
) -> DataFrame:
    """Point-query the sketch for each distinct key in ``keys``.

    ``cells`` is at most d*w rows — broadcast it; the per-key min over d
    probes is a tiny hash agg on the already-distinct key frame.
    Adds column ``est`` to ``keys``.
    """
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("d"),
                        (hash60(key, seed=r) % F.lit(width)).alias("b"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("s"),
    ).select("*", "s.d", "s.b").drop("s")
    joined = probes.join(F.broadcast(cells), ["d", "b"])
    group_cols = [c for c in keys.columns]
    return joined.groupBy(*group_cols).agg(F.min("c").alias("est"))

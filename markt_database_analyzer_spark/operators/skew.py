"""Skew mitigation: salted joins for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
*plan-level* tool for the cases AQE can't fix: a single join key so hot
that one hash bucket exceeds an executor (city/category power laws —
exactly the distributions the reference's data has), or aggregations
with non-combinable state.

``salted_join`` spreads each fact-side key over ``buckets`` sub-keys via
a deterministic salt (hash of a unique column — never ``rand()``, which
breaks retry/replay determinism), and replicates the dim side once per
bucket. The join result is identical to the unsalted join; the shuffle
partition for a hot key shrinks by ``buckets``×. Cost: dim side × buckets
rows shuffled — cheap when dim ≪ fact, which is the only regime where
salting is the right tool anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_from: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` ⨝ ``dim`` on ``on`` with fact-side salting.
    ``salt_from`` is a fact column (ideally unique) whose hash spreads the
    hot keys; result is row-identical to the plain join."""
    fact_s = fact.withColumn("_salt", F.pmod(F.hash(F.col(salt_from)), F.lit(buckets)))
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return fact_s.join(dim_s, [*on, "_salt"], how).drop("_salt")

"""Deterministic sampling, splits, and corpus mixing for training-data
pipelines.

`df.sample()` is seeded per-partition RNG: its output changes with
partitioning/retries and cannot be reproduced by another engine — useless
for dataset curation, where the sample IS the artifact. Everything here is
**hash-gated** instead: a row is kept iff
``hash(id) mod RESOLUTION < fraction · RESOLUTION`` with the engine-portable
md5-60bit family (``hashing.hash60``), so

- the decision is a pure row-local projection (no shuffle, no state, no
  RNG), reproducible on any cluster size, any partitioning, any engine —
  the DuckDB oracles replay it exactly;
- per-row membership is STABLE under fraction changes: raising the
  fraction only ever ADDS rows (the kept set at 10% is a subset of the
  kept set at 20%), which is what makes incremental corpus scaling and
  deterministic ablations possible;
- different ``seed`` values give independent gates (seed is folded into
  the hash input), so a train/eval split and a downsampling gate don't
  correlate.

At 100 TB each operator is a map-only filter fused into the scan —
sampling never costs a pass of its own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import hash60, sql_hash60

# 1e6 gives ppm resolution on fractions; small enough that
# fraction*RESOLUTION stays exact in int arithmetic.
RESOLUTION = 1_000_000


def _gate(id_col: str, seed: int, salt: str | None = None) -> Column:
    """The row's position in [0, RESOLUTION) — uniform, deterministic.
    ``salt`` (e.g. a corpus-source name) derives an independent gate family
    without burning a seed value."""
    c = F.col(id_col).cast("string")
    if salt is not None:
        c = F.concat(F.lit(f"{salt}~"), c)
    return F.pmod(hash60(c, seed=seed), F.lit(RESOLUTION))


def sql_gate(id_expr: str, seed: int, salt: str | None = None) -> str:
    """DuckDB rendering of :func:`_gate` (pmod of a non-negative hash is
    plain ``%``)."""
    expr = f"CAST({id_expr} AS VARCHAR)"
    if salt is not None:
        expr = f"('{salt}~' || {expr})"
    return f"({sql_hash60(expr, seed=seed)} % {RESOLUTION})"


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0, salt: str | None = None
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, gated on ``hash(id)``."""
    return df.filter(_gate(id_col, seed, salt=salt) < F.lit(int(fraction * RESOLUTION)))


def train_eval_split(
    df: DataFrame, id_col: str, eval_fraction: float = 0.01, seed: int = 1
) -> DataFrame:
    """Tag each row ``train``/``eval`` — the split every corpus needs
    before dedup (eval contamination is checked AGAINST the split, so the
    split must be reproducible everywhere)."""
    return df.withColumn(
        "split",
        F.when(
            _gate(id_col, seed) < F.lit(int(eval_fraction * RESOLUTION)), F.lit("eval")
        ).otherwise(F.lit("train")),
    )


def mix_corpora(
    sources: list[tuple[str, DataFrame, float]], id_col: str, seed: int = 2
) -> DataFrame:
    """Weighted training mix: for each ``(name, df, weight)`` keep a
    deterministic ``weight`` fraction (weight > 1 is an error — epoch-style
    upsampling is a repeat at the data-loader, not a row-duplication job)
    and union with a ``source`` provenance column. The union is by name,
    so sources only need the shared columns; each branch's gate is fused
    into its own scan.

    Each source's gate is salted with its name, so two sources sharing an
    id universe (the same corpus listed twice at different weights) draw
    INDEPENDENT samples rather than nested kept-sets."""
    if not sources:
        raise ValueError("mix_corpora needs at least one (name, df, weight) source")
    parts = []
    for name, df, weight in sources:
        if not 0.0 <= weight <= 1.0:
            raise ValueError(f"weight for {name!r} must be in [0, 1], got {weight}")
        parts.append(
            hash_sample(df, id_col, weight, seed=seed, salt=name).withColumn(
                "source", F.lit(name)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    seed: int = 3,
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. language rebalancing: keep 30%
    of English, all of German). The gate hashes ``stratum~id`` so each
    stratum draws an INDEPENDENT sample — rebalancing one language never
    perturbs another's kept-set. Strata missing from ``fractions`` get
    ``default``. Still a map-only filter fused into the scan."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1], got {v}")
    pos = F.pmod(
        hash60(F.concat(F.col(stratum_col), F.lit("~"), F.col(id_col).cast("string")), seed=seed),
        F.lit(RESOLUTION),
    )
    thresh = F.lit(int(default * RESOLUTION))
    for k, v in sorted(fractions.items()):
        thresh = F.when(F.col(stratum_col) == k, F.lit(int(v * RESOLUTION))).otherwise(thresh)
    return df.filter(pos < thresh)


def sql_stratified_gate(
    id_expr: str, stratum_expr: str, fractions: dict[str, float], seed: int = 3, default: float = 0.0
) -> str:
    """DuckDB rendering of the :func:`stratified_sample` predicate."""
    hashed = sql_hash60(f"({stratum_expr} || '~' || CAST({id_expr} AS VARCHAR))", seed=seed)
    branches = " ".join(
        f"WHEN {stratum_expr} = '{k}' THEN {int(v * RESOLUTION)}"
        for k, v in sorted(fractions.items(), reverse=True)
    )
    thresh = f"(CASE {branches} ELSE {int(default * RESOLUTION)} END)"
    return f"(({hashed} % {RESOLUTION}) < {thresh})"


# ---------------------------------------------------------------------------
# Concat-and-chunk sequence packing
# ---------------------------------------------------------------------------

def pack_chunks(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    shard_col: Column | None = None,
) -> DataFrame:
    """Assign each document its position in the GPT-style concat-and-chunk
    layout: documents are laid out in ``id_col`` order, the concatenated
    token stream is cut every ``budget`` tokens, and each document learns
    ``offset`` (its start in the stream), ``chunk_start``/``chunk_end``
    (the first/last training chunk it lands in; a document straddles a cut
    iff they differ). This is assignment, not materialization — the actual
    tensor packing happens in the data loader; what the engine owns is the
    deterministic layout every loader shard must agree on.

    One running-sum window is the whole computation. ``shard_col`` is the
    scale path: a global ordering is single-partition (fine up to ~10⁷
    docs), so a 100 TB corpus packs per shard — pass e.g.
    ``pmod(hash60(id), n_shards)`` and each shard's stream is laid out
    independently and in parallel."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col).orderBy(id_col)
        if shard_col is not None
        else Window.orderBy(id_col)
    )
    cum_prev = F.coalesce(
        F.sum(token_count_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    out = df.withColumn("offset", cum_prev)
    # chunk_end clamps at chunk_start for zero-token documents: the raw
    # floor((offset - 1)/budget) would land BEFORE the document's own start
    # (and Spark's floor(-1/b) = -1 vs integer-division truncation in other
    # engines), so an empty doc is defined to occupy its start chunk only —
    # keeping the "straddles a cut iff chunk_start != chunk_end" contract.
    return (
        out.withColumn("chunk_start", F.floor(F.col("offset") / budget))
        .withColumn(
            "chunk_end",
            F.greatest(
                F.col("chunk_start"),
                F.floor((F.col("offset") + F.col(token_count_col) - 1) / budget),
            ),
        )
    )


def temperature_mix_rates(
    df: DataFrame, source_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-source keep rates for temperature-based corpus rebalancing
    (the multilingual α-sampling rule: sample source s with probability
    ∝ n_s^α, flattening the head and lifting the tail as α → 0).

    The achievable total is scaled so the binding source keeps rate 1.0
    (downsampling only — upsampling is a repeat-file concern, not a
    gate). Rates round at 9 dp so the pow() lineage is engine-portable;
    thresholds are exact ints. The whole computation runs on the
    ≤|sources| count rows — a single map-side-combined agg plus
    constant-size window math."""
    w_all = Window.partitionBy(F.lit(1))
    return (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_source"))
        .withColumn("pw", F.pow(F.col("n_source").cast("double"), F.lit(alpha)))
        .withColumn("w", F.col("pw") / F.sum("pw").over(w_all))
        .withColumn("total", F.min(F.col("n_source") / F.col("w")).over(w_all))
        .withColumn(
            "rate",
            F.round(
                F.least(F.lit(1.0), (F.col("total") * F.col("w")) / F.col("n_source")), 9
            ),
        )
        .withColumn("thr", F.floor(F.col("rate") * RESOLUTION).cast("long"))
        .drop("pw", "w", "total")
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    alpha: float = 0.5,
    seed: int = 11,
) -> DataFrame:
    """Apply :func:`temperature_mix_rates` as a deterministic hash gate —
    map-only on the corpus side (the rate table broadcasts), subset-stable
    like every gate in this module."""
    rates = temperature_mix_rates(df, source_col, alpha=alpha)
    gate = F.pmod(
        hash60(
            F.concat(F.col(source_col), F.lit("~"), F.col(id_col).cast("string")),
            seed=seed,
        ),
        F.lit(RESOLUTION),
    )
    return df.join(F.broadcast(rates), source_col).filter(gate < F.col("thr"))


def sql_temperature_mix(
    source_expr: str = "source",
    id_expr: str = "doc_id",
    alpha: float = 0.5,
    seed: int = 11,
    table: str = "documents",
) -> str:
    """DuckDB rendering of :func:`temperature_mix` (rates + gate)."""
    gate = sql_hash60(f"({source_expr} || '~' || CAST({id_expr} AS VARCHAR))", seed=seed)
    return f"""
WITH counts AS (
  SELECT {source_expr} AS src, count(*) AS n_source FROM {table} GROUP BY 1
),
rates AS (
  SELECT src, n_source,
         round(least(1.0,
           (min(n_source / (pow(n_source, {alpha}) / sum_pw)) OVER ()
            * (pow(n_source, {alpha}) / sum_pw)) / n_source), 9) AS rate
  FROM (SELECT src, n_source, sum(pow(n_source, {alpha})) OVER () AS sum_pw FROM counts)
),
kept AS (
  SELECT d.*, r.rate
  FROM {table} d JOIN rates r ON d.{source_expr} = r.src
  WHERE ({gate} % {RESOLUTION}) < CAST(floor(r.rate * {RESOLUTION}) AS BIGINT)
)
SELECT {source_expr} AS source, count(*) AS n_kept, any_value(rate) AS rate,
       min({id_expr}) AS first_doc
FROM kept GROUP BY 1 ORDER BY source
"""

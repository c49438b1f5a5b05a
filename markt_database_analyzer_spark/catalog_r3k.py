"""Round-3 twelfth tranche: distributed BPE tokenizer training (the
iterative merge loop, not just one pair count).

Catalog contract as everywhere: the Spark program's 5-step merge
trajectory is replayed by the DuckDB oracle as unrolled CTEs — the
learned merge table must hash-match across engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t

_BPE_STEPS = 5

# Shared vocabulary bootstrap: corpus words -> (symbol-sequence string,
# corpus count). Symbols are space-separated characters; merges rewrite
# the sequence in place.
_SQL_VOCAB = """
  SELECT array_to_string(list_transform(range(1, len(w) + 1),
                                        i -> w[i]), ' ') AS seq,
         CAST(count(*) AS BIGINT) AS wc
  FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents
  )
  WHERE len(w) >= 2 GROUP BY 1"""


def _sql_pairs(src: str) -> str:
    return f"""
  SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt
  FROM (
    SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])) AS pair,
           wc
    FROM (SELECT string_split(seq, ' ') AS ts, wc FROM {src})
  ) GROUP BY pair"""


def _bpe_oracle() -> str:
    head = f"WITH v0 AS ({_SQL_VOCAB})"
    parts = []
    for i in range(_BPE_STEPS):
        parts.append(
            f""",
pc{i} AS ({_sql_pairs(f'v{i}')}),
best{i} AS (
  SELECT pair, cnt FROM pc{i} ORDER BY cnt DESC, pair LIMIT 1
),
v{i + 1} AS (
  SELECT trim(replace(' ' || seq || ' ',
                      ' ' || (SELECT pair FROM best{i}) || ' ',
                      ' ' || replace((SELECT pair FROM best{i}), ' ', '') || ' ')) AS seq,
         wc
  FROM v{i}
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT {i + 1} AS step, pair AS merged_pair,"
        f" replace(pair, ' ', '') AS new_token, cnt AS support FROM best{i}"
        for i in range(_BPE_STEPS)
    )
    return head + "".join(parts) + f"\nSELECT CAST(step AS BIGINT) AS step, merged_pair, new_token, support FROM ({union}) ORDER BY step"


@register(
    "text_bpe_train_merges",
    oracle=_bpe_oracle(),
    tags=("text", "bpe", "tokenizer", "iterative"),
)
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer TRAINING (Sennrich 2016), 5 merge
    iterations: bootstrap the vocabulary as (symbol-sequence, corpus
    count) — vocabulary-sized, the corpus is never touched again — then
    per step: count adjacent symbol pairs (weighted by word count),
    pick the argmax pair (cnt desc, pair asc — a total order, so the
    trajectory is deterministic), and rewrite every vocabulary entry
    with the merged symbol (space-anchored literal replace; identical
    left-to-right non-overlapping semantics in the JVM and DuckDB).
    Each iteration is one explode + one hash agg + one 1-row broadcast
    + one map-only rewrite over the vocabulary frame, persisted between
    steps — the loop cost is independent of corpus size after the
    bootstrap, which is exactly why BPE training scales as a
    vocabulary-frame recursion. Returns the learned merge table; the
    oracle replays all 5 steps as unrolled CTEs."""
    words = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = words.select(
        F.array_join(F.split(F.col("w"), ""), " ").alias("seq"), "wc"
    ).persist()
    merges = []
    for step in range(_BPE_STEPS):
        pairs = (
            vocab.select(F.split("seq", " ").alias("ts"), "wc")
            # fully-merged entries (one symbol) have no pairs; Spark's
            # sequence(1, 0) would run DESCENDING, so gate explicitly
            # (DuckDB's range(1, 1) is empty and needs no guard)
            .filter(F.size("ts") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ts) - 1),"
                        " i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
                    )
                ).alias("pair"),
                "wc",
            )
            .groupBy("pair")
            .agg(F.sum("wc").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "pair").limit(1)
        merges.append(
            best.select(
                F.lit(step + 1).cast("bigint").alias("step"),
                F.col("pair").alias("merged_pair"),
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("new_token"),
                F.col("cnt").alias("support"),
            )
        )
        nxt = (
            vocab.crossJoin(F.broadcast(best.select("pair")))
            .select(
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                        F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                        F.concat(
                            F.lit(" "),
                            F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                            F.lit(" "),
                        ),
                    )
                ).alias("seq"),
                "wc",
            )
            .persist()
        )
        vocab = nxt
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("step")


# --------------------------------------------------------------------------
# Distribution-position window functions (percent_rank / cume_dist)
# --------------------------------------------------------------------------

@register(
    "rank_distribution_window",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(percent_rank() OVER w, 9) AS pct_rank,
       round(cume_dist() OVER w, 9) AS cume,
       CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS group_n
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
ORDER BY o_custkey, pct_rank, o_orderkey
""",
    tags=("window", "ranking", "distribution"),
)
def rank_distribution_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank and cume_dist — the distribution-position pair that
    completes the ranking-function suite (rank_lead_ntile covers
    rank/dense_rank/lead/lag/ntile): relative standing of each order
    inside its customer's spend distribution, plus the unordered
    count(*) OVER partition frame. The ordering carries the orderkey
    tiebreak so both rational positions ((rank-1)/(n-1), peers/n) are
    computed over an identical total order and round-9 identically."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wp = Window.partitionBy("o_custkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 9).alias("cume"),
            F.count(F.lit(1)).over(wp).cast("bigint").alias("group_n"),
        )
        .orderBy("o_custkey", "pct_rank", "o_orderkey")
    )

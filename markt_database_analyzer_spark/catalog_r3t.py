"""Round-3 twenty-first tranche: multi-source BFS shortest-path distances
over the co-purchase graph — the remaining classic graph primitive next
to PageRank (centrality), connected components (clustering), triangle
counting (density), and link prediction (similarity).

Catalog contract as everywhere: a PySpark program plus a DuckDB oracle
replaying identical semantics (here: the same fixed number of relaxation
rounds, unrolled as CTEs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register, _t

_BFS_SEEDS = 5       # sources: p_partkey <= 5
_BFS_ROUNDS = 6      # relaxation rounds == max reported distance


def _sql_bfs() -> str:
    rounds = []
    for r in range(1, _BFS_ROUNDS + 1):
        rounds.append(f"""
d{r} AS MATERIALIZED (
  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
    SELECT node, dist FROM d{r-1}
    UNION ALL
    SELECT e.dst AS node, d.dist + 1 AS dist
    FROM d{r-1} d JOIN edges e ON e.src = d.node
  ) GROUP BY node
)""")
    return f"""
WITH pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
edges AS MATERIALIZED (
  SELECT src, dst FROM pairs UNION ALL SELECT dst AS src, src AS dst FROM pairs
),
nodes AS (SELECT DISTINCT l_partkey AS node FROM lineitem),
d0 AS (
  SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes WHERE node <= {_BFS_SEEDS}
),
{",".join(rounds)}
, hist AS (
  SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes
  FROM d{_BFS_ROUNDS} GROUP BY dist
),
unreached AS (
  SELECT CAST(-1 AS BIGINT) AS dist,
         (SELECT CAST(count(*) AS BIGINT) FROM nodes)
           - (SELECT CAST(COALESCE(sum(n_nodes), 0) AS BIGINT) FROM hist) AS n_nodes
)
SELECT * FROM hist UNION ALL SELECT * FROM unreached ORDER BY dist
"""


@register(
    "graph_bfs_distance",
    oracle=_sql_bfs(),
    tags=("graph", "iterative", "bfs"),
)
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the part co-purchase graph: distance from
    the seed set (p_partkey <= {_BFS_SEEDS}) by {_BFS_ROUNDS} relaxation
    rounds — each round is frontier ⋈ edges followed by a min-dist merge,
    the Pregel step expressed as join + groupBy. The distance frame is
    localCheckpoint-ed per round (clustering.py discipline: round r is
    one shuffle, never a replay of rounds 1..r-1); edges materialize
    once. Distances beyond the round budget report as unreached (-1) —
    the bounded-diameter contract, replayed identically by the oracle's
    unrolled CTE chain. Output: nodes per distance (+ the -1 row)."""
    li = _t(spark, sf_dir, "lineitem")
    b = li.select("l_orderkey", "l_partkey")
    a = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("pa"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("l_partkey"))
        .select(F.col("pa").alias("src"), F.col("l_partkey").alias("dst"))
        .distinct()
    )
    edges = (
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    nodes = li.select(F.col("l_partkey").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    dist = (
        nodes.filter(F.col("node") <= _BFS_SEEDS)
        .select("node", F.lit(0).cast("bigint").alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(_BFS_ROUNDS):
        relaxed = (
            dist.join(edges, dist["node"] == edges["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    hist = dist.groupBy("dist").agg(F.count(F.lit(1)).alias("n_nodes"))
    total = nodes.agg(F.count(F.lit(1)).alias("total"))
    reached = hist.agg(F.coalesce(F.sum("n_nodes"), F.lit(0)).alias("inc"))
    unreached = total.crossJoin(F.broadcast(reached)).select(
        F.lit(-1).cast("bigint").alias("dist"),
        (F.col("total") - F.col("inc")).alias("n_nodes"),
    )
    return hist.unionByName(unreached).orderBy("dist")

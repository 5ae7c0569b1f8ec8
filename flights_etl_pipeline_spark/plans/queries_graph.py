"""Graph queries: iterative PageRank over the customer<->supplier
co-purchase graph (plus dedup_clusters' connected components lives in
queries_dedup).

The reference has no graph surface; this is the north-star iterative-
algorithm demonstration: a driver-side loop of DataFrame joins where only
a convergence/round counter crosses to the driver, never data.

Determinism of an iterative float algorithm across engines is the hard
part: each node's incoming contributions are quantized (dround, an
engine-identical floor sequence) to 12 decimal places and summed as exact
DECIMAL(28,12) -- associative, so any partitioning, any engine, any join
order yields bit-identical ranks per round, and therefore after every
round. The DuckDB oracle unrolls the same fixed iteration count as plain
CTE stages (recursive CTEs disallow the per-step aggregate), computing
the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.functions.scalar import dround
from flights_etl_pipeline_spark.plans.registry import load, register
from flights_etl_pipeline_spark.plans.sqlfrag import sql_dround

N_ITER = 10
DAMPING = 0.85
_SUPP_OFFSET = 1_000_000  # supplier node ids live above customer ids

# Bipartite co-purchase edges, symmetric: customer c bought from supplier s
# (via orders join lineitem), so c->s and s->c both exist. Every node has
# out-degree >= 1 by construction (no dangling-node term needed).
_EDGES_SQL = f"""
  SELECT DISTINCT o.o_custkey AS src,
                  l.l_suppkey + {_SUPP_OFFSET} AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
"""

_GRAPH_SQL = f"""
edges0 AS ({_EDGES_SQL}),
edges AS (
  SELECT src, dst FROM edges0
  UNION ALL
  SELECT dst AS src, src AS dst FROM edges0
),
deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS rank FROM deg)
"""


def _step_sql(i: int) -> str:
    """One unrolled PageRank round: r{i} from r{i - 1}."""
    contrib = sql_dround(f"r.rank / d.outdeg", 12)
    return f"""
r{i} AS (
  SELECT e.dst AS node,
         {1 - DAMPING} + {DAMPING} * CAST(SUM(
           CAST({contrib} AS DECIMAL(28,12))) AS DOUBLE) AS rank
  FROM edges e
  JOIN r{i - 1} r ON r.node = e.src
  JOIN deg d ON d.node = e.src
  GROUP BY e.dst
)"""


PAGERANK_SQL = (
    "WITH "
    + _GRAPH_SQL
    + ","
    + ",".join(_step_sql(i) for i in range(1, N_ITER + 1))
    + f"""
SELECT r.node,
       CASE WHEN r.node >= {_SUPP_OFFSET} THEN 'supplier'
            ELSE 'customer' END AS node_type,
       {sql_dround("r.rank", 8)} AS pagerank,
       d.outdeg
FROM r{N_ITER} r JOIN deg d ON d.node = r.node
"""
)


@register(
    "copurchase_pagerank",
    oracle=PAGERANK_SQL,
    survey=["pagerank", "graph", "iterative", "J1-family"],
)
def copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 fixed rounds, damping 0.85) over the symmetric
    customer<->supplier co-purchase graph: which customers and suppliers
    sit at the center of the purchasing network.

    Scale shape: the edge list and degrees are computed once and
    persisted; each round is one equi-join of the rank table against the
    edges plus a map-side-combinable decimal-sum aggregate -- the
    standard distributed PageRank, O(|E|) per round with no driver-side
    data movement. ``localCheckpoint`` after each round truncates the
    lineage so the physical plan stays round-sized instead of growing
    10 joins deep. Quantized-decimal contributions make every round's
    ranks bit-identical across engines and partitionings (module
    docstring)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    e0 = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).persist()
    ranks = deg.select("node", F.lit(1.0).alias("rank")).localCheckpoint()
    # edges pre-joined with source degrees once; reused every round
    ed = (
        edges.join(deg, edges["src"] == deg["node"])
        .select("src", "dst", "outdeg")
        .persist()
    )
    for _ in range(N_ITER):
        contrib = dround(F.col("rank") / F.col("outdeg"), 12)
        ranks = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(1 - DAMPING)
                    + F.lit(DAMPING)
                    * F.sum(contrib.cast("decimal(28,12)")).cast("double")
                ).alias("rank")
            )
            .localCheckpoint()
        )
    out = (
        ranks.join(deg.select(F.col("node").alias("dn"), "outdeg"),
                   F.col("node") == F.col("dn"))
        .select(
            "node",
            F.when(F.col("node") >= _SUPP_OFFSET, "supplier")
            .otherwise("customer")
            .alias("node_type"),
            dround(F.col("rank"), 8).alias("pagerank"),
            "outdeg",
        )
    )
    # Materialize the node-sized result eagerly so every intermediate
    # cache (including deg, still referenced by the final join) can be
    # released here instead of leaking across repeated invocations.
    out = out.localCheckpoint()
    edges.unpersist()
    ed.unpersist()
    deg.unpersist()
    return out

"""Graph propagation on DataFrames ([NORTH-STAR]: iterative algorithms
expressed as unrolled relational plans, the batch sibling of the
label-propagation connected components in queries/dedup.py).

``supplier_pagerank`` runs two unrolled PageRank iterations over the
buyer<->supplier transaction graph (orders ⋈ lineitem). Each iteration is
the canonical relational PageRank step: join ranks to the edge list on
source, send rank/out-degree along every edge, hash-aggregate by
destination. Both shuffles are keyed on node ids — uniformly distributed,
no driver-side state, no collect — so the same plan runs on a
1000-executor cluster; deeper iteration just appends more of the same
stages (or loops with per-round materialization like dedup.py's
components, which documents the lineage-growth trade).

Cross-engine determinism: rank mass flows through the exact-decimal sum
contract (functions/exact.py), so per-destination accumulation is
order-independent and each iteration's output — and therefore the whole
unrolled pipeline — is bit-identical in Spark and DuckDB. Ranks are kept
in "mass" form (node share x N, uniform init 1.0) so the scale-4
quantization of that contract retains full signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.functions.exact import exact_sum, oracle_sum
from uk_procurement_data_pipeline_spark.queries.base import register

_DAMP = 0.85


@register(
    name="supplier_pagerank",
    survey="J6 A7 F1 U1",
    eager=True,  # fn materializes the edge table; time it honestly
    doc="Two unrolled PageRank iterations over the undirected buyer<->"
    "supplier graph (distinct customer-supplier pairs from orders ⋈ "
    "lineitem, both directions). Join-on-source + exact-sum-by-"
    "destination per iteration; returns the supplier nodes with final "
    "mass. Exact decimal accumulation makes the iteration "
    "deterministic across engines.",
    oracle=f"""
        WITH pairs AS (
          SELECT DISTINCT 'c' || o_custkey AS cnode, 's' || l_suppkey AS snode
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ), edges AS (
          SELECT cnode AS src, snode AS dst FROM pairs
          UNION ALL
          SELECT snode AS src, cnode AS dst FROM pairs
        ), outdeg AS (
          SELECT src, count(*) AS deg FROM edges GROUP BY src
        ), r1 AS (
          SELECT e.dst AS node,
                 0.15 + {_DAMP} * {oracle_sum("1.0 / CAST(o.deg AS DOUBLE)")}
                     AS mass
          FROM edges e JOIN outdeg o ON e.src = o.src
          GROUP BY e.dst
        ), r2 AS (
          SELECT e.dst AS node,
                 0.15 + {_DAMP}
                     * {oracle_sum("r.mass / CAST(o.deg AS DOUBLE)")} AS mass
          FROM edges e
          JOIN outdeg o ON e.src = o.src
          JOIN r1 r ON e.src = r.node
          GROUP BY e.dst
        )
        SELECT node, mass FROM r2 WHERE node LIKE 's%'
    """,
)
def supplier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # The expensive prefix (orders ⋈ lineitem + distinct) is materialized
    # once; every downstream consumer — degree count, both iterations —
    # reads the small distinct pair set (same lineage-reuse lesson as
    # dedup.py's shingle table; without this each iteration re-runs the
    # whole prefix, and each added iteration re-runs it again).
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("cnode"),
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("snode"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Both directions in ONE pass over pairs (inline-explode, no self-union
    # double scan).
    edges = pairs.selectExpr(
        "inline(array(struct(cnode AS src, snode AS dst),"
        " struct(snode AS src, cnode AS dst)))"
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edges is shuffled on src for BOTH the degree count and the join below;
    # AQE reuses that exchange, so the double consume costs one shuffle.
    ed = edges.join(outdeg, "src")

    # Iteration 1 from uniform mass 1.0: contribution is 1/deg.
    r1 = (
        ed.groupBy("dst")
        .agg(exact_sum(F.lit(1.0) / F.col("deg").cast("double"), "s"))
        .select(
            F.col("dst").alias("node"),
            (F.lit(0.15) + F.lit(_DAMP) * F.col("s")).alias("mass"),
        )
    )
    # Iteration 2: contribution is mass1/deg.
    r2 = (
        ed.join(r1, ed.src == r1.node)
        .groupBy("dst")
        .agg(exact_sum(F.col("mass") / F.col("deg").cast("double"), "s"))
        .select(
            F.col("dst").alias("node"),
            (F.lit(0.15) + F.lit(_DAMP) * F.col("s")).alias("mass"),
        )
    )
    return r2.where(F.col("node").startswith("s")).select("node", "mass")

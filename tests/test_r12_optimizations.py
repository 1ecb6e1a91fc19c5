"""Focused pins for the r12 optimization-round internal rewrites.

Each r12 batch-2 rewrite changed HOW an operator computes (never what):
these tests pin the internal equivalences the oracle can only see
end-to-end — the rebuilt co-supply edge set, the integer node-key
mapping, and the quantized power-iteration invariants.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.conftest import SF_DIR  # noqa: E402
from uk_procurement_data_pipeline_spark.catalog import load  # noqa: E402


def test_rcte_edge_build_equivalence(spark):
    """recursive_cte_reachability r12 rewrite: the per-part collect_set +
    canonical-explode + inline edge build must produce EXACTLY the edge
    set of the old distinct-postings self-join it replaced."""
    li = load(spark, SF_DIR, "lineitem").select("l_partkey", "l_suppkey")
    old_post = li.distinct()
    old_edges = (
        old_post.alias("a")
        .join(
            old_post.alias("b"),
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .distinct()
    )
    new_edges = (
        li.groupBy("l_partkey")
        .agg(F.collect_set("l_suppkey").alias("ss"))
        .select(F.explode("ss").alias("s1"), "ss")
        .select("s1", F.explode("ss").alias("s2"))
        .where(F.col("s1") < F.col("s2"))
        .distinct()
        .selectExpr(
            "inline(array(struct(s1 AS src, s2 AS dst),"
            " struct(s2 AS src, s1 AS dst)))"
        )
    )
    assert old_edges.exceptAll(new_edges).count() == 0
    assert new_edges.exceptAll(old_edges).count() == 0


def test_pagerank_int_node_mapping_is_bijective(spark):
    """supplier_pagerank r12 rewrite: the 2k / 2k+1 integer node keys must
    be a bijection of the old 'c%d'/'s%d' string nodes — same distinct
    pair set either way."""
    orders = load(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    joined = orders.join(li, orders.o_orderkey == li.l_orderkey)
    old_pairs = joined.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("c"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("s"),
    ).distinct()
    new_pairs_mapped = (
        joined.select(
            (F.col("o_custkey") * 2).alias("cn"),
            (F.col("l_suppkey") * 2 + 1).alias("sn"),
        )
        .distinct()
        .select(
            F.concat(F.lit("c"), (F.col("cn") / 2).cast("bigint")).alias("c"),
            F.concat(F.lit("s"), ((F.col("sn") - 1) / 2).cast("bigint")).alias(
                "s"
            ),
        )
    )
    assert old_pairs.exceptAll(new_pairs_mapped).count() == 0
    assert new_pairs_mapped.exceptAll(old_pairs).count() == 0


def test_power_iteration_l1_invariants(spark):
    """power_iteration_top_pc r12 rewrite (single applyInPandas task):
    the returned vector must still be L1-normalized (it is s_q/l1 by
    construction), lambda_l1 must be a single positive value shared by
    every row, and the dim domain must be complete."""
    from uk_procurement_data_pipeline_spark.queries import registry

    rows = registry()["power_iteration_top_pc"].fn(spark, SF_DIR).collect()
    dims = sorted(r["dim"] for r in rows)
    assert dims == list(range(dims[0], dims[0] + len(rows)))  # contiguous
    lambdas = {r["lambda_l1"] for r in rows}
    assert len(lambdas) == 1 and next(iter(lambdas)) > 0
    l1 = sum(abs(r["pc1_component"]) for r in rows)
    assert abs(l1 - 1.0) < 1e-9

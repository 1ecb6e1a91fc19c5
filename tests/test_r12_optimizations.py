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


def test_markov_stationary_python_recurrence_matches_join_chain(spark):
    """markov_stationary_distribution r12 rewrite: the single
    applyInPandas power iteration must reproduce the old ten chained
    join + aggregate rounds EXACTLY (integer micro arithmetic, inner-join
    state-domain semantics)."""
    from pyspark.sql import Window

    from uk_procurement_data_pipeline_spark.queries import registry

    ev = load(spark, SF_DIR, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("u"),
    )
    w = Window.partitionBy("user_id").orderBy("u", "event_id")
    seq = ev.withColumn("prev", F.lag("event_type").over(w))
    c = (
        seq.where(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    rowtot = c.groupBy("prev").agg(F.sum("n").cast("bigint").alias("tot"))
    p = c.join(rowtot, "prev").select(
        "prev", "next", F.expr("(n * 1000000) div tot").alias("p_micro")
    )
    # the OLD unrolled join-chain recurrence, verbatim
    pi = p.select(F.col("prev").alias("st")).distinct().withColumn(
        "pi_micro", F.lit(200000).cast("bigint")
    )
    for _ in range(10):
        pi = (
            p.join(pi, p.prev == pi.st)
            .groupBy(F.col("next").alias("st2"))
            .agg(
                F.expr(
                    "CAST(SUM(pi_micro * p_micro) div 1000000 AS BIGINT)"
                ).alias("pi_micro")
            )
            .select(F.col("st2").alias("st"), "pi_micro")
        )
    old = {r["st"]: r["pi_micro"] for r in pi.collect()}
    new = {
        r["event_type"]: r["stationary_micro"]
        for r in registry()["markov_stationary_distribution"]
        .fn(spark, SF_DIR)
        .collect()
    }
    # the query output inner-joins pi with the empirical state table, so
    # compare on the intersection and require every reported state match
    assert new
    for st, v in new.items():
        assert old.get(st) == v, (st, old.get(st), v)


def test_recommender_canonical_pair_mirror_equivalence(spark):
    """recommender_hitrate_backtest r12 rewrite: counting unordered
    basket pairs once (part_a < part_b) and mirroring the aggregated row
    with inline() must reproduce the old directed (a.part != b.part)
    co-purchase table exactly."""
    basket = (
        load(spark, SF_DIR, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    a, b = basket.alias("a"), basket.alias("b")
    old = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("a.part") != F.col("b.part")),
        )
        .groupBy(F.col("a.part").alias("p1"), F.col("b.part").alias("p2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
    )
    new = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o"))
            & (F.col("a.part") < F.col("b.part")),
        )
        .groupBy(F.col("a.part").alias("p1"), F.col("b.part").alias("p2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .selectExpr(
            "inline(array(struct(p1, p2), struct(p2 AS p1, p1 AS p2)))",
            "co",
        )
    )
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_adamic_adar_neighbor_list_wedges_match_self_join(spark):
    """adamic_adar_link_prediction r12 rewrite: the per-center sorted
    neighbor-list pair explosion (weight = 1/ln(size(ms))) must produce
    the same weighted wedge multiset as the old und x und self-join with
    the separate degree table."""
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    pa = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("a"))
    pb = li.select(F.col("l_orderkey").alias("k"), F.col("l_suppkey").alias("b"))
    e = (
        pa.join(pb, "k")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .where(
            F.expr(
                "CAST(conv(substring(md5(concat(a, ':', b)), 1, 8), 16, 10)"
                " AS BIGINT) % 16 = 0"
            )
        )
        .distinct()
    )
    und = e.selectExpr("a AS n", "b AS m").unionAll(
        e.selectExpr("b AS n", "a AS m")
    )
    deg = (
        und.groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") > 1)
        .selectExpr(
            "n",
            "CAST(floor(1000000.0 / ln(CAST(d AS DOUBLE)) + 0.5) AS BIGINT)"
            " AS w_micro",
        )
    )
    e1 = und.selectExpr("n AS a", "m AS b")
    e2 = und.selectExpr("n AS b", "m AS c")
    old = (
        e1.join(e2, "b")
        .where(F.col("a") < F.col("c"))
        .join(deg, deg.n == F.col("b"))
        .select("a", "c", "w_micro")
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("n_w"), F.sum("w_micro").alias("s_w"))
    )
    nbr = und.groupBy("n").agg(F.sort_array(F.collect_list("m")).alias("ms"))
    new = (
        nbr.where(F.size("ms") > 1)
        .selectExpr(
            "CAST(floor(1000000.0 / ln(CAST(size(ms) AS DOUBLE)) + 0.5)"
            " AS BIGINT) AS w_micro",
            "ms",
            "posexplode(ms) AS (pos, a)",
        )
        .selectExpr("w_micro", "a", "explode(slice(ms, pos + 2, size(ms))) AS c")
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("n_w"), F.sum("w_micro").alias("s_w"))
    )
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_lpa_canonical_edge_mirror_equivalence(spark):
    """label_propagation_communities / modularity_communities r12 batch-5
    rewrite: deduping only the canonical x < y half of the symmetric
    co-purchase edge set and mirroring with inline() must reproduce the
    old full a.p != b.p DISTINCT edge list exactly."""
    op = (
        load(spark, SF_DIR, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    old = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o")) & (F.col("a.p") != F.col("b.p")),
        )
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
        .distinct()
    )
    new = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")),
        )
        .select(F.col("a.p").alias("x"), F.col("b.p").alias("y"))
        .distinct()
        .selectExpr(
            "inline(array(struct(x AS src, y AS dst),"
            " struct(y AS src, x AS dst)))"
        )
    )
    assert old.exceptAll(new).count() == 0
    assert new.exceptAll(old).count() == 0


def test_customer_order_spans_vectorized_dates_exact():
    """customer_order_spans r12 rewrite: numpy datetime_as_string must
    emit byte-identical YYYY-MM-DD text to the old per-row strftime."""
    import numpy as np
    import pandas as pd

    days = pd.Series([0, 1, 31, 365, 8035, 10957, 12784, 20000])
    vec = np.datetime_as_string(days.values.astype("datetime64[D]"), unit="D")
    epoch = pd.Timestamp("1970-01-01")
    loop = [
        (epoch + pd.Timedelta(days=int(d))).strftime("%Y-%m-%d") for d in days
    ]
    assert list(vec) == loop

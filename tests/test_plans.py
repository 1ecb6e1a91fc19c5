"""Physical-plan assertions (SURVEY.md §4): the properties that make these
queries survive a 100x scale-up are pinned here — predicate pushdown into
the parquet scan, column pruning, broadcast only for fixed-size dims,
whole-stage codegen in expression-heavy paths, top-k without a global
sort, and no accidental cartesian products."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.queries import registry


def plan_of(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    df = registry()[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_pricing_summary_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # column pruning: the scan must not read the join keys it doesn't need
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema
    # whole-stage codegen spans show as starred operators in the FINAL
    # adaptive plan, which materializes only after execution
    df = registry()["pricing_summary"].fn(spark, sf_dir)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    final = buf.getvalue()
    assert "isFinalPlan=true" in final and "*(" in final


def test_revenue_join_broadcasts_only_fixed_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "revenue_by_region")
    # region/nation are fixed-cardinality: broadcast them
    assert "BroadcastHashJoin" in plan
    # customer grows with SF: its join side must NOT be a build-side
    # broadcast chosen by our code (AQE may still pick one at tiny SF; we
    # assert the *logical* plan carries no broadcast hint on customer)
    logical = plan_of(spark, sf_dir, "revenue_by_region", mode="extended")
    hints = [
        ln for ln in logical.splitlines() if "ResolvedHint" in ln or "hints=" in ln
    ]
    assert not any("c_custkey" in h for h in hints)


def test_global_top_orders_avoids_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "global_top_orders")
    assert "TakeOrderedAndProject" in plan
    # a full Sort + Exchange rangepartitioning would be the scale killer
    assert "rangepartitioning" not in plan


def test_minhash_has_no_cartesian_product(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "minhash_near_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_dedup_is_single_window_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "exact_dedup_docs")
    # one hash-partitioned exchange on the dedup key, nothing else
    assert plan.count("hashpartitioning(") == 1, plan
    assert "norm_key" in plan.split("hashpartitioning(")[1][:40]


def test_window_queries_shuffle_once_on_partition_key(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "running_spend_per_customer")
    assert plan.count("hashpartitioning(") == 1
    assert "o_custkey" in plan.split("hashpartitioning(")[1][:40]


@pytest.mark.parametrize(
    "name",
    ["pricing_summary", "revenue_by_region", "wordcount_top20", "exact_dedup_docs"],
)
def test_no_python_in_relational_hot_paths(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    """Bucketing pre-partitions both sides on the join key at WRITE time,
    so the join plan has zero shuffle — the co-located-join strategy for
    repeated large-large joins at 100 TB (SURVEY §2.3 J6)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/bdb'")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
        (
            orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
            .mode("overwrite").format("parquet").saveAsTable("bdb.orders_b")
        )
        (
            customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
            .mode("overwrite").format("parquet").saveAsTable("bdb.customer_b")
        )
        j = spark.table("bdb.orders_b").join(
            spark.table("bdb.customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain(mode="formatted")
        plan = buf.getvalue()
        assert "hashpartitioning" not in plan, plan
        assert j.count() == orders.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bdb.orders_b")
        spark.sql("DROP TABLE IF EXISTS bdb.customer_b")
        spark.sql("DROP DATABASE IF EXISTS bdb")


def test_excel_scan_is_an_explicit_gate(spark, tmp_path):
    from uk_procurement_data_pipeline_spark.sources.csv_source import read_excel

    with pytest.raises(NotImplementedError, match="spark-excel"):
        read_excel(spark, str(tmp_path / "x.xlsx"))


def test_chunking_is_pure_map_side(spark, sf_dir):
    """doc_chunk_overlap: scan -> generate -> project, zero shuffles —
    the shape that stays linear at 100 TB."""
    plan = plan_of(spark, sf_dir, "doc_chunk_overlap")
    assert "Exchange" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_corpus_prep_aggs_shuffle_once(spark, sf_dir):
    """Split audit and quantiles: exactly one aggregation exchange each
    (partial -> final hash agg), nothing else."""
    for name in ("stratified_split_counts", "token_quantiles_per_source"):
        plan = plan_of(spark, sf_dir, name, mode="simple")
        assert plan.count("Exchange") == 1, name


def test_fat_flatten_scan_prunes_to_needed_columns(spark, sf_dir):
    """fat_flatten_wide reads only the five order columns it encodes and
    keeps the key filter on the scan."""
    plan = plan_of(spark, sf_dir, "fat_flatten_wide")
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_totalprice" not in read_schema  # never used -> pruned
    for c in ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
              "o_orderpriority"):
        assert c in read_schema
    assert "o_orderkey#" in plan.split("Filter")[1][:400]


def test_pii_scrub_stays_jvm_side(spark, sf_dir):
    """Scrubbing is regexp_replace in codegen — no Python stages."""
    plan = plan_of(spark, sf_dir, "pii_scrub")
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
    assert "Exchange" not in plan


def test_aqe_splits_skewed_join_partitions(spark, sf_dir):
    """AQE skew-join mitigation engages on a hot key: with thresholds
    scaled to fixture size, the final adaptive plan marks the sort-merge
    join as skew=true and splits the hot partition — the runtime
    mitigation the engine relies on (with functions/skew.py salting as
    the aggregation-side complement)."""
    import io as _io
    import contextlib as _ctx

    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # one hot key owning ~half the rows on the left side
        left = spark.range(0, 40000).selectExpr(
            "if(id % 2 = 0, 7, id) AS k", "id AS payload"
        )
        right = spark.range(0, 2000).selectExpr("id AS k", "id * 10 AS r")
        joined = left.join(right, "k")
        # execute THIS dataset (not a derived count plan) so AQE finalizes
        assert len(joined.collect()) > 0
        buf = _io.StringIO()
        with _ctx.redirect_stdout(buf):
            joined.explain(mode="formatted")
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not flag the skewed join"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_reaches_probe_side(spark, sf_dir):
    """Runtime bloom-filter join pruning: when a selective filter sits on
    the build side of a shuffle join, the optimizer injects a bloom filter
    aggregate there and a might_contain probe on the scan side, so most
    probe rows die before the shuffle. The production trigger thresholds
    (probe scan >= 10 GB, build side <= 10 MB) are exactly the 100 TB
    shape; fixtures never reach them, so this pins the mechanism with the
    thresholds lowered and broadcast disabled (a broadcast join would not
    need the bloom filter in the first place)."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            "o_orderpriority = '1-URGENT'"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan and "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_incremental_dedup_never_plans_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "incremental_dedup_new_batch")
    assert "CartesianProduct" not in plan
    # the exact-hash check must be a semi-join, not a full join + filter
    assert "LeftSemi" in plan


def test_corpus_pipeline_e2e_chunks_map_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "corpus_pipeline_e2e")
    assert "CartesianProduct" not in plan
    # chunk fan-out is an explode (Generate), not a join
    assert "Generate" in plan


def test_vocab_encode_broadcasts_vocab(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "vocab_encode_docs")
    # the frequency-thresholded vocabulary is the forced-broadcast side of
    # the encode join; the corpus side must stream
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan


# --- round-4 additions: scale-shape pins ------------------------------------


def test_interval_join_is_keyed_never_nested_loop(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "events_interval_join_attribution")
    # time-bounded self-join must stay an equi-join on user_id with the
    # range bound as join condition — a BNLJ/cartesian would be O(n^2)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_winnowing_heavy_work_stays_post_exchange(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "winnowing_fingerprints")
    assert "CartesianProduct" not in plan
    # regression pin: Catalyst once inferred a size(fps)>0 filter from
    # explode and pushed it below the repartition with the WHOLE
    # fingerprint expression inlined — the md5/zip_with chain then ran
    # single-partition at the scan. The scan-side filter must stay trivial.
    scan_filter = plan.split("Exchange")[0]
    assert "zip_with" not in scan_filter
    assert "md5" not in scan_filter


def test_jl_projection_is_broadcast_map(spark, sf_dir):
    # r10 shape: the 8-row sign matrix arrives by BROADCAST (computed
    # once, not re-hashed per row) and the only data movement on the
    # vector side is spread()'s round-robin repartition — no keyed
    # shuffle, no sort, no window.
    plan = plan_of(spark, sf_dir, "jl_random_projection")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "hashpartitioning" not in plan  # round-robin only


def test_zorder_stats_attach_without_collect_or_window(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "zorder_cell_stats")
    # bounds come from a broadcast one-row aggregate, not a driver round
    # trip, and the rank is computed without any WindowExec
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan


def test_bloom_prefilter_probe_side_is_broadcast_only(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "bloom_semi_join_prefilter")
    assert "CartesianProduct" not in plan
    # the probe side tests the sketch via broadcast lookups; the only
    # shuffle is the final single-row aggregate
    assert "BroadcastHashJoin" in plan


def test_inverted_index_join_is_term_keyed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "inverted_index_dot_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- round-4 second batch: retrieval/sketch/mixture scale-shape pins --------


def test_bm25_window_is_query_partitioned_with_group_limit(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "bm25_topk_docs", mode="extended")
    assert "CartesianProduct" not in plan
    # top-5 window partitions on the bounded query_id domain...
    assert "windowspecdefinition(query_id#" in plan
    # ...and the rank<=k predicate must push a partial per-partition limit
    # BELOW the window shuffle (WindowGroupLimit), so executors emit at
    # most k rows per query each instead of every scored doc
    assert "WindowGroupLimit" in plan


def test_equidepth_bins_never_sort_globally(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "equidepth_value_bins", mode="extended")
    # the ntile rewrite: rank windows partition by the value band — an
    # unpartitioned windowspec (global single-task sort) must not appear
    assert "windowspecdefinition(band#" in plan
    assert "ntile" not in plan  # arithmetic replaces the builtin


def test_mixture_rank_partitions_by_source(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "domain_mixture_resample", mode="extended")
    assert "windowspecdefinition(source#" in plan
    assert "CartesianProduct" not in plan


def test_kmv_keeps_k_smallest_without_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "kmv_distinct_sketch", mode="extended")
    # orderBy(hv).limit(k) must plan as TakeOrderedAndProject: only k rows
    # per partition reach the final stage, never a full Sort of the hashes
    assert "TakeOrderedAndProject" in plan


def test_q21_double_correlation_stays_equi_joined(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q21_waiting_suppliers", mode="extended")
    # the EXISTS/NOT-EXISTS rewrite must never plan a nested-loop self-scan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

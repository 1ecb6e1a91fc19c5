"""Query registry plumbing for the driver contract (__spark_entry__.py).

Each QuerySpec pairs a PySpark program with (where expressible) an ANSI-SQL
oracle string that DuckDB runs on the identical parquet tables. The driver
compares row count + schema + order-insensitive value hash, so every spec
must be: (a) set-deterministic — the returned *set* of rows is unique, with
explicit tiebreaks on any top-k; (b) value-deterministic across engines —
see functions/exact.py for the double-sum strategy; (c) alias-complete —
every computed column aliased identically in both programs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    survey: str  # SURVEY.md §2 operator IDs this query covers
    doc: str = ""
    # True when fn() executes eagerly (e.g. drains a stream) rather than
    # returning a lazy plan — benchmarks must time the fn call too.
    eager: bool = False


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, *, oracle: str | None, survey: str, doc: str = "", eager: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query function to the global registry."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey=survey, doc=doc, eager=eager
        )
        return fn

    return wrap


# The driver's correctness harness checks the first ~50 registry entries per
# round, in registry order. Names listed here are emitted first, in this
# order, so that every query that is NEW or CHANGED this round — plus any
# query that has never had a driver CORRECTNESS row — lands inside that
# window. Long-stable entries (green in two prior driver rounds and still
# covered by the stricter local sweep in tools/oracle_check.py) rotate out.
# Keep this list at ~50 names; everything not listed follows in module
# import order.
_DRIVER_WINDOW: tuple[str, ...] = (
    # never driver-checked (registered after the r03 window closed) — the
    # r03 VERDICT's top item: every one of these needs its first driver row
    "q3_shipping_priority",
    "q10_returned_items",
    "q18_large_volume_orders",
    "revenue_share_within_region",
    "snapshot_diff_customers",
    "events_range_frame_sum",
    "event_type_value_chi2",
    "value_outliers_iqr",
    "value_trend_per_user",
    "props_map_key_stats",
    "vocab_encode_docs",
    "pack_chunks_into_sequences",
    "cdc_chunk_docs",
    "cdc_chunk_dedup_ratio",
    "pps_sample_docs",
    "token_budget_selection",
    "embedding_int8_quantize",
    "contrastive_pairs",
    "hard_negatives_lsh",
    # new in r04
    "events_interval_join_attribution",
    "media_decode_resize_profile",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q14_promo_revenue",
    "q19_disjunctive_revenue",
    "zorder_cell_stats",
    "winnowing_fingerprints",
    "bloom_semi_join_prefilter",
    "inverted_index_dot_pairs",
    "jl_random_projection",
    "countmin_word_sketch",
    "rrf_fusion_ann",
    "value_outliers_mad",
    "triangle_count_doulion",
    "stream_dedup_pairs",
    "q13_customer_distribution",
    "training_shuffle_order",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q22_global_sales_opportunity",
    # new in r04, second batch: the analogs completing the 22-query TPC-H
    # suite (queries/tpch_rest.py). These displace the planned back-rotation
    # and the two changed-in-r04 entries (repetition_signals,
    # minhash_components): both of those are fixture-identical to their
    # green r03 rows AND local-oracle green, while these eight have never
    # had ANY driver row — first-row priority wins (README rotation policy).
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_priority_line_classes",
    "q16_supplier_part_counts",
    "q20_promotion_candidates",
    "q21_waiting_suppliers",
)

# r05 window candidates, in priority order (README rotation policy):
# 1. never-driver-checked r04 additions that did not fit this window:
#    bm25_topk_docs, unigram_surprisal_quality, kmv_distinct_sketch,
#    equidepth_value_bins, domain_mixture_resample, ewma_user_value,
#    pointintime_customer_orders, kmv_union_jaccard, psi_value_drift,
#    profile_orders_columns, hourly_baseline_outliers, pmi_collocations,
#    neyman_stratified_sample
#    plus the round-4 batch-3 additions (queries/curation.py + events.py):
#    gopher_quality_rules, bpe_pair_counts, temperature_mixture_weights,
#    semdedup_prune, allpairs_prefix_jaccard, markov_transition_matrix,
#    cusum_changepoint, kcore_peel_unrolled, constraint_check_orders,
#    embedding_covariance, ks_binned_two_sample,
#    mutual_information_type_band, lorenz_gini_binned, entropy_per_source,
#    stream_stateful_user_totals, session_path_topk,
#    orders_open_interval_sweep, rfm_customer_segments,
#    weighted_sample_es, bigram_surprisal_quality,
#    percentiles_per_type_banded, adamic_adar_link_prediction,
#    abtest_proportions_ztest, lognormal_fit_values,
#    kaplan_meier_customer_lifetime, clustering_coefficient_local,
#    ols2_regression_per_type, als_rank1_item_step,
#    subsample_stability_ci, zipf_exponent_fit, vocab_coverage_curve,
#    ngram_novelty_rate, golden_record_survivorship, dedup_methods_report,
#    window_funnel_timeout, hhi_source_concentration,
#    kl_divergence_sources, token_length_distribution,
#    spearman_price_acctbal, naive_bayes_source_classifier,
#    decision_stump_value_split, ann_recall_report, daily_autocorr_lag1,
#    conversion_lag_stats
# 2. changed-in-r04 with fixture-identical results: repetition_signals,
#    minhash_components
# 3. back-rotation displaced from r04: pricing_summary, revenue_by_region,
#    top_orders_by_revenue, order_priority_semi, customers_without_orders,
#    orders_per_customer — then continue longest-out-first.


def registry() -> dict[str, QuerySpec]:
    # Import theme modules lazily so registration happens exactly once.
    from uk_procurement_data_pipeline_spark.queries import (  # noqa: F401
        quality,
        graph,
        reshape,
        tfidf,
        funnel,
        udtf_text,
        corpus_prep,
        xml_notices,
        similarity,
        scrape,
        scalars,
        windows,
        dedup,
        multimodal,
        ref_pipeline,
        events,
        nested,
        ingest,
        arrays_text,
        relational,
        tpch_rest,
        retrieval,
        sketches,
        mixture,
        profiling,
        curation,
    )

    missing = [n for n in _DRIVER_WINDOW if n not in _REGISTRY]
    if missing:
        raise ValueError(f"_DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered

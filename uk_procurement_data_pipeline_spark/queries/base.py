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
    # r05 window: the 50 highest-priority never-driver-checked queries
    # (registered in r04 after that round's window was already full).
    # New r05 queries are prepended here as they land, displacing the
    # tail to the r06 candidate list below.
    "degree_assortativity",
    "char_entropy_quality",
    "shipping_delay_percentiles",
    "embedding_mmd_linear",
    "markov_removal_attribution",
    "skew_kurtosis_per_type",
    "join_cardinality_estimate",
    "table_checksum_audit",
    "mann_kendall_trend",
    "dow_anova_eta2",
    "pareto_8020_users",
    "order_total_reconciliation",
    "customer_feature_vector",
    "cross_source_dup_matrix",
    "conformal_interval_backtest",
    "target_encoding_oof",
    "position_attribution_credit",
    "moving_forecast_backtest",
    "blocking_quality_report",
    "distinct_ngram_diversity",
    "daily_gap_interpolation",
    "retention_decay_fit",
    "association_rules_parts",
    "kmeans_label_purity",
    "distinctive_terms_log_odds",
    "functional_dependency_check",
    "stream_static_enrich",
    "k_anonymity_report",
    "item_cooccurrence_cosine",
    "embedding_norm_outliers",
    "markov_prediction_accuracy",
    "join_key_skew_report",
    "source_vocab_jaccard",
    "nb_margin_calibration",
    "winsorized_stats_per_type",
    "split_leakage_report",
    "exact_substr_dedup_spans",
    "power_iteration_top_pc",
    "theil_sen_daily_trend",
    "benford_first_digit",
    "burst_day_detection",
    "bm25_topk_docs",
    "unigram_surprisal_quality",
    "kmv_distinct_sketch",
    "equidepth_value_bins",
    "domain_mixture_resample",
    "ewma_user_value",
    "pointintime_customer_orders",
    "kmv_union_jaccard",
    "psi_value_drift",
)

# r06 window candidates, in priority order (README rotation policy):
# 1. never-driver-checked r04 additions deferred from this window:
#    profile_orders_columns,
#    hourly_baseline_outliers, pmi_collocations, neyman_stratified_sample,
#    gopher_quality_rules, bpe_pair_counts, temperature_mixture_weights,
#    semdedup_prune, allpairs_prefix_jaccard, markov_transition_matrix, cusum_changepoint,
#    kcore_peel_unrolled, constraint_check_orders, embedding_covariance,
#    ks_binned_two_sample, mutual_information_type_band, lorenz_gini_binned,
#    entropy_per_source, stream_stateful_user_totals, session_path_topk,
#    orders_open_interval_sweep, rfm_customer_segments,
#    weighted_sample_es, bigram_surprisal_quality, percentiles_per_type_banded,
#    adamic_adar_link_prediction,
#    ols2_regression_per_type, abtest_proportions_ztest,
#    lognormal_fit_values, kaplan_meier_customer_lifetime,
#    als_rank1_item_step, subsample_stability_ci,
#    zipf_exponent_fit, vocab_coverage_curve, ngram_novelty_rate,
#    golden_record_survivorship, dedup_methods_report, window_funnel_timeout, hhi_source_concentration,
#    kl_divergence_sources, token_length_distribution, spearman_price_acctbal,
#    naive_bayes_source_classifier, decision_stump_value_split,
#    ann_recall_report, daily_autocorr_lag1, conversion_lag_stats
# 2. the 50 queries that made up the r04 window (q2..q22 TPC-H analogs,
#    events_interval_join_attribution, media_decode_resize_profile, the
#    retrieval/sketch batch): they rotate back in if CORRECTNESS_r04.json
#    never materialized (it was absent at r05 start) — first-row priority.
# 3. back-rotation longest-out-first: pricing_summary, revenue_by_region,
#    top_orders_by_revenue, order_priority_semi, customers_without_orders,
#    orders_per_customer, ...


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

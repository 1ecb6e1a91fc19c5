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
    # new in r03: quality / graph / clustering / incremental-dedup suites
    "repetition_signals",
    "common_word_scrub",
    "quality_linear_score",
    "supplier_pagerank",
    "kmeans_lloyd_cells",
    "incremental_dedup_new_batch",
    "scd2_customer_merge",
    # new in r03: reshape / tfidf / funnel / udtf / corpus-prep suites
    "pivot_status_by_region",
    "unpivot_part_metrics",
    "lineitem_stats_corr",
    "order_percentile_position",
    "tfidf_top_terms",
    "funnel_conversion",
    "cohort_retention",
    "value_histogram",
    "user_activity_streaks",
    "bigram_expand_udtf",
    "doc_chunk_overlap",
    "stratified_split_counts",
    "pii_scrub",
    "token_quantiles_per_source",
    "trimmed_mean_tokens",
    "hash_sample_docs",
    "length_band_filter",
    "capped_per_source_sample",
    "decontaminate_against_eval",
    # never driver-checked before r03 (registered after the r02 window)
    "xml_attr_extract",
    "xml_from_xml_struct",
    "fat_flatten_wide",
    "xml_namespace_dispatch",
    "cosine_topk_bruteforce",
    "ann_lsh_multiprobe",
    "ann_ivf_probed",
    "ann_lsh_bucketed",
    "html_anchor_scrape",
    "brand_names_collected",
    "events_value_band_join",
    "events_asof_value",
    "salted_status_spend",
    # changed or new in r03: dedup fixes, multimodal vectorization, flattens
    "simhash_dedup",
    "minhash_components",
    "containment_dedup",
    "levenshtein_blocked_dedup",
    "dedup_canonical_keep",
    "frame_sample_profile",
    "byte_histogram_profile",
    "ocds_flatten_wide",
    "stream_tumbling_counts",
    # green in r01 only (fell out of the r02 window) — give each a fresh row
    "corpus_pipeline_e2e",
    "percent_rank_cume_dist",
)


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
    )

    missing = [n for n in _DRIVER_WINDOW if n not in _REGISTRY]
    if missing:
        raise ValueError(f"_DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _DRIVER_WINDOW}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered

"""Partitioning-invariance: the engine's cross-engine determinism story
rests on order-independent aggregation (functions/exact.py) and explicit
tiebreaks. If that claim holds, changing the shuffle width — which
reorders every partial-aggregation merge — must not change a single bit
of any result. Pin it by executing representative queries at shuffle
parallelism 3 and 16 and comparing full result sets.

At 100 TB this is the property that makes results reproducible across
cluster sizes and AQE re-plans."""

from __future__ import annotations

import math

from pyspark.sql import functions as F  # noqa: F401

from uk_procurement_data_pipeline_spark.queries import registry

# One query per determinism hazard: decimal sums (pricing), iterative
# decimal propagation (pagerank), window+hash dedup (simhash), float fold
# (cosine), corpus stats (repetition), multi-filter similarity join with
# bitmap pruning (allpairs), chained banded-rank terciles (rfm), and
# multi-round graph peeling over a localCheckpointed edge list (kcore).
QUERIES = [
    "pricing_summary",
    "supplier_pagerank",
    "simhash_dedup",
    "cosine_topk_bruteforce",
    "repetition_signals",
    "allpairs_prefix_jaccard",
    "rfm_customer_segments",
    "kcore_peel_unrolled",
]


def _canon(v):
    if isinstance(v, float):
        assert not math.isnan(v)
        return repr(v)  # full precision — bit-identical or bust
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(_canon(r[c]) for c in cols) for r in df.collect()
    )


def test_results_identical_across_shuffle_widths(spark, sf_dir):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    reg = registry()
    try:
        for name in QUERIES:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            narrow = _rows(reg[name].fn(spark, sf_dir))
            spark.conf.set("spark.sql.shuffle.partitions", "16")
            wide = _rows(reg[name].fn(spark, sf_dir))
            assert narrow == wide, f"{name} changed under repartitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

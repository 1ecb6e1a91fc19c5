"""Distinct-count sketching and equi-depth binning ([NORTH-STAR] scale
path beside the exact aggregates in queries/relational.py and the
count-min sketch in queries/arrays_text.py).

KMV (k-minimum-values) is the classic mergeable distinct-count sketch
(Bar-Yossef et al.): hash every key, keep the k smallest distinct hash
values; the k-th smallest estimates cardinality as (k-1) * H / h_k for a
hash range H. Unlike HLL (whose register layout is engine-internal and
only tolerance-testable — see tests/test_operators.py), KMV built on the
repo's cross-engine md5 hash family is EXACTLY reproducible in DuckDB,
so the sketch itself sits under the differential oracle: both engines
must agree on every one of the k retained hashes and the resulting
estimate. At 100 TB the same plan holds: the hash projection is
scan-side, the distinct is one shuffle, and keeping k smallest is a
TakeOrderedAndProject (k rows to the driver-side sort, never the data).

Equi-depth histogram: ntile over a total order with an explicit unique
tiebreak — the complement of value_histogram's equi-WIDTH bins; the
standard feature-binning step before quantile-based capping/clipping in
a training-data pipeline. One window shuffle; bounded output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register

_K = 64
_HASH_RANGE = float(2**32)  # md5 first 8 hex chars -> [0, 2^32)

_N_BINS = 10


@register(
    name="kmv_distinct_sketch",
    survey="A8 A7 O4",
    doc="KMV distinct-count sketch over events.user_id, exactly oracle-"
    "checked: md5-based 32-bit hash (the dedup.py hash family), "
    "distinct hashes, 64 smallest kept via global sort-limit "
    "(TakeOrderedAndProject: only k rows cross to the final stage), "
    "estimate (k-1)*2^32/h_k floored to bigint, emitted beside the "
    "true distinct count and the absolute error so the estimate "
    "quality is part of the checked result.",
    oracle=f"""
        WITH h AS (
            SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                                 1, 8) AS BIGINT) AS hv
            FROM events),
        kmin AS (
            SELECT hv FROM h ORDER BY hv LIMIT {_K}),
        sk AS (
            SELECT COUNT(*) AS k_used, MAX(hv) AS kth_min_hash
            FROM kmin),
        tru AS (
            SELECT COUNT(DISTINCT user_id) AS true_distinct FROM events)
        SELECT k_used, kth_min_hash,
               CAST(floor((CAST(k_used AS DOUBLE) - 1.0) * {_HASH_RANGE!r}
                          / CAST(kth_min_hash AS DOUBLE)) AS BIGINT)
                   AS est_distinct,
               true_distinct,
               abs(CAST(floor((CAST(k_used AS DOUBLE) - 1.0) * {_HASH_RANGE!r}
                              / CAST(kth_min_hash AS DOUBLE)) AS BIGINT)
                   - true_distinct) AS abs_err
        FROM sk, tru
    """,
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    h = events.select(
        F.expr(
            "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT)"
        ).alias("hv")
    ).distinct()
    kmin = h.orderBy("hv").limit(_K)
    sk = kmin.agg(
        F.count(F.lit(1)).alias("k_used"), F.max("hv").alias("kth_min_hash")
    )
    tru = events.agg(F.count_distinct("user_id").alias("true_distinct"))
    est = F.floor(
        (F.col("k_used").cast("double") - F.lit(1.0))
        * F.lit(_HASH_RANGE)
        / F.col("kth_min_hash").cast("double")
    ).cast("bigint")
    return (
        sk.join(F.broadcast(tru))
        .withColumn("est_distinct", est)
        .withColumn(
            "abs_err", F.abs(F.col("est_distinct") - F.col("true_distinct"))
        )
        .select(
            "k_used", "kth_min_hash", "est_distinct", "true_distinct", "abs_err"
        )
    )


@register(
    name="equidepth_value_bins",
    survey="W1 A7 F28",
    doc="Equi-depth (quantile) binning of event values with ntile(10) "
    "semantics over the total order (value, event_id), computed WITHOUT "
    "an unpartitioned WindowExec (the vocab_encode_docs pattern): "
    "row_number within floor(value) bands — parallel across bands — "
    "plus broadcast strictly-lower-band offsets gives the global rank, "
    "and ntile's first-(n%b)-buckets-get-one-extra rule is then pure "
    "arithmetic on (rank, n). The oracle keeps the literal ntile() "
    "window, certifying the distributed rewrite EQUALS the textbook "
    "single-sort semantics. Per-bin count/min/max/exact-sum output; "
    "the complement of value_histogram's equi-width bins.",
    oracle="""
        WITH binned AS (
            SELECT value,
                   ntile(10) OVER (ORDER BY value, event_id) AS bin
            FROM events WHERE value IS NOT NULL)
        SELECT bin, COUNT(*) AS n,
               min(value) AS lo, max(value) AS hi,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38,8))), 4) AS DOUBLE)
                   AS bin_sum
        FROM binned GROUP BY bin
    """,
)
def equidepth_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from uk_procurement_data_pipeline_spark.functions.exact import exact_sum

    events = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_id", "value", F.floor("value").alias("band"))
    )
    # Global rank without a global sort: rank within each value band, then
    # add the count of all strictly-lower bands (the band domain is the
    # integer range of `value` — bounded — so the offset table broadcasts).
    in_band = F.row_number().over(
        Window.partitionBy("band").orderBy("value", "event_id")
    )
    sizes = events.groupBy("band").agg(F.count(F.lit(1)).alias("bn"))
    lo_b = sizes.select(F.col("band").alias("lband"), F.col("bn").alias("ln"))
    offsets = (
        sizes.join(F.broadcast(lo_b), F.col("lband") < F.col("band"), "left")
        .groupBy("band")
        .agg(F.coalesce(F.sum("ln"), F.lit(0)).alias("off"))
    )
    tot = events.agg(F.count(F.lit(1)).alias("n_total"))
    ranked = (
        events.withColumn("rk", in_band)
        .join(F.broadcast(offsets), "band")
        .join(F.broadcast(tot))
        .withColumn("rn", F.col("off") + F.col("rk"))
    )
    # ntile(b): s = n div b, r = n mod b; buckets 1..r hold s+1 rows.
    b = F.lit(_N_BINS)
    s, r = F.col("n_total") / b, F.col("n_total") % b  # integer div below
    s = F.floor(s)
    head = r * (s + 1)  # rows living in the first r (larger) buckets
    bin_col = F.when(
        F.col("rn") <= head, F.floor((F.col("rn") - 1) / (s + 1)) + 1
    ).otherwise(r + F.floor((F.col("rn") - head - 1) / s) + 1)
    return (
        ranked.select("value", bin_col.cast("int").alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            exact_sum("value", "bin_sum"),
        )
    )

"""Window-function queries (SURVEY.md §2.6 W1-W3, §2.7 A10 top-k per
group, §2.5 D1 keyed dedup-with-tombstones).

W1 is load-bearing for the reference: its `seen_uris` first-wins dedup
with tombstone rows (2a_extract_contracts_finder.py:226-243) translates to
`row_number() OVER (PARTITION BY key ORDER BY arrival)` — duplicates are
KEPT and flagged, not dropped (dedup_tombstone below mirrors that exact
contract on the events table).

Scale note: every window here partitions by a high-cardinality key
(customer, user, brand), so the single shuffle distributes evenly; no
global sort is ever required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.functions.exact import dec
from uk_procurement_data_pipeline_spark.queries.base import register


@register(
    name="topk_parts_per_brand",
    survey="W1 A10",
    doc="Top-3 per group via row_number with explicit tiebreak.",
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice, rk
        FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey) AS rk
            FROM part)
        WHERE rk <= 3
    """,
)
def topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        load(spark, sf_dir, "part")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rk")
    )


@register(
    name="order_gaps_lag_lead",
    survey="W2",
    doc="lag/lead analytics: previous/next order price and day gap per customer.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               LAG(o_totalprice)  OVER w AS prev_price,
               LEAD(o_totalprice) OVER w AS next_price,
               CAST(date_diff('day',
                    LAG(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def order_gaps_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        ).cast("long").alias("days_since_prev"),
    )


@register(
    name="running_spend_per_customer",
    survey="W3",
    doc="Running total (ROWS UNBOUNDED PRECEDING) with exact decimal cumsum.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend
        FROM orders
    """,
)
def running_spend_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Prefix sums of exact decimals are order-defined (same ORDER BY both
    # engines) and exact, so the double cast agrees; magnitudes stay well
    # below the 2^53 scaled-integer bound at correctness scale.
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    name="moving_avg_order_price",
    survey="W3",
    doc="Moving average over a 3-row frame (2 preceding + current), exact.",
    oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) OVER w AS DOUBLE)
                   / CAST(COUNT(*) OVER w AS DOUBLE) AS moving_avg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def moving_avg_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(dec("o_totalprice")).over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("moving_avg"),
    )


@register(
    name="first_last_event_value",
    survey="W2",
    doc="first/last over an ordered frame: each user's first and latest event value.",
    oracle="""
        SELECT user_id, event_id,
               FIRST_VALUE(value) OVER w AS first_value_seen,
               LAST_VALUE(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_value_seen
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def first_last_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.first("value").over(w).alias("first_value_seen"),
        F.last("value").over(w_full).alias("last_value_seen"),
    )


@register(
    name="dedup_tombstone",
    survey="D1 W1 E2",
    doc="The reference's first-wins keyed dedup WITH tombstone rows "
    "(2a_extract_contracts_finder.py:226-243): later duplicates of a key are "
    "kept and flagged with a status column, never dropped. Key = "
    "(user_id, event_type), arrival order = (ts, event_id).",
    oracle="""
        SELECT event_id, user_id, event_type,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 'ok' ELSE 'duplicate_key_skipped' END AS status
        FROM events
    """,
)
def dedup_tombstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.when(F.row_number().over(w) == 1, F.lit("ok"))
        .otherwise(F.lit("duplicate_key_skipped"))
        .alias("status"),
    )


@register(
    name="rank_dense_rank_ntile",
    survey="W1",
    doc="rank / dense_rank / ntile over account balance per nation.",
    oracle="""
        SELECT c_custkey, c_nationkey,
               RANK()       OVER w AS bal_rank,
               DENSE_RANK() OVER w AS bal_dense_rank,
               NTILE(4)     OVER w AS bal_quartile
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def rank_dense_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@register(
    name="percent_rank_cume_dist",
    survey="W1 W3",
    doc="percent_rank / cume_dist relative-position functions per nation "
    "(the normalized siblings of rank_dense_rank_ntile): both are exact "
    "integer-ratio doubles — (rank-1)/(n-1) and n_leq/n — divided in "
    "one fixed order, so the values are bit-identical across engines.",
    oracle="""
        SELECT c_custkey, c_nationkey,
               PERCENT_RANK() OVER w AS bal_pct_rank,
               CUME_DIST()    OVER w AS bal_cume_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )

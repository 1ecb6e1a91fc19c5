"""Ingest-stage and Python-UDF-surface queries (SURVEY.md §2.11 UD1/UD5,
§2.9 F22, §2.12 E2).

These are the engine's sanctioned Python islands: the HTTP fetch stage
(`mapInPandas`, UD1 — the reference's 2a:32-48 retry loop) and a grouped
`applyInPandas` op (UD5). Both are Arrow-batched and emit results a DuckDB
oracle reproduces exactly — the fake transport's payload is a pure md5
function of the URI, and the grouped op returns integer/date outputs only
(pandas float arithmetic is never hash-compared).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.catalog import load, spread
from uk_procurement_data_pipeline_spark.queries.base import register
from uk_procurement_data_pipeline_spark.sources.http_fetch import (
    fake_transport,
    fetch_json_stage,
)

_PAYLOAD_SCHEMA = "uri string, ocid string, amount bigint"


def _no_sleep(_: float) -> None:
    """Skip retry backoff for the deterministic fake (failures never heal)."""


@register(
    name="fetch_json_notices",
    survey="UD1 S4 F22 E2 P6",
    doc="The reference's fetch loop (2a:32-48 + 2a:246-254) as a "
    "mapInPandas stage: batched fetch with retry + status columns, then "
    "declarative from_json extraction. Offline fake transport derives the "
    "payload from md5(uri), so the oracle recomputes every field.",
    oracle="""
        WITH u AS (
            SELECT 'https://example.org/api/notice/' || o_orderkey AS uri,
                   substr(md5('https://example.org/api/notice/' || o_orderkey),
                          1, 1) = '0' AS failed
            FROM orders WHERE o_orderkey % 20 = 0)
        SELECT uri,
               CASE WHEN failed THEN NULL
                    ELSE 'ocds-' || substr(md5(uri), 1, 12) END AS ocid,
               CASE WHEN failed THEN NULL
                    ELSE CAST(('0x' || substr(md5(uri), 13, 6)) AS BIGINT)
                    END AS amount,
               CASE WHEN failed THEN 'fetch_failed_or_invalid_json'
                    ELSE 'ok' END AS status
        FROM u
    """,
)
def fetch_json_notices(spark: SparkSession, sf_dir: str) -> DataFrame:
    uris = spread(
        load(spark, sf_dir, "orders")
        .where("o_orderkey % 20 = 0")
        .selectExpr("concat('https://example.org/api/notice/', o_orderkey) AS uri")
    )
    fetched = fetch_json_stage(uris, transport=fake_transport, sleep=_no_sleep)
    parsed = fetched.withColumn("j", F.from_json("payload", _PAYLOAD_SCHEMA))
    return parsed.select(
        "uri",
        F.col("j.ocid").alias("ocid"),
        F.col("j.amount").alias("amount"),
        "status",
    )


_SPAN_SCHEMA = (
    "o_custkey bigint, n_orders bigint, first_date string, last_date string, "
    "max_gap_days bigint"
)


_BUCKETS = 256


def _order_spans(pdf: pd.DataFrame) -> pd.DataFrame:
    """Order-history profile for every customer in one coarse bucket.

    The applyInPandas scale pattern: Spark groups on a COARSE bucket key
    (o_custkey % 256) so the per-group Python round-trip is paid 256
    times, not once per customer; the fine per-customer grouping happens
    vectorized inside pandas.
    """
    df = pdf.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    days = df["o_orderdate"].values.astype("datetime64[D]").astype("int64")
    df = df.assign(_day=days)
    gap = df.groupby("o_custkey")["_day"].diff()
    agg = df.assign(_gap=gap).groupby("o_custkey").agg(
        n_orders=("_day", "size"),
        first_day=("_day", "min"),
        last_day=("_day", "max"),
        max_gap_days=("_gap", "max"),
    )
    # r12 (guide §4.2 vectorize inside the UDF): the date strings used to
    # come from a per-customer Python loop (Timestamp + Timedelta +
    # strftime, 2x once per customer); numpy's datetime_as_string over the
    # epoch-day vectors emits the identical 'YYYY-MM-DD' text in one
    # vectorized call per column.
    import numpy as np

    def _iso(days: pd.Series) -> "np.ndarray":
        return np.datetime_as_string(
            days.values.astype("datetime64[D]"), unit="D"
        )

    return pd.DataFrame(
        {
            "o_custkey": agg.index.values,
            "n_orders": agg["n_orders"].values,
            "first_date": _iso(agg["first_day"]),
            "last_date": _iso(agg["last_day"]),
            "max_gap_days": agg["max_gap_days"].fillna(0).astype("int64").values,
        }
    )


@register(
    name="customer_order_spans",
    survey="UD5 A7 W2 F15",
    doc="Grouped-map applyInPandas (UD5): per-customer order-history span "
    "profile — integer/date outputs only, so the window-function oracle "
    "matches exactly. Spark groups on a coarse bucket (o_custkey % 256) and "
    "pandas does the fine per-customer groupby inside each call, so the "
    "per-group Python round-trip is paid per bucket, not per customer. One "
    "shuffle on the bucket key.",
    oracle="""
        WITH g AS (
            SELECT o_custkey, o_orderdate,
                   o_orderdate - LAG(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS gap
            FROM orders)
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_date,
               strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date,
               COALESCE(MAX(CAST(datepart('day', gap) AS BIGINT)), 0)
                   AS max_gap_days
        FROM g
        GROUP BY o_custkey
    """,
)
def customer_order_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").selectExpr(
        "o_custkey", "o_orderkey", "o_orderdate", f"o_custkey % {_BUCKETS} AS bucket"
    )
    return orders.groupBy("bucket").applyInPandas(_order_spans, schema=_SPAN_SCHEMA)

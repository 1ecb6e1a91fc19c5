"""ACID snapshot-table queries (SURVEY.md §2.1 S7, §2.12 E1/E4).

The reference overwrites its merged outputs wholesale each run
(3_merge_to_two.py:41-57 appends daily frames to one CSV with hand-rolled
header bookkeeping); the 100 TB equivalent is a transactional table with
idempotent upserts and versioned reads. sources/sinks.py implements that
over plain parquet (manifest per snapshot, bucket-indexed copy-on-write
MERGE, txn ledger); this module makes the path DRIVER-VISIBLE: the query
runs a real create -> merge -> time-travel-read cycle against a scratch
table and returns a readout the DuckDB oracle reconstructs relationally.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register

# Deterministic update/insert sets: every 97th key gets its status
# overwritten, every 997th key spawns an inserted sibling 1e9 above the
# key domain — both pure functions of the fixture, no RNG.
_UPD_MOD = 97
_INS_MOD = 997
_KEY_OFFSET = 1_000_000_000


@register(
    name="acid_merge_snapshot_readout",
    survey="S7 E1 E4 A7 U1",
    eager=True,
    doc="ACID table end-to-end (Delta-equivalent semantics over plain "
    "parquet, sources/sinks.py): snapshot v1 = orders keyed by "
    "o_orderkey in 16 hash buckets; MERGE upsert (status overwrite for "
    "keys % 97 == 0, inserted sibling keys % 997 == 0) produces v2 "
    "rewriting ONLY touched buckets; the result reads BOTH versions "
    "back — v2 via the _LATEST pointer, v1 via time travel — and "
    "aggregates per (version, status). The oracle reconstructs the "
    "merge relationally (anti-join + union), so row isolation, update "
    "visibility, insert visibility, AND v1 immutability after the "
    "merge are all value-checked. Merge cost is O(touched buckets): "
    "unaffected bucket files carry over by manifest reference.",
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey, o_orderstatus,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
            FROM orders),
        upd AS (
            SELECT o_orderkey, 'R' AS o_orderstatus, price_cents
            FROM base WHERE o_orderkey % {_UPD_MOD} = 0
            UNION ALL
            SELECT o_orderkey + {_KEY_OFFSET}, 'N', price_cents
            FROM base WHERE o_orderkey % {_INS_MOD} = 0),
        v2 AS (
            SELECT b.* FROM base b
            WHERE NOT EXISTS (SELECT 1 FROM upd u
                              WHERE u.o_orderkey = b.o_orderkey)
            UNION ALL
            SELECT * FROM upd)
        SELECT 1 AS version, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(price_cents) AS BIGINT) AS total_cents
        FROM base GROUP BY o_orderstatus
        UNION ALL
        SELECT 2, o_orderstatus,
               CAST(count(*) AS BIGINT),
               CAST(sum(price_cents) AS BIGINT)
        FROM v2 GROUP BY o_orderstatus
    """,
)
def acid_merge_snapshot_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from uk_procurement_data_pipeline_spark.sources.sinks import (
        acid_create,
        acid_merge_upsert,
        acid_read,
    )

    base = load(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "o_orderstatus",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents",
    )
    tdir = f"/tmp/spark_acid_query/{Path(sf_dir).name}"
    shutil.rmtree(tdir, ignore_errors=True)
    acid_create(base, tdir, key_cols=["o_orderkey"], n_buckets=16)

    upd = base.where(f"o_orderkey % {_UPD_MOD} = 0").selectExpr(
        "o_orderkey", "'R' AS o_orderstatus", "price_cents"
    ).unionByName(
        base.where(f"o_orderkey % {_INS_MOD} = 0").selectExpr(
            f"o_orderkey + {_KEY_OFFSET} AS o_orderkey",
            "'N' AS o_orderstatus",
            "price_cents",
        )
    )
    acid_merge_upsert(spark, tdir, upd, app_id="readout", txn_version=1)

    def readout(df: DataFrame, version: int) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("price_cents").cast("bigint").alias("total_cents"),
        ).select(
            F.lit(version).cast("int").alias("version"),
            "o_orderstatus",
            "n_orders",
            "total_cents",
        )

    v1 = acid_read(spark, tdir, version=1)  # time travel: pre-merge
    v2 = acid_read(spark, tdir)  # _LATEST pointer: post-merge
    return readout(v1, 1).unionByName(readout(v2, 2))

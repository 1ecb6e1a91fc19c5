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


# Deterministic synthetic changelog over orders: four sequenced operation
# waves, every op a pure function of the key. Wave 4 updates keys that
# wave 3 may have deleted (keys % (13*17) == 0), pinning the upsert
# semantics of a 'U' arriving after a 'D' (re-insert) — the corner that
# separates CDC apply from a plain last-write-wins overwrite.
_CDC_UPD2, _CDC_DEL3, _CDC_UPD4 = 11, 13, 17


@register(
    name="cdc_apply_changelog",
    survey="D1 W1 E2 A7 U1",
    doc="CDC apply-changes (the Debezium-feed -> table pattern): a "
    "4-wave sequenced changelog (full insert; status update on keys "
    "% 11; delete on keys % 13; late update on keys % 17 — which "
    "RE-INSERTS keys the delete wave removed, % 221) collapses to "
    "final state via one row_number window per key (last sequence "
    "wins, 'D' rows drop), then aggregates per surviving status. "
    "ONE key-partitioned window shuffle however long the feed — the "
    "linear-scale shape of streaming CDC compaction; the readout "
    "value-checks insert/update/delete/re-insert visibility at once.",
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey AS k, o_orderstatus AS st,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
            FROM orders),
        log AS (
            SELECT 1 AS seq, 'I' AS op, k, st, price_cents FROM base
            UNION ALL
            SELECT 2, 'U', k, 'U2', price_cents FROM base
            WHERE k % {_CDC_UPD2} = 0
            UNION ALL
            SELECT 3, 'D', k, NULL, NULL FROM base
            WHERE k % {_CDC_DEL3} = 0
            UNION ALL
            SELECT 4, 'U', k, 'U4', price_cents FROM base
            WHERE k % {_CDC_UPD4} = 0),
        last AS (
            SELECT k, op, st, price_cents,
                   row_number() OVER (PARTITION BY k ORDER BY seq DESC)
                       AS rn
            FROM log)
        SELECT st AS o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(price_cents) AS BIGINT) AS total_cents
        FROM last WHERE rn = 1 AND op <> 'D'
        GROUP BY st
    """,
)
def cdc_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    base = load(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS k",
        "o_orderstatus AS st",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents",
    )
    log = (
        base.selectExpr("1 AS seq", "'I' AS op", "k", "st", "price_cents")
        .unionByName(
            base.where(f"k % {_CDC_UPD2} = 0").selectExpr(
                "2 AS seq", "'U' AS op", "k", "'U2' AS st", "price_cents"
            )
        )
        .unionByName(
            base.where(f"k % {_CDC_DEL3} = 0").selectExpr(
                "3 AS seq",
                "'D' AS op",
                "k",
                "CAST(NULL AS STRING) AS st",
                "CAST(NULL AS BIGINT) AS price_cents",
            )
        )
        .unionByName(
            base.where(f"k % {_CDC_UPD4} = 0").selectExpr(
                "4 AS seq", "'U' AS op", "k", "'U4' AS st", "price_cents"
            )
        )
    )
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    final = (
        log.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
    )
    return final.groupBy(F.col("st").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("price_cents").cast("bigint").alias("total_cents"),
    )

"""Nested/semi-structured core queries — the reference's heart.

The reference's flagship transform navigates nested OCDS documents:
keyed first-match party lookup (2a_extract_contracts_finder.py:82-91
``find_buyer_party``), role-membership filtering (2a:94-101
``find_supplier_parties``), two-level flatten (2a:360-367 items →
deliveryAddresses), and JSON decoding (2a:36). The driver fixtures have no
nested columns, so each query BUILDS the nested shape first —
``collect_list(struct(...))`` with explicit sorts so both engines see
identical arrays — then runs the operator under test over it. Covers
SURVEY.md §2 rows J1, J2, F20, F22, U2, A1-A3.

Scale: the nested builds are one groupBy shuffle on a high-cardinality key
(order/customer key); the array operators themselves are per-row column
expressions (whole-stage codegen, no extra shuffle, no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register


@register(
    name="nested_first_match_party",
    survey="J1 O3 F17 F18",
    doc="Keyed first-match inside an array-of-struct (find_buyer_party, ref "
    "2a:82-91): element_at(filter(lines, x -> x.sk = target), 1) then field "
    "pluck — an intra-record semi-join, zero extra shuffle.",
    oracle="""
        WITH g AS (
            SELECT l_orderkey, MIN(l_suppkey) AS target_supp,
                   list(struct_pack(ln := l_linenumber, sk := l_suppkey,
                                    qty := l_quantity)
                        ORDER BY l_linenumber, l_suppkey, l_quantity) AS lines
            FROM lineitem GROUP BY l_orderkey)
        SELECT l_orderkey, target_supp,
               list_filter(lines, x -> x.sk = target_supp)[1].ln AS match_linenumber,
               list_filter(lines, x -> x.sk = target_supp)[1].qty AS match_qty
        FROM g
    """,
)
def nested_first_match_party(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("target_supp"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_suppkey").alias("sk"),
                    F.col("l_quantity").alias("qty"),
                )
            )
        ).alias("lines"),
    )
    first = "element_at(filter(lines, x -> x.sk = target_supp), 1)"
    return g.selectExpr(
        "l_orderkey",
        "target_supp",
        f"{first}.ln AS match_linenumber",
        f"{first}.qty AS match_qty",
    )


@register(
    name="nested_role_filter_parties",
    survey="J2 F19 A2 A4",
    doc="Role-membership filter over array-of-struct parties "
    "(find_supplier_parties, ref 2a:94-101): conditional roles arrays, "
    "array_contains filter, sorted-distinct ';'-join (_join_unique, 2b:13-15).",
    oracle="""
        WITH s AS (
            SELECT l_orderkey, l_suppkey,
                   MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS is_ret
            FROM lineitem GROUP BY l_orderkey, l_suppkey),
        p AS (
            SELECT l_orderkey,
                   list(struct_pack(
                       id := l_suppkey,
                       roles := list_filter(
                           ['supplier', CASE WHEN is_ret = 1
                                             THEN 'returner' END],
                           r -> r IS NOT NULL))
                        ORDER BY l_suppkey) AS parties
            FROM s GROUP BY l_orderkey)
        SELECT l_orderkey,
               len(parties) AS n_parties,
               len(list_filter(parties,
                   x -> list_contains(x.roles, 'returner'))) AS n_returners,
               array_to_string(list_sort(list_distinct(list_transform(
                   list_filter(parties, x -> list_contains(x.roles, 'returner')),
                   x -> CAST(x.id AS VARCHAR)))), ';') AS returner_ids,
               COALESCE(list_filter(parties,
                   x -> list_contains(x.roles, 'returner'))[1].id, -1)
                   AS first_returner
        FROM p
    """,
)
def nested_role_filter_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("is_ret")
    )
    p = s.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_suppkey").alias("id"),
                    F.array_compact(
                        F.array(
                            F.lit("supplier"),
                            F.when(F.col("is_ret") == 1, F.lit("returner")),
                        )
                    ).alias("roles"),
                )
            )
        ).alias("parties")
    )
    returners = "filter(parties, x -> array_contains(x.roles, 'returner'))"
    return p.selectExpr(
        "l_orderkey",
        "size(parties) AS n_parties",
        f"size({returners}) AS n_returners",
        # empty -> NULL, matching the reference's pipe_join/_join_unique
        # (2a:148-150: '' folds to None) and DuckDB's array_to_string([]).
        f"""nullif(array_join(array_sort(array_distinct(transform(
            {returners}, x -> CAST(x.id AS STRING)))), ';'), '') AS returner_ids""",
        f"coalesce(try_element_at({returners}, 1).id, -1L) AS first_returner",
    )


@register(
    name="nested_flatten_awards",
    survey="F20 A5 A3 F17",
    doc="Two-level nesting flattened (awards→items, ref 2a:360-367 "
    "items→deliveryAddresses): flatten(transform(awards, a -> a.items)) plus "
    "order-preserving distinct (append_unique, 2a:351-367).",
    oracle="""
        WITH items AS (
            SELECT l_orderkey,
                   list_sort(list_distinct(list(l_partkey))) AS items
            FROM lineitem GROUP BY l_orderkey),
        a AS (
            SELECT o_custkey,
                   list(struct_pack(okey := o_orderkey, items := items)
                        ORDER BY o_orderkey) AS awards
            FROM orders JOIN items ON o_orderkey = l_orderkey
            GROUP BY o_custkey)
        SELECT o_custkey,
               len(awards) AS n_awards,
               len(flatten(list_transform(awards, x -> x.items))) AS n_item_refs,
               len(list_distinct(flatten(list_transform(awards, x -> x.items))))
                   AS n_distinct_parts
        FROM a
    """,
)
def nested_flatten_awards(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    items = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    )
    a = (
        orders.join(items, orders.o_orderkey == items.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("o_orderkey").alias("okey"), F.col("items")))
            ).alias("awards")
        )
    )
    flat = "flatten(transform(awards, x -> x.items))"
    return a.selectExpr(
        "o_custkey",
        "size(awards) AS n_awards",
        f"size({flat}) AS n_item_refs",
        f"size(array_distinct({flat})) AS n_distinct_parts",
    )


@register(
    name="props_json_extract",
    survey="F22 A7 P6",
    doc="JSON decoding of a data column (ref 2a:36 resp.json()): "
    "from_json over events.props, null-safe missing-key path, agg per type.",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
               COUNT(json_extract_string(props, '$.missing')) AS n_missing_key
        FROM events
        GROUP BY event_type
    """,
)
def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "parsed", F.from_json("props", "k BIGINT, missing STRING")
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("parsed.k").alias("sum_k"),
        F.min("parsed.k").alias("min_k"),
        F.max("parsed.k").alias("max_k"),
        F.count("parsed.missing").alias("n_missing_key"),
    )


@register(
    name="props_shape_guard",
    survey="P8 E1 E2 F22",
    doc="Type/shape guard (ref 2a:363-364 skip-non-dict, 2b:484-488 error "
    "rows): a deterministic 1/97 slice of props is corrupted in-query, then "
    "guarded extraction turns malformed/mis-shaped payloads into flagged "
    "rows instead of failures — Spark from_json nulls the field, DuckDB "
    "json_valid + TRY_CAST reproduce the identical null set.",
    oracle="""
        WITH c AS (
            SELECT event_id,
                   CASE WHEN event_id % 97 = 0 THEN 'x' || props
                        ELSE props END AS raw
            FROM events),
        p AS (
            SELECT event_id, raw,
                   CASE WHEN json_valid(raw)
                        THEN TRY_CAST(json_extract_string(raw, '$.k') AS BIGINT)
                        END AS k
            FROM c)
        SELECT event_id, k,
               CASE WHEN k IS NULL THEN 'invalid_or_shape_mismatch'
                    ELSE 'ok' END AS status
        FROM p
    """,
)
def props_shape_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").selectExpr(
        "event_id",
        "CASE WHEN event_id % 97 = 0 THEN concat('x', props) ELSE props END AS raw",
    )
    return ev.selectExpr(
        "event_id", "from_json(raw, 'k BIGINT').k AS k"
    ).selectExpr(
        "event_id",
        "k",
        "CASE WHEN k IS NULL THEN 'invalid_or_shape_mismatch' ELSE 'ok' END AS status",
    )


@register(
    name="dialect_union_notices",
    survey="U2 U1 F2",
    doc="Two-dialect union into one schema (TED vs UK2023 parsers emitting "
    "the same logical record, ref 2b:193-249 vs 2b:374-429): "
    "unionByName(allowMissingColumns=True) — the correct semantics for the "
    "reference's header-once positional append (3:51-56).",
    oracle="""
        SELECT o_orderkey AS notice_id, o_orderdate AS published,
               o_orderpriority AS priority, CAST(NULL AS DOUBLE) AS total_value,
               'dialect_a' AS source_dialect
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_orderkey, o_orderdate,
               CAST(NULL AS VARCHAR), o_totalprice, 'dialect_b'
        FROM orders WHERE o_orderstatus = 'F'
    """,
)
def dialect_union_notices(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    dialect_a = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("notice_id"),
        F.col("o_orderdate").alias("published"),
        F.col("o_orderpriority").alias("priority"),
        F.lit("dialect_a").alias("source_dialect"),
    )
    dialect_b = orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("notice_id"),
        F.col("o_orderdate").alias("published"),
        F.col("o_totalprice").alias("total_value"),
        F.lit("dialect_b").alias("source_dialect"),
    )
    return dialect_a.unionByName(dialect_b, allowMissingColumns=True)


@register(
    name="props_map_key_stats",
    survey="F22 A7 F17 P6",
    doc="Generic JSON-bag aggregation via MapType: the props column is "
    "decoded as map<string,int> (no schema declared per key — the keys "
    "themselves are data), the map entries exploded, and per-key "
    "statistics aggregated. The DuckDB oracle walks the same bags with "
    "json_keys + json_extract, pinning that Spark's whole-bag map "
    "decode sees exactly the keys a per-entry JSON walk sees.",
    oracle="""
        SELECT k AS prop_key,
               count(*) AS n_events,
               CAST(min(CAST(json_extract(props, '$.' || k) AS INTEGER))
                    AS BIGINT) AS min_v,
               CAST(max(CAST(json_extract(props, '$.' || k) AS INTEGER))
                    AS BIGINT) AS max_v,
               CAST(sum(CAST(json_extract(props, '$.' || k) AS INTEGER))
                    AS BIGINT) AS sum_v
        FROM (
          SELECT props, unnest(json_keys(props)) AS k
          FROM events WHERE props IS NOT NULL
        )
        GROUP BY k
    """,
)
def props_map_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "events")
        .where(F.col("props").isNotNull())
        .select(
            F.explode(F.from_json("props", "map<string,int>")).alias(
                "prop_key", "v"
            )
        )
        .groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("v").cast("bigint").alias("min_v"),
            F.max("v").cast("bigint").alias("max_v"),
            F.sum("v").cast("bigint").alias("sum_v"),
        )
    )

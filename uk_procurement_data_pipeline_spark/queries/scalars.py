"""Scalar-function batch (SURVEY.md §2.9 string/date rows F1-F12, F28,
plus P4/P5/P7 predicate forms, J4 filename↔content correlation pattern,
A7 min/max and A8 count-distinct gaps, and the J8 as-of join).

Every query here is a thin declarative projection — single scan, no
shuffle except where a groupBy is the point — so whole-stage codegen keeps
the entire expression chain JVM-side. The reference sites being
re-expressed are cited per-query (1a=1a_scrape_contracts_finder.py,
1b=1b_scrape_find_a_tender.py, 2a=2a_extract_contracts_finder.py,
2b=2b_extract_find_a_tender_XMLs.py in the reference repo).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.functions.exact import exact_sum, oracle_sum
from uk_procurement_data_pipeline_spark.queries.base import register

_MONTHS = [
    "January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December",
]
# F28 map-literal lookup (ref 1b:19-32 MONTH_NAMES dict)
_MONTH_MAP = "map(" + ", ".join(f"{i + 1}, '{m}'" for i, m in enumerate(_MONTHS)) + ")"
_D_MONTH_LIST = "[" + ", ".join(f"'{m}'" for m in _MONTHS) + "]"

# F11 ordinal English suffix (ref 2b:18-23 _ordinal), pure CASE expression
_ORDINAL_CASE = """CASE WHEN {d} % 100 IN (11, 12, 13) THEN 'th'
         WHEN {d} % 10 = 1 THEN 'st'
         WHEN {d} % 10 = 2 THEN 'nd'
         WHEN {d} % 10 = 3 THEN 'rd'
         ELSE 'th' END"""


@register(
    name="notice_labels",
    survey="F1 F2 F11 F12 F15 F28 A7",
    doc="Per order-date label construction: zero-pad (ref 1a:24), template "
    "format (ref 1a:23-37), ordinal day suffix (ref 2b:18-23), month name "
    "via map-literal lookup (ref 1b:19-32) AND date_format (ref 2b:457).",
    oracle=f"""
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               EXTRACT(year FROM o_orderdate) AS year,
               lpad(CAST(EXTRACT(month FROM o_orderdate) AS VARCHAR), 2, '0')
                   AS month_padded,
               printf('Contracts Finder Notices %02d %04d',
                      CAST(EXTRACT(month FROM o_orderdate) AS INT),
                      CAST(EXTRACT(year FROM o_orderdate) AS INT)) AS label,
               CAST(EXTRACT(day FROM o_orderdate) AS VARCHAR)
                   || {_ORDINAL_CASE.format(d="EXTRACT(day FROM o_orderdate)")}
                   AS day_ordinal,
               {_D_MONTH_LIST}[CAST(EXTRACT(month FROM o_orderdate) AS INT)]
                   AS month_name,
               monthname(o_orderdate) AS month_name_fmt,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY 1, 2, 3, 4, 5, 6, 7
    """,
)
def notice_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = "CAST(o_orderdate AS DATE)"
    return (
        load(spark, sf_dir, "orders")
        .selectExpr(
            f"date_format({d}, 'yyyy-MM-dd') AS order_date",
            f"CAST(year({d}) AS BIGINT) AS year",
            f"lpad(CAST(month({d}) AS STRING), 2, '0') AS month_padded",
            f"format_string('Contracts Finder Notices %02d %04d', month({d}), year({d}))"
            " AS label",
            f"concat(CAST(day({d}) AS STRING), "
            f"{_ORDINAL_CASE.format(d=f'day({d})')}) AS day_ordinal",
            f"element_at({_MONTH_MAP}, month({d})) AS month_name",
            f"date_format({d}, 'MMMM') AS month_name_fmt",
        )
        .groupBy(
            "order_date", "year", "month_padded", "label", "day_ordinal",
            "month_name", "month_name_fmt",
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    name="part_name_cleanup",
    survey="F3 F4 F5 F6 F7 F8 P7",
    doc="String-cleanup battery over part names: regexp id extraction (ref "
    "2a:63-72), translate sanitize (ref 1a:85-90), split-take-first (ref "
    "1a:140), case-insensitive prefix strip (ref 1a:142-143), upper/lower "
    "(ref 1a:129), trim+empty→null (ref 2b:9-10), conditional prefix "
    "normalization (ref 1a:133-136).",
    oracle="""
        SELECT p_partkey,
               CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS BIGINT) AS brand_num,
               translate(p_name, 'aeiou', '_____') AS sanitized,
               split_part(p_name, ' ', 1) AS first_word,
               regexp_replace(p_name, '^(?i)(small|large)\\s*', '') AS prefix_stripped,
               upper(p_type) AS type_upper,
               lower(p_brand) AS brand_lower,
               nullif(trim(regexp_replace(p_name, '[a-z ]', '', 'g')), '')
                   AS residue_or_null,
               CASE WHEN p_name LIKE 'red%' THEN 'color:' || p_name
                    ELSE p_name END AS norm_name
        FROM part
    """,
)
def part_name_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "part").selectExpr(
        "p_partkey",
        r"CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS BIGINT) AS brand_num",
        "translate(p_name, 'aeiou', '_____') AS sanitized",
        "substring_index(p_name, ' ', 1) AS first_word",
        r"regexp_replace(p_name, '^(?i)(small|large)\\s*', '') AS prefix_stripped",
        "upper(p_type) AS type_upper",
        "lower(p_brand) AS brand_lower",
        "nullif(trim(regexp_replace(p_name, '[a-z ]', '')), '') AS residue_or_null",
        "CASE WHEN p_name LIKE 'red%' THEN concat('color:', p_name)"
        " ELSE p_name END AS norm_name",
    )


@register(
    name="filename_date_keys",
    survey="J4 F4 F1 F2 O1 A7",
    doc="Filename↔content correlation (ref 2a:63-72 + 2a:189-205): "
    "construct the daily CSV filename a scrape would produce, then "
    "regexp-extract the (year, month, day) partition key back out of it "
    "and aggregate per derived key. The _metadata.file_path variant of J4 "
    "is exercised in tests/test_sources.py (the oracle cannot see Spark's "
    "file metadata).",
    oracle="""
        SELECT 'daily-notices-' || strftime(o_orderdate, '%Y-%m-%d') || '.csv'
                   AS filename,
               CAST(regexp_extract(
                   'daily-notices-' || strftime(o_orderdate, '%Y-%m-%d') || '.csv',
                   '(\\d{4})-(\\d{2})-(\\d{2})', 1) AS BIGINT) AS file_year,
               CAST(regexp_extract(
                   'daily-notices-' || strftime(o_orderdate, '%Y-%m-%d') || '.csv',
                   '(\\d{4})-(\\d{2})-(\\d{2})', 2) AS BIGINT) AS file_month,
               COUNT(*) AS n_rows
        FROM orders
        GROUP BY 1, 2, 3
    """,
)
def filename_date_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    fname = "concat('daily-notices-', date_format(o_orderdate, 'yyyy-MM-dd'), '.csv')"
    return (
        load(spark, sf_dir, "orders")
        .selectExpr(
            f"{fname} AS filename",
            rf"CAST(regexp_extract({fname}, '(\\d{{4}})-(\\d{{2}})-(\\d{{2}})', 1)"
            " AS BIGINT) AS file_year",
            rf"CAST(regexp_extract({fname}, '(\\d{{4}})-(\\d{{2}})-(\\d{{2}})', 2)"
            " AS BIGINT) AS file_month",
        )
        .groupBy("filename", "file_year", "file_month")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@register(
    name="part_category_case",
    survey="F9 F7 P4 P5",
    doc="Substring-containment CASE categorization (ref 2b:352-360) over a "
    "conjunctive contains+endswith filter (ref 1a:127-129 + 2a:58).",
    oracle="""
        SELECT p_partkey, p_name, p_type,
               CASE WHEN contains(lower(p_type), 'econ') THEN 'ECONOMY-CLASS'
                    WHEN contains(lower(p_type), 'small') THEN 'COMPACT'
                    WHEN contains(lower(p_type), 'standard') THEN 'STANDARD-CLASS'
                    ELSE 'OTHER' END AS category
        FROM part
        WHERE contains(p_name, 'e') AND lower(p_name) LIKE '%t'
    """,
)
def part_category_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.where(
        F.col("p_name").contains("e") & F.lower(F.col("p_name")).endswith("t")
    ).select(
        "p_partkey",
        "p_name",
        "p_type",
        F.when(F.lower(F.col("p_type")).contains("econ"), "ECONOMY-CLASS")
        .when(F.lower(F.col("p_type")).contains("small"), "COMPACT")
        .when(F.lower(F.col("p_type")).contains("standard"), "STANDARD-CLASS")
        .otherwise("OTHER")
        .alias("category"),
    )


@register(
    name="priority_stats_minmax",
    survey="A7 A8 F5",
    doc="Closes the A7 min/max and A8 exact count-distinct gaps: per "
    "priority class (split-take-first of the '1-URGENT' code, ref 1a:140), "
    "min/max/sum of order value and distinct-customer count. "
    "approx_count_distinct (HLL) is asserted within tolerance in "
    "tests/test_operators.py — sketches are not cross-engine comparable.",
    oracle=f"""
        SELECT split_part(o_orderpriority, '-', 1) AS priority_code,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               {oracle_sum("o_totalprice")} AS total_price,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders
        GROUP BY 1
    """,
)
def priority_stats_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.substring_index("o_orderpriority", "-", 1).alias("priority_code")
        )
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            exact_sum("o_totalprice", "total_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    name="brand_names_collected",
    survey="A1 A2 A3 P1 A7",
    doc="Table-level collect-to-delimited-list (the group-agg form of ref "
    "2a:147-150 pipe_join / 2b:13-15 _join_unique): per brand, the sorted "
    "FIRST-50 part names pipe-joined plus the distinct-sorted type list; "
    "null-dropping projection first (P1, ref 2a:222). The slice bounds the "
    "per-group state — an uncapped collect_list is a scale hazard when "
    "group sizes grow with data volume.",
    oracle="""
        SELECT p_brand,
               array_to_string(list_sort(list(p_name))[1:50], '|') AS names_pipe,
               array_to_string(list_sort(list_distinct(list(p_type))), ';')
                   AS types_uniq,
               COUNT(*) AS n_parts
        FROM part
        WHERE p_name IS NOT NULL
        GROUP BY p_brand
    """,
)
def brand_names_collected(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").isNotNull())
        .groupBy("p_brand")
        .agg(
            F.array_join(
                F.slice(F.array_sort(F.collect_list("p_name")), 1, 50), "|"
            ).alias("names_pipe"),
            F.array_join(F.sort_array(F.collect_set("p_type")), ";").alias(
                "types_uniq"
            ),
            F.count(F.lit(1)).alias("n_parts"),
        )
    )


@register(
    name="events_value_band_join",
    survey="J8 J5 A7 F28",
    doc="Range/interval join (the range half of SURVEY J8): events joined "
    "to a small value-band dimension on lo <= value < hi. The band table "
    "is broadcast, so the non-equi predicate never becomes a shuffled "
    "cross-product — the scale pattern for small interval dimensions "
    "(large interval tables would bucketize both sides to equi-keys).",
    oracle="""
        WITH bands AS (
            SELECT i AS band_id, i * 100.0 AS lo, (i + 1) * 100.0 AS hi
            FROM generate_series(0, 9) t(i))
        SELECT band_id, lo, hi,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY 1, 2, 3
    """,
)
def events_value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bands = spark.range(0, 10).selectExpr(
        "id AS band_id",
        "CAST(id * 100.0 AS DOUBLE) AS lo",
        "CAST((id + 1) * 100.0 AS DOUBLE) AS hi",
    )
    return (
        ev.join(
            F.broadcast(bands),
            (ev.value >= bands.lo) & (ev.value < bands.hi),
        )
        .groupBy("band_id", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@register(
    name="events_asof_value",
    survey="J8 W2 F15",
    doc="As-of join (SURVEY §2.3 J8): each 'click' event picks up the value "
    "of the most recent prior-or-same-instant 'purchase' by the same user, "
    "via the union + last(ignorenulls) window trick — one shuffle on "
    "user_id, no range cross-product. Ties broken by event_id, so the "
    "picked value is deterministic in both engines.",
    oracle="""
        WITH tagged AS (
            SELECT event_id, user_id, ts, value, event_type,
                   CASE WHEN event_type = 'purchase' THEN value END AS pv
            FROM events
            WHERE event_type IN ('click', 'purchase')),
        w AS (
            SELECT *,
                   LAST_VALUE(pv IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS asof_purchase_value
            FROM tagged)
        SELECT event_id, user_id, ts, value, asof_purchase_value
        FROM w WHERE event_type = 'click'
    """,
)
def events_asof_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .withColumn(
            "pv", F.when(F.col("event_type") == "purchase", F.col("value"))
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("asof_purchase_value", F.last("pv", ignorenulls=True).over(w))
        .where(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "value", "asof_purchase_value")
    )


@register(
    name="salted_status_spend",
    survey="A7 skew-salting",
    doc="Skew-safe aggregation (SURVEY §4.2 salting): total spend per order "
    "status — 3 distinct keys over the whole orders table, the shape that "
    "funnels one reducer per key. Runs through functions/skew.py "
    "salted_sum_count: (key, salt) partial aggregate then key final, both "
    "phases summing exact decimals, so the result is bit-identical to the "
    "direct groupBy the oracle computes (the salt is invisible to it).",
    oracle=f"""
        SELECT o_orderstatus,
               {oracle_sum('o_totalprice')} AS sum_value,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus
    """,
)
def salted_status_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from uk_procurement_data_pipeline_spark.functions.skew import salted_sum_count

    return salted_sum_count(
        load(spark, sf_dir, "orders"),
        key="o_orderstatus",
        value="o_totalprice",
        salt_n=32,
    )

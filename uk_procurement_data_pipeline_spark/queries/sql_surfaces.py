"""Spark 4 SQL-surface queries: pipe syntax, parameterized SQL, GROUP BY
ALL, session variables, and SQL scripting (SURVEY.md §2.13 extended).

The reference repo (qmanhbeo/uk-procurement-data-pipeline) drives all of
its analytics through imperative pandas scripts; the Spark-first
re-expression exposes the same computations through the engine's
DECLARATIVE surfaces so that Catalyst owns the physical strategy. This
module exercises the four SQL-language features new in (or idiomatic to)
Spark 4 that the rest of the catalog does not yet cover:

- **SQL pipe syntax** (``FROM t |> WHERE … |> AGGREGATE``): purely
  syntactic — parses to the same logical plan as the ANSI form, so the
  100 TB posture is identical to the classic GROUP BY (partial + final
  hash agg after a pushed-down scan filter).
- **Parameterized SQL** (named ``:param`` markers bound via
  ``spark.sql(sql, args=…)``): binding happens at parse time, so the
  bound literals constant-fold and push down exactly like inline
  literals — no plan-cache poisoning, no string interpolation.
- **GROUP BY ALL / ORDER BY ALL**: resolver sugar; DuckDB implements the
  identical clause, so the oracle runs the *same SQL text*.
- **SQL session variables** (``DECLARE`` / ``SET VAR``): the variable is
  resolved to a literal during analysis, so the consuming query's filter
  still pushes to the parquet scan.
- **SQL scripting** (``BEGIN … END`` with ``WHILE``): procedural control
  flow executed on the driver, each statement a normal distributed
  query. The integer-doubling loop below is pure BIGINT arithmetic, so a
  DuckDB RECURSIVE CTE replays it exactly.

Exactness discipline: money doubles quantize to integer cents with the
blessed ``CAST(ROUND(x * 100) AS BIGINT)`` pattern before any SUM (the
per-row double products are bit-identical across engines — IEEE * and -
only), all sums are BIGINT, the only doubles emitted are ratios of those
integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(f"{t}_sqs")


@register(
    name="pipe_syntax_returnflag_revenue",
    survey="A7 P4 O2 F15",
    doc="1995 net revenue by (returnflag, linestatus) written in Spark 4 "
    "SQL pipe syntax: FROM |> WHERE |> EXTEND |> AGGREGATE … GROUP BY "
    "|> ORDER BY. Pipe syntax is parse-level sugar — the logical plan is "
    "the same pushed-scan-filter + partial/final hash aggregate as the "
    "ANSI form the oracle runs, so the 100 TB shape is unchanged: one "
    "shuffle on the 6-cell group key, map-side combine does almost all "
    "the work. Cents quantized per row before the BIGINT sum.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
)
def pipe_syntax_returnflag_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM lineitem_sqs
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01'
             AND l_shipdate < TIMESTAMP '1996-01-01'
        |> EXTEND CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT) AS net_cents
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_items,
                     SUM(net_cents) AS revenue_cents
             GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


@register(
    name="parameterized_sql_priority_band",
    survey="A7 P4 F16",
    doc="Order counts and cents by priority for a (status, date-band) "
    "given as NAMED PARAMETERS — spark.sql(sql, args={'status': 'F', "
    "…}) with :marker syntax, the injection-safe alternative to string "
    "interpolation. Parameters bind at parse time and constant-fold, so "
    "the date filter still pushes to the parquet scan (PushedFilters "
    "shows the timestamp bounds) — at 100 TB this is what makes the "
    "partition-pruned scan possible where a driver-side f-string would "
    "invite both injection and plan-cache misses. The oracle inlines the "
    "same constants.",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_orderstatus = 'F'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def parameterized_sql_priority_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   AS total_cents
        FROM orders_sqs
        WHERE o_orderstatus = :status
          AND o_orderdate >= CAST(:lo AS TIMESTAMP)
          AND o_orderdate < CAST(:hi AS TIMESTAMP)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        args={"status": "F", "lo": "1996-01-01", "hi": "1997-01-01"},
    )


# GROUP BY ALL / ORDER BY ALL: both engines implement the clause, so the
# SAME text runs on Spark and DuckDB — the strongest possible oracle
# pairing (any drift is engine semantics, not query-translation error).
_GROUP_BY_ALL_SQL = """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM {tbl}
    GROUP BY ALL
    ORDER BY ALL
"""


@register(
    name="group_by_all_year_status",
    survey="A7 F15 O2",
    doc="Yearly order profile by status using GROUP BY ALL + ORDER BY "
    "ALL — the resolver infers the grouping keys (every non-aggregate "
    "select item) and the total order. Sugar only: the optimized plan "
    "is the standard two-phase hash aggregate on (year, status), and "
    "the year() projection prunes the scan to two columns. DuckDB "
    "supports the identical clause, so the oracle is the same SQL text "
    "modulo the view name.",
    oracle=_GROUP_BY_ALL_SQL.format(tbl="orders"),
)
def group_by_all_year_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(_GROUP_BY_ALL_SQL.format(tbl="orders_sqs"))


@register(
    name="session_variable_threshold_filter",
    survey="A7 A8 P4",
    doc="Two-statement session-variable flow (Spark 4 DECLARE / SET "
    "VAR): statement 1 computes the mean order value in cents into a "
    "BIGINT variable; statement 2 counts above-mean orders per "
    "priority, referencing the variable. The variable resolves to a "
    "literal during analysis, so the consuming filter is an ordinary "
    "pushable predicate — the pattern replaces the collect()-then-"
    "f-string round trip with engine-managed state and zero driver "
    "parsing. AVG over exact BIGINT cents divides once in IEEE double "
    "(identical in DuckDB), then rounds back to BIGINT. Oracle: same "
    "two steps as a scalar subquery.",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_above
        FROM orders
        WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) >
              (SELECT CAST(ROUND(AVG(CAST(ROUND(o_totalprice * 100)
                                          AS BIGINT))) AS BIGINT)
               FROM orders)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def session_variable_threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    spark.sql("DECLARE OR REPLACE VARIABLE sqs_avg_cents BIGINT")
    spark.sql(
        """
        SET VAR sqs_avg_cents =
            (SELECT CAST(ROUND(AVG(CAST(ROUND(o_totalprice * 100)
                                        AS BIGINT))) AS BIGINT)
             FROM orders_sqs)
        """
    )
    return spark.sql(
        """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_above
        FROM orders_sqs
        WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > sqs_avg_cents
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    name="sql_scripting_doubling_threshold",
    survey="A7 F13 U1",
    doc="SQL scripting block (Spark 4 BEGIN…END): DECLARE three "
    "variables, read MAX order cents into one, then a WHILE loop "
    "doubles a 10,000-cent threshold until it clears the max, counting "
    "doublings; the final SELECT reports the step count, the terminal "
    "threshold, and how many orders exceed a quarter of it. Control "
    "flow runs on the driver; every statement inside is a normal "
    "distributed query (the loop itself is pure BIGINT driver "
    "arithmetic — ~25 iterations max for any int64 value, never "
    "data-sized). The oracle replays the identical integer recurrence "
    "as a DuckDB RECURSIVE CTE, so procedural-vs-recursive equivalence "
    "is itself under test. Registered eager: the script executes during "
    "fn().",
    eager=True,
    oracle="""
        WITH RECURSIVE mx AS (
          SELECT MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                     AS max_cents
          FROM orders
        ), dbl(thr, steps) AS (
          SELECT CAST(10000 AS BIGINT), 0
          UNION ALL
          SELECT thr * 2, steps + 1 FROM dbl, mx
          WHERE thr < mx.max_cents
        ), fin AS (
          SELECT thr, steps FROM dbl ORDER BY steps DESC LIMIT 1
        )
        SELECT CAST(steps AS BIGINT) AS n_doublings,
               CAST(thr AS BIGINT) AS final_thr_cents,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
                 WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT)
                       > fin.thr / 4) AS n_above_quarter
        FROM fin
    """,
)
def sql_scripting_doubling_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        BEGIN
          DECLARE max_cents BIGINT;
          DECLARE thr BIGINT DEFAULT 10000;
          DECLARE steps INT DEFAULT 0;
          SET max_cents = (SELECT MAX(CAST(ROUND(o_totalprice * 100)
                                           AS BIGINT))
                           FROM orders_sqs);
          WHILE thr < max_cents DO
            SET thr = thr * 2;
            SET steps = steps + 1;
          END WHILE;
          SELECT CAST(steps AS BIGINT) AS n_doublings,
                 thr AS final_thr_cents,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM orders_sqs
                   WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT)
                         > thr / 4) AS n_above_quarter;
        END
        """
    )


@register(
    name="collated_ci_group_counts",
    survey="A7 F7 F28",
    doc="Case-insensitive grouping via Spark 4 STRING COLLATION "
    "(collate(name, 'UNICODE_CI')) — the engine-level alternative to "
    "lower()-normalization that keeps the ORIGINAL strings flowing "
    "through the plan. Part names are mixed-cased deterministically "
    "(md5-parity rows uppercased), then grouped under the CI collation; "
    "the emitted representative is MIN(original) (binary min) because "
    "the collated group key itself is an arbitrary member — never "
    "output a collated key raw if the result must be engine-portable. "
    "For ASCII data UNICODE_CI equality == lower() equality, which is "
    "exactly what the DuckDB oracle groups by. Collation is a "
    "comparator swap inside the same hash-aggregate plan — no extra "
    "shuffle, same pushdown.",
    oracle="""
        WITH mixed AS (
          SELECT CASE WHEN CAST('0x' || substr(md5(CAST(p_partkey AS
                            VARCHAR)), 1, 8) AS BIGINT) % 2 = 0
                      THEN upper(p_name) ELSE p_name END AS name
          FROM part
        )
        SELECT MIN(name) AS rep_name,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM mixed
        GROUP BY lower(name)
        ORDER BY rep_name
    """,
)
def collated_ci_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part")
    return spark.sql(
        """
        WITH mixed AS (
          SELECT CASE WHEN CAST(conv(substr(md5(CAST(p_partkey AS
                            STRING)), 1, 8), 16, 10) AS BIGINT) % 2 = 0
                      THEN upper(p_name) ELSE p_name END AS name
          FROM part_sqs
        )
        SELECT MIN(name) AS rep_name,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM mixed
        GROUP BY collate(name, 'UNICODE_CI')
        ORDER BY rep_name
        """
    )


@register(
    name="sql_udf_net_revenue",
    survey="A7 UD4 F28",
    doc="Declarative SQL UDFs (Spark 4 CREATE TEMPORARY FUNCTION ... "
    "RETURN <expr>): a scalar UDF net_cents(price, discount) and a SQL "
    "TABLE function year_band(lo, hi) RETURNS TABLE ... RETURN SELECT, "
    "composed in one query. Unlike Python UDFs these are pure Catalyst "
    "expressions after inlining — predicate pushdown, codegen and "
    "column pruning all survive, which makes them THE way to package "
    "reusable business logic at 100 TB (the Python UDF pages of this "
    "repo are for logic that genuinely needs Python). The oracle "
    "expands both bodies inline — the check certifies that function "
    "resolution + inlining is semantically a no-op.",
    oracle="""
        SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * 100) AS BIGINT)) AS BIGINT)
                   AS net_cents_sum
        FROM lineitem l
        WHERE year(l.l_shipdate) BETWEEN 1996 AND 1998
        GROUP BY year(l.l_shipdate)
        ORDER BY ship_year
    """,
)
def sql_udf_net_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_cents(
            price DOUBLE, discount DOUBLE) RETURNS BIGINT
        RETURN CAST(ROUND(price * (1 - discount) * 100) AS BIGINT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION year_band(lo INT, hi INT)
        RETURNS TABLE (ship_year BIGINT, net_cents BIGINT)
        RETURN SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
                      net_cents(l_extendedprice, l_discount) AS net_cents
               FROM lineitem_sqs
               WHERE year(l_shipdate) BETWEEN lo AND hi
        """
    )
    return spark.sql(
        """
        SELECT ship_year,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               SUM(net_cents) AS net_cents_sum
        FROM year_band(1996, 1998)
        GROUP BY ship_year
        ORDER BY ship_year
        """
    )

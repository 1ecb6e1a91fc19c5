"""Column profiling — the data-quality summary a pipeline runs before
trusting a new drop ([NORTH-STAR]; the Deequ / Great-Expectations
"profile then assert" pattern, and the engine-side form of the
reference's manual eyeballing of daily files).

Two scans total: one aggregate computes every column's null count and
typed min/max (stringified only at the edge for the uniform output
schema); a second keyed pass over stacked (column, value) pairs yields
each column's mode (ties broken by the value string, set-deterministic)
AND its distinct count — so no multi-count_distinct aggregate and no
Expand-multiplied input. Shapes: the stats row is a single
partial+final aggregate; the value pass shuffles once on
(column, value) — high-cardinality keys, linear in table size — then
once on the bounded column domain for the argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from uk_procurement_data_pipeline_spark.catalog import load
from uk_procurement_data_pipeline_spark.queries.base import register

_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")


def _duck_stats(c: str) -> str:
    return f"""
        SELECT '{c}' AS column_name,
               COUNT(*) - COUNT({c}) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value
        FROM orders"""


def _duck_mode(c: str) -> str:
    return f"""
        SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS value,
               COUNT(*) AS cnt
        FROM orders WHERE {c} IS NOT NULL
        GROUP BY {c}"""


@register(
    name="profile_orders_columns",
    survey="A7 A8 W1 U1",
    doc="Per-column profile of orders (nulls, distinct, min/max, mode): "
    "two scans total — one aggregate for nulls + typed min/max "
    "(stack()ed into per-column rows; count_distinct is kept OUT of it "
    "because multi-distinct aggregates plan an Expand that multiplies "
    "input by the column count), and one stacked (column, value) "
    "keyed count that yields both the mode argmax and the distinct "
    "counts. Output one row per profiled column — the bounded-domain "
    "summary a quality gate asserts against.",
    oracle=f"""
        WITH stats AS ({" UNION ALL ".join(_duck_stats(c) for c in _COLS)}),
        vals AS ({" UNION ALL ".join(_duck_mode(c) for c in _COLS)}),
        modes AS (
            SELECT column_name, value AS top_value, cnt AS top_count
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY column_name
                      ORDER BY cnt DESC, value) AS rk FROM vals)
            WHERE rk = 1)
        SELECT s.column_name, s.n_nulls, s.n_distinct,
               s.min_value, s.max_value, m.top_value, m.top_count
        FROM stats s JOIN modes m USING (column_name)
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    # Stats scan: one aggregate with nulls + typed min/max per column —
    # deliberately NO count_distinct here: several count_distincts in one
    # aggregate plan an Expand (input rows multiplied by the column
    # count); distinct counts instead fall out of the mode pass below,
    # which already groups by (column, value). stack() pivots the single
    # wide row into one row per column.
    one = orders.agg(
        *[
            e
            for c in _COLS
            for e in (
                (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
                F.min(c).cast("string").alias(f"{c}__min"),
                F.max(c).cast("string").alias(f"{c}__max"),
            )
        ]
    )
    stats = one.selectExpr(
        f"stack({len(_COLS)}, "
        + ", ".join(
            f"'{c}', `{c}__nulls`, `{c}__min`, `{c}__max`" for c in _COLS
        )
        + ") AS (column_name, n_nulls, min_value, max_value)"
    )
    # Value scan: each row stacks into (column, value) pairs map-side,
    # then ONE (column, value) shuffle feeds both the mode argmax and the
    # per-column distinct counts (count of groups).
    vals = (
        orders.selectExpr(
            f"stack({len(_COLS)}, "
            + ", ".join(f"'{c}', CAST({c} AS STRING)" for c in _COLS)
            + ") AS (column_name, value)"
        )
        .where(F.col("value").isNotNull())
        .groupBy("column_name", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("column_name").orderBy(
        F.col("cnt").desc(), F.col("value")
    )
    modes = (
        vals.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_distinct",
            F.count(F.lit(1)).over(Window.partitionBy("column_name")),
        )
        .where(F.col("rk") == 1)
        .select(
            "column_name",
            "n_distinct",
            F.col("value").alias("top_value"),
            F.col("cnt").alias("top_count"),
        )
    )
    return stats.join(F.broadcast(modes), "column_name").select(
        "column_name",
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
        "top_value",
        "top_count",
    )

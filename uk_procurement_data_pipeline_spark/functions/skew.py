"""Skew mitigation primitives (SURVEY.md §4.2 / north-star "salting for
skew").

AQE's skew-join handling covers joins; pathological AGGREGATION keys (one
key holding a large share of all rows) still funnel one reducer. Salting
splits each key into ``salt_n`` sub-groups for the partial aggregate and
re-combines — two small shuffles instead of one hot one. Only algebraic
aggregates (sum/count/min/max and anything with a merge function) can be
salted this way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key: str | Column,
    value: str | Column,
    salt_n: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase skew-safe groupBy: (key, salt) partial -> key final.

    The salt is random-per-row but the result is exact AND
    salt-assignment-independent: values are summed as wide decimals in
    both phases (see functions/exact.py), which merge associatively with
    no float rounding, then rounded/cast to double once at the end.
    """
    from uk_procurement_data_pipeline_spark.functions.exact import _OUT_SCALE, dec

    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_n).cast("int"))
    # Both phases sum exact decimals (functions/exact.py contract): double
    # addition is non-associative, so float partials could differ in low
    # bits depending on row-to-salt assignment. Decimal partials merge
    # exactly; the round+double cast happens once, in the final phase —
    # bit-identical to exact_sum over an unsalted groupBy.
    partial = salted.groupBy(k.alias("__key"), F.col("__salt")).agg(
        F.sum(dec(v)).alias("__psum"), F.count(F.lit(1)).alias("__pcnt")
    )
    return partial.groupBy("__key").agg(
        F.round(F.sum("__psum"), _OUT_SCALE).cast("double").alias(sum_alias),
        F.sum("__pcnt").alias(count_alias),
    ).withColumnRenamed("__key", key if isinstance(key, str) else "key")

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

    The salt is random-per-row but the result is exact: sum/count are
    algebraic, so partial results merge associatively regardless of how
    rows were split.
    """
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_n).cast("int"))
    partial = salted.groupBy(k.alias("__key"), F.col("__salt")).agg(
        F.sum(v).alias("__psum"), F.count(F.lit(1)).alias("__pcnt")
    )
    return partial.groupBy("__key").agg(
        F.sum("__psum").alias(sum_alias), F.sum("__pcnt").alias(count_alias)
    ).withColumnRenamed("__key", key if isinstance(key, str) else "key")

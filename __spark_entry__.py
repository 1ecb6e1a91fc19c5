"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

This file is a thin shim; the real catalog lives in
``uk_procurement_data_pipeline_spark/queries/`` (one QuerySpec per
operator from SURVEY.md §2, each pairing the PySpark program with its
DuckDB oracle SQL).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from uk_procurement_data_pipeline_spark.queries import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    revenue_by_region: lineitem⋈orders⋈customer⋈nation⋈region with
    broadcast dims, exact revenue per region (SURVEY.md §7 Phase 0).
    """
    return registry()["revenue_by_region"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted -> rows-only check."""
    return {
        name: spec.oracle for name, spec in registry().items() if spec.oracle is not None
    }

"""Fixture-table catalog (TESTDATA.md / FIXTURES.md §A).

The driver's tables live as one parquet file per table under
/root/testdata/sf{0.001,0.01,0.1}/. Schemas are declared here so reads
fail fast on drift instead of silently inferring (SURVEY.md §1.2: the
reference has no declared schema anywhere — the engine always does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions that should always be broadcast in joins (SURVEY.md §2.3 J5).
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from an sf directory."""
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; known: {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register fixture tables as temp views (for spark.sql-based queries)."""
    for name in tables or TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)

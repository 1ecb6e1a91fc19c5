"""Custom connector via the Python Data Source API (Spark 4,
pyspark.sql.datasource) — the modern way to add a first-class
``spark.read.format(...)`` source in pure Python, replacing ad-hoc
driver-side row fabrication.

The reference ingests a paginated remote notice feed
(1_extract_ocds_api.py's requests loop); its Spark-native shape is a
DataSource whose ``partitions()`` carries one InputPartition per page so
EXECUTORS fetch pages in parallel — the planner sees a real table with a
declared schema, and downstream pruning/aggregation compose as usual.
Here the feed is a deterministic synthetic page server (the md5 hash
family replaces the network), which makes the whole connector
oracle-checkable: DuckDB can regenerate every row from generate_series
with the same md5 arithmetic and must aggregate to identical results.

Scale posture: rows are produced per-partition on executors (nothing is
materialized on the driver), partition count is an option, and the
generator is O(rows/partition) memory via a plain Python iterator.
"""

from __future__ import annotations

import hashlib
from datetime import date, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_EPOCH = date(2024, 1, 1)


def _h(tag: str, i: int) -> int:
    """The repo's cross-engine hash draw: int of the md5 hex prefix."""
    return int(hashlib.md5(f"{tag}-{i}".encode()).hexdigest()[:15], 16)


def feed_row(i: int) -> tuple[int, str, int, date]:
    """Row ``i`` of the synthetic notice feed (pure function of i)."""
    return (
        i,
        _REGIONS[_h("nfr", i) % 5],
        _h("nfa", i) % 10_000_000,
        _EPOCH + timedelta(days=_h("nfd", i) % 365),
    )


class _Page(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class NoticeFeedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n", 1000))
        self.pages = int(options.get("pages", 8))

    def partitions(self):
        per = -(-self.n // self.pages)  # ceil
        return [
            _Page(p * per, min((p + 1) * per, self.n))
            for p in range(self.pages)
            if p * per < self.n
        ]

    def read(self, partition: _Page):
        for i in range(partition.start, partition.end):
            yield feed_row(i)


class NoticeFeedDataSource(DataSource):
    """``spark.read.format("notice_feed").option("n", ...).load()``."""

    @classmethod
    def name(cls) -> str:
        return "notice_feed"

    def schema(self) -> str:
        return (
            "notice_id bigint, region string, amount_cents bigint,"
            " published date"
        )

    def reader(self, schema) -> NoticeFeedReader:
        return NoticeFeedReader(self.options)


def register_notice_feed(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(NoticeFeedDataSource)

"""Custom connector via the Python Data Source API (Spark 4,
pyspark.sql.datasource) — the modern way to add a first-class
``spark.read.format(...)`` source in pure Python, replacing ad-hoc
driver-side row fabrication.

The reference ingests a paginated remote notice feed
(1_extract_ocds_api.py's requests loop); its Spark-native shape is a
DataSource whose ``partitions()`` carries one InputPartition per page so
EXECUTORS fetch pages in parallel — the planner sees a real table with a
declared schema, and downstream pruning/aggregation compose as usual.
The same source also exposes a STREAMING face through
``SimpleDataSourceStreamReader``: offsets are page cursors, ``read``
advances one page per micro-batch, and ``readBetweenOffsets`` replays
any offset range deterministically (exactly the replay contract a
checkpoint recovery needs). Here the feed is a deterministic synthetic
page server (the md5 hash family replaces the network), which makes the
whole connector oracle-checkable: DuckDB can regenerate every row from
generate_series with the same md5 arithmetic and must aggregate to
identical results.

Scale posture: rows are produced per-partition on executors (nothing is
materialized on the driver), partition count is an option, and the
generator is O(rows/partition) memory via a plain Python iterator.

PICKLING NOTE: every class below is defined inside a factory closure, so
cloudpickle serializes them BY VALUE. Module-level classes would pickle
by reference and break on executors whose Python path lacks this repo
(the driver contract only guarantees sys.path on the DRIVER).
"""

from __future__ import annotations


def _build():
    import hashlib
    from datetime import date, timedelta

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    epoch = date(2024, 1, 1)

    def h(tag: str, i: int) -> int:
        return int(hashlib.md5(f"{tag}-{i}".encode()).hexdigest()[:15], 16)

    def row(i: int):
        return (
            i,
            regions[h("nfr", i) % 5],
            h("nfa", i) % 10_000_000,
            epoch + timedelta(days=h("nfd", i) % 365),
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

        def read(self, partition):
            for i in range(partition.start, partition.end):
                yield row(i)

    class NoticeFeedStreamReader(SimpleDataSourceStreamReader):
        """Finite paged stream: each micro-batch advances one page; when
        the cursor reaches n the offset stops moving, so
        trigger(availableNow=True) drains the feed and terminates."""

        def __init__(self, options: dict) -> None:
            self.n = int(options.get("n", 1000))
            self.page = int(options.get("page_rows", 250))

        def initialOffset(self):
            return {"cursor": 0}

        def read(self, start):
            s = int(start["cursor"])
            e = min(s + self.page, self.n)
            return iter([row(i) for i in range(s, e)]), {"cursor": e}

        def readBetweenOffsets(self, start, end):
            return iter(
                [row(i) for i in range(int(start["cursor"]), int(end["cursor"]))]
            )

    class NoticeFeedDataSource(DataSource):
        """``spark.read.format("notice_feed")`` (batch) and
        ``spark.readStream.format("notice_feed")`` (streaming)."""

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

        def simpleStreamReader(self, schema) -> NoticeFeedStreamReader:
            return NoticeFeedStreamReader(self.options)

    return NoticeFeedDataSource, row


NoticeFeedDataSource, feed_row = _build()


def register_notice_feed(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(NoticeFeedDataSource)

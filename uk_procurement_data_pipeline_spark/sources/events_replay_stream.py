"""Deterministic streaming replay of a parquet table via the Python
DataSource STREAMING API (SURVEY.md §2.10 ST5 — the incremental-ingest
loop of the reference (2b:502-509) as a first-class streaming source
rather than availableNow over a file directory).

    spark.dataSource.register(EventsReplayDataSource)
    s = (spark.readStream.format("events_replay")
         .option("path", ".../events.parquet")
         .option("batch_rows", "5000").load())

Offsets are ROW POSITIONS into the parquet file in its on-disk order, so
every run yields byte-identical micro-batches — the property that makes
a replay source usable for deterministic streaming tests and for
backfill-vs-live equivalence checks. `read(start)` serves the next
batch_rows slice and advances the offset; `readBetweenOffsets` re-serves
any committed slice exactly (the crash-recovery contract).

Scale posture: SimpleDataSourceStreamReader is the DRIVER-side simple
API — right for tests and modest-rate replays; a production-rate source
would implement the partitioned DataSourceStreamReader instead, same
offset model, executor-side reads. The parquet file is opened lazily
per batch via pyarrow and only the requested row slice materializes.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


class EventsReplayStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("events_replay requires .option('path', ...)")
        self.batch_rows = int(options.get("batch_rows", "5000"))
        # order=disk (default): on-disk row order — monotone ts for the
        # events fixture, so no late data ever occurs. order=scramble:
        # a DETERMINISTIC permutation (rows sorted by md5 of the key
        # column's string form, ties by position) — makes event time
        # genuinely out-of-order so watermark late-drop semantics are
        # exercised, while staying byte-identical across runs/engines
        # (the oracle regenerates the same permutation in SQL). The key is
        # addressed BY NAME (option scramble_key, default event_id) so a
        # parquet column reorder can't silently change the permutation out
        # from under the oracle's md5(CAST(event_id AS VARCHAR)) contract.
        self.order = options.get("order", "disk")
        self.scramble_key = options.get("scramble_key", "event_id")
        self._table = None  # lazy; the reader object must pickle cheaply

    def _rows(self):
        if self._table is None:
            import pyarrow.parquet as pq

            t = pq.read_table(self.path)
            if self.order == "scramble":
                import hashlib

                keys = t.column(self.scramble_key).to_pylist()
                perm = sorted(
                    range(len(keys)),
                    key=lambda i: (
                        hashlib.md5(str(keys[i]).encode()).hexdigest(),
                        i,
                    ),
                )
                t = t.take(perm)
            self._table = t
        return self._table

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API)
        return {"pos": 0}

    def _slice(self, start: int, end: int) -> list[tuple]:
        # A LIST, not a generator: Spark caches the prefetched batch for
        # replay (datasource_internal.getCache copies the entries), so the
        # returned records must be materialized and picklable.
        t = self._rows().slice(start, max(0, end - start))
        out: list[tuple] = []
        for batch in t.to_batches():
            out.extend(zip(*(col.to_pylist() for col in batch.columns)))
        return out

    def read(self, start: dict) -> tuple:
        pos = start["pos"]
        n = self._rows().num_rows
        end = min(pos + self.batch_rows, n)
        if end == pos:
            # Drained. Spark's prefetch wrapper (datasource_internal.py
            # add_result_to_cache) probes a non-advancing batch with
            # next(it) and expects StopIteration — hand it a true
            # iterator, not a list, or every post-drain latestOffset
            # raises TypeError and kills the stream before the trailing
            # no-data (watermark/timer) micro-batch can run.
            return iter(()), {"pos": pos}
        return self._slice(pos, end), {"pos": end}

    def readBetweenOffsets(  # noqa: N802 (Spark API)
        self, start: dict, end: dict
    ) -> list[tuple]:
        return self._slice(start["pos"], end["pos"])

    def commit(self, end: dict) -> None:
        pass  # offsets are positions into an immutable file — nothing to do


class EventsReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "events_replay"

    def schema(self) -> str:
        return EVENTS_SCHEMA

    def simpleStreamReader(  # noqa: N802 (Spark API)
        self, schema
    ) -> EventsReplayStreamReader:
        return EventsReplayStreamReader(self.options)

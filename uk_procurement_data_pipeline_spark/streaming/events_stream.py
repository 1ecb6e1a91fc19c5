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

"""Structured Streaming surface (SURVEY.md §2.10 ST1-ST5)."""

from uk_procurement_data_pipeline_spark.streaming.events_stream import (
    read_events_stream,
    session_counts,
    stream_dedup,
    windowed_counts,
)

__all__ = [
    "read_events_stream",
    "session_counts",
    "stream_dedup",
    "windowed_counts",
]

"""Structured Streaming surface.

The reference has NO streaming runtime (SURVEY.md §2.14) — even its
billion-row hourly table is batch. This module is the forward-looking
extension for the events stream: the same windowed/sessionized
aggregations the batch queries compute, expressed as an incremental
plan with watermarked late-data handling. Batch/stream parity is the
design invariant — `windowed_event_counts` on a static frame equals
the streaming result after all data arrives (tested in
tests/test_streaming.py).
"""

from pudl_spark.streaming.pipeline import (
    interval_join_stream, read_events_stream, sessionize_stream,
    user_running_stats_stream, windowed_event_counts,
)
from pudl_spark.streaming.stateful import running_user_totals

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "sessionize_stream",
    "interval_join_stream",
    "running_user_totals",
    "user_running_stats_stream",
]

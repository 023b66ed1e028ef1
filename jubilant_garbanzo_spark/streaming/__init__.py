"""Structured Streaming engine surface (SURVEY.md §2b "Streaming").

Replaces the reference's DStream pipeline (``main.scala:41-58``) with
event-time Structured Streaming: watermarks, tumbling/sliding/session
windows, streaming dedup, stream-static joins, foreachBatch sinks.
Batch and streaming share the same DataFrame transformations — the
upgrade path the Structured Streaming paper designed (PAPERS.md).
"""

from jubilant_garbanzo_spark.streaming.runner import (
    read_events_stream,
    run_available_now,
)

__all__ = ["read_events_stream", "run_available_now"]

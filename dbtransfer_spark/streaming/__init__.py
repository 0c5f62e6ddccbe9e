"""Structured Streaming path: incremental sync + event-time aggregation.

The reference's incremental story is batch resume (checkpoint watermark,
SURVEY.md §2.6 R5-R7). The streaming twin continuously tails a source and
upserts micro-batches through the same idempotent sinks, with Spark's own
checkpointLocation replacing the JSON checkpoint file.
"""

from dbtransfer_spark.streaming.incremental import (
    incremental_sync,
    sessionized_stream,
    windowed_stream,
)

__all__ = ["incremental_sync", "windowed_stream", "sessionized_stream"]

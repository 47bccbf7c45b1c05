"""Streaming sessionization via Spark's NATIVE ``session_window``
aggregation — gap-based session windows maintained as first-class
streaming state (start = first event, end = last event + gap; windows
MERGE while events land closer than the gap).

This is the one stateful-aggregation shape the rest of the streaming
surface doesn't exercise: the foreachBatch maintainers own their state
in an external store, while session windows live in Spark's state
store, merge across micro-batches, and EMIT on watermark passage
(append mode finalizes a session only once the event-time watermark
passes ``session.end`` — the guarantee that no straggler can reopen
it).

Batch/stream parity is structural: ``session_stats`` is one expression
used by both (``relational.user_sessions`` is the registered batch
twin with its gaps-and-islands DuckDB oracle); the pin in
tests/test_streaming.py replays a file stream with a watermark-pushing
sentinel and asserts the emitted sessions EQUAL the batch result.

Reference scope: the reference has no session concept (fixed windows
only, mapper.go window/count); sessionization is part of the
beyond-reference streaming surface.

100 TB notes: state is keyed by (user_id), sharded by the shuffle;
per-key state is the OPEN sessions only — closed sessions leave state
at watermark, so state size tracks concurrent activity, not history.
The session merge is associative, so partial merges happen map-side
per micro-batch before the keyed exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Shared batch/stream sessionization expression: per (user,
    session-window) event count and value total. The value total is a
    sum of RAW 2-dp values rounded to 2 dp — boundary-free, so batch
    and stream merge orders cannot disagree on the rounded result."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp("w.start").alias("session_start_s"),
            F.unix_timestamp("w.end").alias("session_end_s"),
            "n_events",
            "session_value",
        )
    )


def start_session_agg(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
    available_now: bool = True,
):
    """Run the streaming sessionization end-to-end, appending CLOSED
    sessions to a parquet sink. Append mode + watermark is the
    finalize-once contract: a session row is written exactly once, when
    the watermark passes its end. Returns the StreamingQuery."""
    out = session_stats(events_stream, gap, watermark)
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

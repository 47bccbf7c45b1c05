"""Streaming click->purchase attribution: a watermarked STREAM-STREAM
interval join — the one Structured Streaming join shape the rest of the
streaming surface (stateful maintainers, foreachBatch sinks) doesn't
exercise. Every purchase joins all clicks by the same user in the
trailing ``window_s`` seconds:

    clicks.ts <= purchases.ts AND clicks.ts >= purchases.ts - window_s

Both sides carry event-time watermarks, so Spark bounds the join state:
a buffered click can be dropped once the purchase watermark passes
click.ts + window_s (the range condition gives the planner the state
eviction bound — an UNBOUNDED stream-stream join would otherwise buffer
both streams forever; see the Structured Streaming programming guide's
inner-join-with-time-range recipe).

Semantics pin (tests/test_streaming.py): for data fully inside the
watermark, the streaming result EQUALS the batch join with the same
predicate — stream==batch, the same contract every other streaming op
here carries.

Reference scope: the reference has no stream-stream join (its single
pipeline is map/window/reduce over one subscription, mapper.go /
reducer.go); this is part of the beyond-reference streaming surface.

100 TB notes: the join state is user-bucketed by the equality key, so
it shards across executors; state size is bounded by click volume per
watermark horizon, not history. Watermark delay trades completeness
(late clicks) for state: both are knobs here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window_s: int = 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Build the watermarked stream-stream (or batch-batch: the same
    expression works on static frames, which is how the stream==batch
    pin replays it) attribution join. Inputs carry
    (event_id, user_id, ts [, value]); output is one row per
    (purchase, preceding click within the window) pair."""
    c = (
        clicks.select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"interval {window_s} seconds")
        ),
    )
    return joined.select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def start_attribution_join(
    clicks_stream: DataFrame,
    purchases_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window_s: int = 3600,
    watermark: str = "10 minutes",
    available_now: bool = True,
):
    """Run the attribution join end-to-end, appending matched pairs to
    a parquet sink (append is the only mode a stream-stream inner join
    supports). Returns the StreamingQuery."""
    out = attribution_join(
        clicks_stream, purchases_stream, window_s, watermark
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

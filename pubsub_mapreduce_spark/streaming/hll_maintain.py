"""Streaming HLL maintenance: keep per-group distinct-count sketches
current over an unbounded stream by UNIONING each micro-batch's
DataSketches HLL into a stored sketch table — the streaming face of
``sketches.hll_daily_rollup``'s mergeability contract, with the same
batch-id ledger as ``ingest_dedup``/``sketch_maintain`` so replayed
batches are no-ops (effectively-once).

Exactness of the merge: an HLL register array is a per-bucket MAX of
rank observations — associative and commutative — so the union of
per-batch sketches has IDENTICAL registers to one sketch built over
the whole stream, regardless of how the data was batched (pinned
stream==batch in tests/test_streaming.py at estimate level; sketch
BYTES may differ across sparse/dense representations, estimates
cannot). That is the whole point of mergeable sketches at 100TB:
ingest maintains |groups| kilobyte rows incrementally, and any later
batch query (``hll_overlap_check``-style intersections, rollups over
arbitrary group subsets) unions stored sketches without ever
rescanning the stream's history.

Why a stored table and not stream state: same rationale as the CMS
grid — the sketch table is |groups| bounded rows that downstream batch
queries read directly; each batch does ONE |groups|-sized exchange
plus a sketches-sized read-merge-overwrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .store import (
    store_committed,
    store_exists,
    store_read,
    store_write,
)


class HllMaintain:
    """foreachBatch handler owning the stored (group, sketch) table."""

    def __init__(
        self,
        store_dir: str,
        key: str = "user_id",
        group: str = "event_type",
        lg_k: int = 12,
    ):
        self.sk_dir = os.path.join(store_dir, "sketches")
        self.ledger_dir = os.path.join(store_dir, "ledger")
        self.key = key
        self.group = group
        self.lg_k = lg_k

    def _seen(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self.ledger_dir, f"{batch_id}.done"))

    def _mark(self, batch_id: int) -> None:
        os.makedirs(self.ledger_dir, exist_ok=True)
        with open(os.path.join(self.ledger_dir, f"{batch_id}.done"), "w") as f:
            f.write("")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if self._seen(batch_id):
            return
        if store_committed(self.sk_dir, batch_id):
            # crash landed between the pointer flip and the ledger mark
            # (ADVICE r4): the batch is already inside the committed
            # snapshot — re-merging would double-count; just re-mark.
            self._mark(batch_id)
            return
        spark = batch.sparkSession
        delta = batch.groupBy(self.group).agg(
            F.hll_sketch_agg(self.key, F.lit(self.lg_k)).alias("sketch")
        )
        if store_exists(self.sk_dir):
            old = store_read(spark, self.sk_dir)
            merged = (
                old.unionByName(delta)
                .groupBy(self.group)
                .agg(
                    F.hll_union_agg("sketch", F.lit(False)).alias("sketch")
                )
            )
        else:
            merged = delta
        # |groups|-sized materialization; the versioned store commits the
        # snapshot atomically (pointer flip), so a crash mid-write leaves
        # the previous snapshot live and the unmarked batch replays clean
        store_write(
            spark, merged.collect(), merged.schema, self.sk_dir, batch_id
        )
        self._mark(batch_id)


def estimates(spark, store_dir: str, group: str = "event_type") -> DataFrame:
    """Current distinct-count estimates from the maintained table."""
    return store_read(spark, os.path.join(store_dir, "sketches")).select(
        group,
        F.hll_sketch_estimate("sketch").alias("approx_distinct"),
    )


def start_hll_maintain(
    events_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Wire an event stream into the HLL maintenance loop. Returns the
    StreamingQuery; the live sketch table lives under
    ``store_dir/sketches``."""
    writer = (
        events_stream.writeStream.foreachBatch(HllMaintain(store_dir, **kwargs))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def wau_estimates(
    spark, store_dir: str, window_days: int = 7
) -> DataFrame:
    """Rolling active-user estimates from a DAY-keyed maintained
    sketch table (run ``start_hll_maintain`` with
    ``group="day"`` over a stream decorated with
    ``to_date(ts).cast("string")``): WAU(D) = estimate of the UNION of
    the trailing ``window_days`` day-sketches — the streaming
    counterpart of ``relational.rolling_wau``. Sliding distinct counts
    are not decomposable exactly, but HLL unions are lossless at the
    register level, so the estimate for any window equals the estimate
    of one sketch built over the window's raw events — the maintained
    table answers ANY trailing window without rescanning history,
    which is the whole point at 100TB (exact WAU costs a
    |users x days|-sized pass per refresh; this is |days| kilobyte
    rows). Report days clamp at the table's max day."""
    from pyspark.sql.functions import broadcast

    sk = store_read(spark, os.path.join(store_dir, "sketches")).select(
        F.to_date("day").alias("day"), "sketch"
    )
    mx = sk.agg(F.max("day").alias("__mx"))
    ex = sk.select(
        "sketch",
        F.explode(
            F.expr(
                f"sequence(day, date_add(day, {window_days - 1}),"
                " interval 1 day)"
            )
        ).alias("d"),
    ).join(broadcast(mx), F.col("d") <= F.col("__mx"))
    return (
        ex.groupBy("d")
        .agg(F.hll_union_agg("sketch", F.lit(False)).alias("u"))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.hll_sketch_estimate("u").alias("wau_est"),
        )
    )

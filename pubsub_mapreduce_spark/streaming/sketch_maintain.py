"""Streaming sketch maintenance: keep a count-min sketch current over
an unbounded event stream by MERGING each micro-batch's grid into a
stored cells table — the streaming face of ``sketches.cms_build``'s
mergeability contract (cells add), with the same batch-id ledger as
``ingest_dedup`` so replayed batches are no-ops (effectively-once).

Why a stored table and not stream state: the sketch is depth x width
CELLS regardless of stream length — a bounded relation that downstream
batch queries (heavy-hitter probes, drift monitors) read directly,
with no stateful-operator coupling. Each batch does ONE constant-size
exchange (the batch grid) plus a cells-sized read-merge-overwrite; at
scale the store is a single tiny file per version.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import cms_build
from .store import (
    store_committed,
    store_exists,
    store_read,
    store_write,
)


class CmsMaintain:
    """foreachBatch handler owning the stored (d, cell, cnt) grid."""

    def __init__(
        self,
        store_dir: str,
        key: str = "user_id",
        depth: int = 4,
        width: int = 256,
    ):
        self.cells_dir = os.path.join(store_dir, "cells")
        self.ledger_dir = os.path.join(store_dir, "ledger")
        self.key = key
        self.depth = depth
        self.width = width

    def _seen(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self.ledger_dir, f"{batch_id}.done"))

    def _mark(self, batch_id: int) -> None:
        os.makedirs(self.ledger_dir, exist_ok=True)
        with open(os.path.join(self.ledger_dir, f"{batch_id}.done"), "w") as f:
            f.write("")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if self._seen(batch_id):
            return
        if store_committed(self.cells_dir, batch_id):
            # crash landed between the pointer flip and the ledger mark
            # (ADVICE r4): the batch is already inside the committed
            # snapshot — re-merging would double-count; just re-mark.
            self._mark(batch_id)
            return
        spark = batch.sparkSession
        delta = cms_build(
            batch, key=self.key, depth=self.depth, width=self.width
        )
        if store_exists(self.cells_dir):
            old = store_read(spark, self.cells_dir)
            merged = (
                old.unionByName(delta)
                .groupBy("d", "cell")
                .agg(F.sum("cnt").alias("cnt"))
            )
        else:
            merged = delta
        # cells-sized materialization (<= depth*width rows); the
        # versioned store commits atomically so a crash mid-write cannot
        # destroy the accumulated grid (see streaming/store.py)
        store_write(
            spark, merged.collect(), merged.schema, self.cells_dir, batch_id
        )
        self._mark(batch_id)


def start_cms_maintain(
    events_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Wire an event stream into the CMS maintenance loop. Returns the
    StreamingQuery; the live grid lives under ``store_dir/cells``."""
    writer = (
        events_stream.writeStream.foreachBatch(CmsMaintain(store_dir, **kwargs))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

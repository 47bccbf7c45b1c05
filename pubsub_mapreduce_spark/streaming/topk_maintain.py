"""Streaming top-k heavy hitters: maintain a per-group Space-Saving
summary (Metwally et al. 2005, "Efficient computation of frequent and
top-k elements in data streams") over an unbounded stream — the
bounded-state answer to "top pages / top buyers per event type, ever"
when exact per-key counts would be |keys|-sized state.

Batched merge discipline (the micro-batch adaptation): each batch is
reduced to EXACT per-(group, key) delta counts first (one map-side
combinable aggregate — the only data-sized step), then merged into the
stored K-counter summary:

- tracked keys add their delta;
- untracked keys enter PESSIMISTICALLY at ``delta + m`` with
  ``err = m``, where m is the group's current minimum tracked count
  (0 while the summary is under capacity) — the Space-Saving
  replace-the-min rule, batched;
- the union is cut back to the top K by (count desc, key asc).

Invariants (pinned in tests/test_streaming.py):

- OVERCOUNT ONLY: reported cnt >= true count >= cnt - err, because a
  key is only ever dropped while its true total is <= the surviving
  minimum m, and m is monotone non-decreasing (every candidate at cut
  time carries cnt >= previous m), so re-insertion at ``delta + m``
  covers everything the key could have accumulated before.
- HEAVY HITTERS SURVIVE: any key with true frequency > N/K cannot sit
  below the cut (the K survivors would otherwise all exceed N/K,
  summing past N) — the classic Space-Saving guarantee, preserved by
  the batched merge.

State is |groups| x K rows — dimension-sized, so the read-merge-write
cycle rides the same crash-safe versioned store (pointer flip,
``streaming/store.py``) and batch-id ledger (replayed batches are
no-ops) as the CMS/HLL/histogram maintainers.

Reference scope note: the reference engine maintains only windowed
COUNTS (reducer.go) — top-k-ever with bounded state is part of the
beyond-reference training-pipeline surface (e.g. "which domains
dominate the crawl" during ingest).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .store import (
    store_committed,
    store_exists,
    store_read,
    store_write,
)


class TopKMaintain:
    """foreachBatch handler owning the stored (group, key, cnt, err)
    Space-Saving summary table."""

    def __init__(
        self,
        store_dir: str,
        key: str = "user_id",
        group: str = "event_type",
        k: int = 8,
    ):
        self.tk_dir = os.path.join(store_dir, "topk")
        self.ledger_dir = os.path.join(store_dir, "ledger")
        self.key = key
        self.group = group
        self.k = k

    def _seen(self, batch_id: int) -> bool:
        return os.path.exists(
            os.path.join(self.ledger_dir, f"{batch_id}.done")
        )

    def _mark(self, batch_id: int) -> None:
        os.makedirs(self.ledger_dir, exist_ok=True)
        with open(
            os.path.join(self.ledger_dir, f"{batch_id}.done"), "w"
        ) as f:
            f.write("")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if self._seen(batch_id):
            return
        if store_committed(self.tk_dir, batch_id):
            # crash landed between the pointer flip and the ledger mark
            # (ADVICE r4): the batch is already inside the committed
            # snapshot — re-merging would double-count; just re-mark.
            self._mark(batch_id)
            return
        spark = batch.sparkSession
        zl = F.lit(0).cast("long")
        delta = (
            batch.groupBy(
                F.col(self.group).alias("g"),
                F.col(self.key).cast("string").alias("k"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("d_cnt"))
        )
        if store_exists(self.tk_dir):
            state = store_read(spark, self.tk_dir)
            # group minimum applies only at capacity: below K counters
            # nothing was ever dropped, so unseen keys enter exactly
            mins = state.groupBy("g").agg(
                F.min("cnt").alias("m_raw"),
                F.count(F.lit(1)).alias("nk"),
            )
            cand = (
                state.join(delta, ["g", "k"], "full_outer")
                .join(mins, "g", "left")
                .select(
                    "g",
                    "k",
                    F.when(
                        F.col("cnt").isNotNull(),
                        F.col("cnt") + F.coalesce("d_cnt", zl),
                    )
                    .otherwise(
                        F.col("d_cnt")
                        + F.when(
                            F.col("nk") >= self.k, F.col("m_raw")
                        ).otherwise(zl)
                    )
                    .alias("cnt"),
                    F.when(F.col("err").isNotNull(), F.col("err"))
                    .otherwise(
                        F.when(
                            F.col("nk") >= self.k, F.col("m_raw")
                        ).otherwise(zl)
                    )
                    .alias("err"),
                )
            )
        else:
            cand = delta.select(
                "g", "k", F.col("d_cnt").alias("cnt"), zl.alias("err")
            )
        w = Window.partitionBy("g").orderBy(
            F.col("cnt").desc(), F.col("k").asc()
        )
        merged = (
            cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= self.k)
            .drop("__rn")
        )
        # |groups| x K rows — dimension-sized by construction
        store_write(
            spark, merged.collect(), merged.schema, self.tk_dir, batch_id
        )
        self._mark(batch_id)


def topk(spark, store_dir: str) -> DataFrame:
    """The maintained summary with its deterministic bounds:
    cnt_lo <= true count <= cnt (cnt_lo = cnt - err)."""
    w = Window.partitionBy("g").orderBy(
        F.col("cnt").desc(), F.col("k").asc()
    )
    return (
        store_read(spark, os.path.join(store_dir, "topk"))
        .select(
            F.col("g").alias("group"),
            F.col("k").alias("key"),
            "cnt",
            (F.col("cnt") - F.col("err")).alias("cnt_lo"),
            F.row_number().over(w).cast("int").alias("rank"),
        )
    )


def start_topk_maintain(
    events_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Wire an event stream into the top-k maintenance loop. Returns
    the StreamingQuery; the summary lives under ``store_dir/topk``."""
    writer = (
        events_stream.writeStream.foreachBatch(
            TopKMaintain(store_dir, **kwargs)
        ).option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

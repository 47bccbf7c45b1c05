"""Streaming histogram maintenance: keep per-(group, bucket) value
counts current over an unbounded stream by ADDING each micro-batch's
bucket counts into a stored histogram table — the streaming face of
``sketches.fixed_width_histogram`` / ``approx_quantile_check``'s
mergeable-histogram contract, with the same batch-id ledger as
``ingest_dedup`` / ``sketch_maintain`` / ``hll_maintain`` so replayed
batches are no-ops (effectively-once).

Exactness of the merge: bucket counts are plain integer sums —
associative, commutative, and (unlike HLL registers, which are exact
only at the estimate level) the maintained table is BIT-EQUAL to the
histogram built over the whole stream in one batch pass, under ANY
batching (pinned stream==batch in tests/test_streaming.py). That makes
this the strongest member of the maintain family: downstream quantile /
drift / SLA queries read a |groups| x |buckets| table instead of
rescanning history, and their answers are exactly what the batch
engine would have computed at the same bucket resolution.

Why a stored table and not stream state: same rationale as the CMS
grid and the HLL table — the histogram is a bounded small relation
(value domain / width buckets per group) that batch queries join
directly; each micro-batch does ONE |groups x buckets|-sized exchange
plus a read-merge-overwrite of that table.

Reference parity: the reference's only windowed statistic is the
partial count (mapreduce/mapper.go T4/T5); this extends the same
merge-partials idea (counts are mergeable) to full value histograms.
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


def _bucket(value_col: str, width_cents: int) -> F.Column:
    """Cents-exact bucketing shared by the batch and stream forms:
    round-half-even cents (Spark ``round`` on *100 — the same form
    value_p50_check validated cross-engine) then integer-divide into
    ``width_cents`` buckets."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (cents - (cents % width_cents)) / width_cents


class HistogramMaintain:
    """foreachBatch handler owning the stored (group, bucket, cnt)
    histogram table."""

    def __init__(
        self,
        store_dir: str,
        value: str = "value",
        group: str = "event_type",
        width_cents: int = 100,
    ):
        self.hist_dir = os.path.join(store_dir, "histogram")
        self.ledger_dir = os.path.join(store_dir, "ledger")
        self.value = value
        self.group = group
        self.width_cents = width_cents

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
        if store_committed(self.hist_dir, batch_id):
            # crash landed between the pointer flip and the ledger mark
            # (ADVICE r4): the batch is already inside the committed
            # snapshot — re-merging would double-count; just re-mark.
            self._mark(batch_id)
            return
        spark = batch.sparkSession
        delta = (
            batch.select(
                F.col(self.group).alias("g"),
                _bucket(self.value, self.width_cents)
                .cast("long")
                .alias("bucket"),
            )
            .groupBy("g", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        if store_exists(self.hist_dir):
            old = store_read(spark, self.hist_dir)
            merged = (
                old.unionByName(delta)
                .groupBy("g", "bucket")
                .agg(F.sum("cnt").cast("long").alias("cnt"))
            )
        else:
            merged = delta
        # bounded |groups x buckets| materialization; the versioned store
        # commits atomically so a crash mid-write cannot destroy the
        # accumulated histogram (see streaming/store.py)
        store_write(
            spark, merged.collect(), merged.schema, self.hist_dir, batch_id
        )
        self._mark(batch_id)


def histogram(spark, store_dir: str) -> DataFrame:
    """The maintained (g, bucket, cnt) table."""
    return store_read(spark, os.path.join(store_dir, "histogram"))


def quantile_estimates(spark, store_dir: str, q2: int = 1) -> DataFrame:
    """Bucket-resolution quantile per group from the maintained table:
    the smallest bucket whose cumulative count reaches the target rank
    (``q2``/2 quantile — 1 = median), the same lower-median rule as
    ``approx_quantile_check``'s exact side, computed entirely from the
    stored histogram (no history rescans)."""
    h = histogram(spark, store_dir)
    cum = h.select(
        "g",
        "bucket",
        F.sum("cnt")
        .over(Window.partitionBy("g").orderBy("bucket"))
        .alias("cum"),
        F.sum("cnt").over(Window.partitionBy("g")).alias("tot"),
    )
    return (
        cum.where(2 * F.col("cum") >= q2 * F.col("tot"))
        .groupBy("g")
        .agg(F.min("bucket").alias("quantile_bucket"))
    )


def start_histogram_maintain(
    events_stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Wire an event stream into the histogram maintenance loop.
    Returns the StreamingQuery; the live table lives under
    ``store_dir/histogram``."""
    writer = events_stream.writeStream.foreachBatch(
        HistogramMaintain(store_dir, **kwargs)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drift_alarms(
    spark, store_dir: str, baseline: DataFrame, threshold: float = 0.25
) -> DataFrame:
    """Drift monitor on the maintained table: per-group total-variation
    distance between the CURRENT histogram and a frozen baseline
    (g, bucket, cnt) snapshot, plus an alarm verdict — the
    streaming-side consumer the maintain loop exists for. A batch
    pipeline freezes the baseline once (e.g. the histogram at model-
    training time); each later call compares live ingest against it
    without rescanning any history.

    Same integer discipline as ``sketches.histogram_drift``: the TV
    numerator is sum |n_base*c_cur - n_cur*c_base| over the unioned
    bucket spine — exact int64 — divided once by 2*n_cur*n_base under
    round_half_up. Groups missing from either side carry no defined
    distance and are dropped by the integer n>0 predicates."""
    from ..functions.text import round_half_up

    z = F.lit(0).cast("long")
    cur = histogram(spark, store_dir).select(
        "g", "bucket", F.col("cnt").alias("c_cur")
    )
    base = baseline.select("g", "bucket", F.col("cnt").alias("c_base"))
    joined = (
        cur.join(base, ["g", "bucket"], "full_outer")
        .select(
            "g",
            F.coalesce("c_cur", z).alias("c_cur"),
            F.coalesce("c_base", z).alias("c_base"),
        )
    )
    per_g = (
        joined.groupBy("g")
        .agg(
            F.sum("c_cur").cast("long").alias("n_cur"),
            F.sum("c_base").cast("long").alias("n_base"),
        )
    )
    return (
        joined.join(per_g, "g")
        .where((F.col("n_cur") > 0) & (F.col("n_base") > 0))
        .groupBy("g", "n_cur", "n_base")
        .agg(
            F.sum(
                F.abs(
                    F.col("n_base") * F.col("c_cur")
                    - F.col("n_cur") * F.col("c_base")
                )
            )
            .cast("long")
            .alias("tv_num")
        )
        .select(
            "g",
            "n_cur",
            "n_base",
            "tv_num",
            round_half_up(
                F.col("tv_num") / (2 * F.col("n_cur") * F.col("n_base")), 6
            ).alias("tv"),
        )
        .withColumn("alarm", F.col("tv") > F.lit(threshold))
    )

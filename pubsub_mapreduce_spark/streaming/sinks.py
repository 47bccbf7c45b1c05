"""Sinks: the reference's device-config push (K2) re-expressed as a
``foreachBatch`` writer with bounded retry, plus emit-on-change (T8).

K2 (reducer.go:91-133): base64(JSON) pushed to a device config endpoint,
retried up to 10x with 100ms backoff, skippable via a flag. Here the
endpoint is injectable (tests pass a recording callable); the retry
loop, encoding, and skip toggle are faithful.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_RETRIES = 10  # reducer.go:24
RETRY_WAIT_S = 0.1  # reducer.go:25


def encode_device_config(df: DataFrame, value_col: str = "cnt") -> DataFrame:
    """The K2 wire format: base64(JSON({mps, total})) (reducer.go:101-111).
    Input: long-format (id, <value_col>) rows — ``cnt`` from the rate
    stream or ``total`` from the running-total stream; output: one
    payload row. Re-densification to the array shape happens here at the
    wire edge only (SURVEY.md section 1.4)."""
    pairs = df.agg(
        F.array_sort(F.collect_list(F.struct("id", value_col))).alias("p"),
        F.sum(value_col).alias("total"),
    )
    # a global agg over an empty batch still yields one row (null total);
    # map it to a null payload so the sink's idle suppression fires
    return pairs.select(
        F.when(
            F.col("total").isNotNull(),
            F.base64(
                F.to_json(
                    F.struct(
                        F.transform("p", lambda s: s[value_col]).alias("mps"),
                        F.col("total"),
                    )
                ).cast("binary")
            ),
        ).alias("payload")
    )


class DeviceConfigSink:
    """foreachBatch writer with K2's bounded-retry push and T8's
    emit-on-change suppression (reducer.go:92-98: skip when total is
    unchanged)."""

    def __init__(
        self,
        push: Callable[[str], None],
        skip: bool = False,  # the -skip-iot flag (reducer.go:71-74)
        max_retries: int = MAX_RETRIES,
        retry_wait_s: float = RETRY_WAIT_S,
        value_col: str = "cnt",  # "total" when fed by running_total_stream
        ledger_dir: str | None = None,
    ):
        self.value_col = value_col
        self.push = push
        self.skip = skip
        self.max_retries = max_retries
        self.retry_wait_s = retry_wait_s
        self._last_payload: str | None = None
        self.ledger_dir = ledger_dir

    def _committed(self, batch_id: int) -> bool:
        import os

        if self.ledger_dir is None:
            return False
        return os.path.exists(os.path.join(self.ledger_dir, f"{batch_id}.done"))

    def _commit(self, batch_id: int) -> None:
        import os

        if self.ledger_dir is None:
            return
        os.makedirs(self.ledger_dir, exist_ok=True)
        with open(os.path.join(self.ledger_dir, f"{batch_id}.done"), "w") as f:
            f.write("1")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        """Spark's checkpoint makes the STATE exactly-once, but after a
        crash the last unacknowledged micro-batch is REDELIVERED to
        foreachBatch (same batch_id) — and a restarted sink instance has
        lost its in-memory ``_last_payload``, so without a durable
        guard the side effect duplicates. ``ledger_dir`` persists one
        marker file per pushed batch_id: a replayed batch becomes a
        no-op, upgrading the push to effectively-once. The marker lands
        AFTER the push — a crash in between re-pushes (the unavoidable
        at-least-once window without a transactional endpoint; the
        reference has the same window between publish and ack,
        reducer.go:119-133)."""
        if self.skip:
            return
        if self._committed(batch_id):
            return  # replayed batch after restart: side effect already done
        rows = encode_device_config(batch_df, self.value_col).collect()
        if not rows or rows[0]["payload"] is None:
            return  # empty batch: nothing to push (T8 idle suppression)
        payload = rows[0]["payload"]
        if payload == self._last_payload:
            return  # T8: unchanged -> no push
        last_err: Exception | None = None
        for _ in range(self.max_retries):
            try:
                self.push(payload)
                self._last_payload = payload
                self._commit(batch_id)
                return
            except Exception as e:  # bounded retry, reducer.go:119-126
                last_err = e
                time.sleep(self.retry_wait_s)
        raise RuntimeError(
            f"device config push failed after {self.max_retries} retries"
        ) from last_err

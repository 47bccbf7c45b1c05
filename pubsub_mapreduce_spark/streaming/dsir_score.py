"""Streaming DSIR scoring: ingest-time data selection. Incoming
document micro-batches are scored against a STATIC hashed-n-gram bucket
model (``sampling.dsir_model``, built once from the reference corpus)
and appended to a parquet store under a batch-id ledger — the same
effectively-once pattern as ``ingest_dedup`` / ``vector_search``.

Stream == batch by construction: each micro-batch runs the SAME
``sampling.dsir_score`` plan the batch operator uses, against the same
persisted model, so the scores are pinned exactly equal to a batch
re-score of the union of all ingested documents
(tests/test_streaming.py::test_dsir_stream_matches_batch_scores).

Scale notes: the model is |buckets|-sized (an index constant) and rides
as a broadcast into every batch; per-batch work is one token explode +
one doc-keyed aggregate — no state store growth, no corpus rescans.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.sampling import dsir_model, dsir_score


class DsirScorer:
    """foreachBatch handler holding the static bucket model."""

    def __init__(
        self,
        reference_docs: DataFrame,
        out_dir: str,
        target_lang: str = "en",
        n_buckets: int = 256,
    ):
        self.model = dsir_model(reference_docs, target_lang, n_buckets).persist()
        self.model.count()  # materialize once at wiring time
        self.n_buckets = n_buckets
        self.out_dir = os.path.join(out_dir, "scores")
        self.ledger_dir = os.path.join(out_dir, "ledger")

    def _seen(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self.ledger_dir, f"{batch_id}.done"))

    def _mark(self, batch_id: int) -> None:
        os.makedirs(self.ledger_dir, exist_ok=True)
        with open(os.path.join(self.ledger_dir, f"{batch_id}.done"), "w") as f:
            f.write("")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if self._seen(batch_id):
            return
        out = dsir_score(batch, self.model, self.n_buckets)
        out.write.mode("append").parquet(self.out_dir)
        self._mark(batch_id)


def score_stream(
    docs_stream: DataFrame,
    reference_docs: DataFrame,
    out_dir: str,
    checkpoint: str,
    target_lang: str = "en",
    n_buckets: int = 256,
):
    """Wire a document stream through the DSIR scorer; returns the
    started StreamingQuery (availableNow trigger — drain-and-stop)."""
    handler = DsirScorer(reference_docs, out_dir, target_lang, n_buckets)
    return (
        docs_stream.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

"""Streaming vector search: incoming query vectors answered per
micro-batch against a STATIC IVF+PQ index — the online serving face of
the batch ANN family (the retrieval lookup an embedding-based dedup or
RAG ingest runs as data arrives).

The index (centroid literals, PQ codebook, and the (vec_id, cid,
codes) relation) is built ONCE at wiring time and persisted in memory;
each micro-batch runs the SAME ``ivfpq_search`` the batch operator
uses — one definition, one semantics, so stream results are pinned
EXACTLY equal to the batch operator on the same queries. Results
append to a parquet store under a batch-id ledger (effectively-once,
the ingest_dedup pattern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import _as_double, build_ivfpq_index, ivfpq_search


class VectorSearch:
    """foreachBatch handler holding the static index."""

    def __init__(
        self,
        corpus_emb: DataFrame,
        out_dir: str,
        k: int = 5,
        nprobe: int = 5,
    ):
        self.cents, self.seeds, assigned = build_ivfpq_index(corpus_emb)
        # the stored index: materialized once, reread per batch from
        # memory — at scale this is a bucketed-by-cid warehouse table
        self.assigned = assigned.persist()
        self.assigned.count()
        self.out_dir = os.path.join(out_dir, "results")
        self.ledger_dir = os.path.join(out_dir, "ledger")
        self.k = k
        self.nprobe = nprobe

    def _seen(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self.ledger_dir, f"{batch_id}.done"))

    def _mark(self, batch_id: int) -> None:
        os.makedirs(self.ledger_dir, exist_ok=True)
        with open(os.path.join(self.ledger_dir, f"{batch_id}.done"), "w") as f:
            f.write("")

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if self._seen(batch_id):
            return
        queries = _as_double(batch, "q_emb").select("query_id", "q_emb")
        out = ivfpq_search(
            queries,
            self.cents,
            self.seeds,
            self.assigned,
            k=self.k,
            nprobe=self.nprobe,
        )
        out.write.mode("append").parquet(self.out_dir)
        self._mark(batch_id)


def start_vector_search(
    queries_stream: DataFrame,
    corpus_emb: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Wire a (query_id, q_emb) stream against the static corpus index.
    Returns the StreamingQuery; results land under
    ``out_dir/results``."""
    writer = (
        queries_stream.writeStream.foreachBatch(
            VectorSearch(corpus_emb, out_dir, **kwargs)
        ).option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

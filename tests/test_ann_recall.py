"""ANN quality gates: approximate top-k must actually find the
neighbors (recall vs the exact brute force). These floors caught a real
bug — single-table 8-bit LSH measured 2% recall before the multi-table
OR-amplification rewrite (88-97% across SFs)."""

from __future__ import annotations

from pubsub_mapreduce_spark.operators.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
)


def pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_lsh_recall_floor(tables):
    emb = tables["embeddings"]
    exact = pairs(cosine_topk(emb, k=5, every=50))
    got = pairs(ann_lsh_topk(emb, k=5, every=50))
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, f"multi-table LSH recall {recall:.2f} < 0.8"


def test_ivf_recall_floor(tables):
    emb = tables["embeddings"]
    exact = pairs(cosine_topk(emb, k=5, every=50))
    got = pairs(ann_ivf_topk(emb, k=5, every=50))
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall:.2f} < 0.9"

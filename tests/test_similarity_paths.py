"""The two brute-force top-k formulations — JVM HOF per-pair scoring vs
Arrow/Pandas-UDF BLAS matmul — must produce the SAME ranking (they
compute the same cosine, only the summation strategy differs)."""

from __future__ import annotations

from pubsub_mapreduce_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_matmul,
)


def test_matmul_topk_matches_hof(tables):
    emb = tables["embeddings"]
    hof = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in cosine_topk(emb, k=5, every=50).collect()
    }
    mat = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in cosine_topk_matmul(emb, k=5, every=50).collect()
    }
    assert hof.keys() == mat.keys()
    for key, (n_hof, s_hof) in hof.items():
        n_mat, s_mat = mat[key]
        assert n_mat == n_hof, (key, n_hof, n_mat)
        assert abs(s_mat - s_hof) < 1e-9, (key, s_hof, s_mat)

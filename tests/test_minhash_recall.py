"""MinHash-LSH quality floors vs the exact n-gram Jaccard ground truth
(sf0.01, same threshold): precision is 1.0 BY CONSTRUCTION (candidates
are exact-Jaccard-verified inside the operator), so the test pins what
the hash/banding choices can actually move — candidate recall."""

from __future__ import annotations

import pytest

from pubsub_mapreduce_spark.io import load_tables
from pubsub_mapreduce_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)

from conftest import SF_MED


@pytest.fixture(scope="module")
def docs_med(spark):
    return load_tables(spark, SF_MED)["documents"]


def test_minhash_lsh_recall_floor_and_exact_precision(spark, docs_med):
    exact = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs_med).collect()}
    got = {(r["a"], r["b"]): r["jaccard"] for r in minhash_lsh_pairs(docs_med).collect()}
    assert exact, "ground truth must be non-empty"
    # precision: every emitted pair is a true pair with the exact score
    assert set(got) <= set(exact)
    for pair, j in got.items():
        assert j == exact[pair]
    # recall floor: 16x4-bit banding at threshold 0.5 should catch ~all
    assert len(got) / len(exact) >= 0.9

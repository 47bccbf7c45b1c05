"""connected_components must equal a driver-side union-find ground truth
(small SF), including chain transitivity the single-link keeper misses."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
)
from pubsub_mapreduce_spark.operators.similarity import embedding_near_pairs


def union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def test_components_match_union_find_on_chain(spark):
    # a 6-node chain + a triangle + an isolated pair: forces >1 iteration
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (11, 12), (10, 12), (20, 21)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == union_find(edges)
    assert got[6] == 1  # full chain collapsed to its min id


def test_dedup_clusters_match_union_find_on_fixture(spark, tables):
    # exact pair source: closure must equal union-find over ALL pairs
    pairs = embedding_near_pairs(tables["embeddings"], threshold=0.4)
    edges = [(r["a"], r["b"]) for r in pairs.collect()]
    got = {
        r["doc_id"]: r["component"]
        for r in dedup_clusters(
            tables["embeddings"], threshold=0.4, pair_source="exact"
        ).collect()
    }
    assert got == union_find(edges)


def test_dedup_clusters_lsh_default_matches_lsh_edges(spark, tables):
    # the DEFAULT (LSH-bucketed) pair source: closure must equal
    # union-find over exactly the LSH-surfaced edges — same transitive
    # semantics, approximate edge set
    from pubsub_mapreduce_spark.operators.similarity import lsh_near_pairs

    pairs = lsh_near_pairs(tables["embeddings"], threshold=0.4)
    edges = [(r["a"], r["b"]) for r in pairs.collect()]
    assert edges, "LSH pair source vacuously empty at threshold 0.4"
    got = {
        r["doc_id"]: r["component"]
        for r in dedup_clusters(tables["embeddings"], threshold=0.4).collect()
    }
    assert got == union_find(edges)


def test_distributed_loop_matches_driver_union_find(spark):
    """Force the distributed min-label loop (max_driver_edges=0) and pin
    it label-identical to the driver union-find path on a graph that
    needs multiple propagation rounds."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 8),
             (10, 11), (11, 12), (10, 12), (20, 21), (30, 31), (31, 32)]
    df = spark.createDataFrame(edges, "a long, b long")
    dist = {
        r["doc_id"]: r["component"]
        for r in connected_components(df, max_driver_edges=0).collect()
    }
    drv = {
        r["doc_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert dist == drv == union_find(edges)


def test_bloom_prefilter_superset_and_tight(spark):
    """bloom_decontaminate's candidate stage must pass every truly
    contaminated doc (no false negatives, by Bloom construction) and,
    at the default sizing, admit ~no false positives on the fixtures.
    Output equality with the exact form is the oracle-parity test's
    job; this pins the PREFILTER's two claims directly."""
    from pubsub_mapreduce_spark.io import load_tables
    from pubsub_mapreduce_spark.operators.textops import (
        bloom_decontaminate,
        ngram_decontaminate,
    )
    from tests.conftest import SF_MED

    docs = load_tables(spark, SF_MED)["documents"]
    train = docs.where(F.col("source") != "src0")
    bench = docs.where(F.col("source") == "src0")
    exact = {
        r["doc_id"] for r in ngram_decontaminate(train, bench).collect()
    }
    got = {r["doc_id"] for r in bloom_decontaminate(train, bench).collect()}
    assert got == exact
    # tiny filter -> real false positives, still zero false negatives
    # and output values still exact (FPs die in the verify join)
    small = {
        r["doc_id"]
        for r in bloom_decontaminate(
            train, bench, m_bits=1 << 10, k_hashes=3
        ).collect()
    }
    assert small == exact

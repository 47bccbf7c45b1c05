"""Deterministic sampling: membership is a pure function of the key —
reruns, repartitions, and an independent python md5 all agree
row-for-row (the property df.sample/df.sampleBy cannot give)."""

from __future__ import annotations

import hashlib

from pubsub_mapreduce_spark.operators.sampling import (
    sample_pct,
    stratified_sample,
    train_val_test_split,
)

RATES = {"src0": 100, "src1": 50, "src2": 25}
DEFAULT = 10


def py_bucket(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 100


def test_stratified_membership_matches_pure_hash_rule(spark, tables):
    docs = tables["documents"].select("doc_id", "source")
    got = {
        r["doc_id"]
        for r in stratified_sample(docs, "doc_id", "source", RATES, DEFAULT).collect()
    }
    want = {
        r["doc_id"]
        for r in docs.collect()
        if py_bucket(r["doc_id"]) < RATES.get(r["source"], DEFAULT)
    }
    assert got == want and got  # non-vacuous


def test_stratified_stable_under_repartition(spark, tables):
    docs = tables["documents"].select("doc_id", "source")
    a = {r["doc_id"] for r in stratified_sample(docs, "doc_id", "source", RATES).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(7, "source"), "doc_id", "source", RATES
        ).collect()
    }
    assert a == b


def test_stratified_unknown_stratum_dropped_by_default(spark):
    df = spark.createDataFrame(
        [(i, "mystery") for i in range(200)], "doc_id long, source string"
    )
    assert stratified_sample(df, "doc_id", "source", RATES).count() == 0
    # ...and default_pct=100 keeps everything
    assert stratified_sample(df, "doc_id", "source", RATES, 100).count() == 200


def test_sample_is_subset_and_split_partitions(spark, tables):
    docs = tables["documents"]
    n = docs.count()
    sampled = sample_pct(docs, "doc_id", 10)
    assert 0 < sampled.count() < n
    split = train_val_test_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in split.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert sum(counts.values()) == n and set(counts) == {"train", "val", "test"}

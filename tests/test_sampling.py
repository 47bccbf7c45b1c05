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


def test_pack_shards_matches_naive_prefix_sum_and_conserves(spark, tables):
    from pyspark.sql import functions as F

    from pubsub_mapreduce_spark.operators.sampling import pack_shards

    docs = tables["documents"].select(
        "doc_id", F.length("text").alias("w_src")
    )
    budget = 500
    packed = pack_shards(docs, "doc_id", F.col("w_src"), budget=budget).collect()
    rows = sorted(docs.collect(), key=lambda r: r.doc_id)
    # naive single-pass reference
    cum, expected = 0, {}
    for r in rows:
        expected[r.doc_id] = cum // budget
        cum += r.w_src
    assert len(packed) == len(rows)  # every row assigned exactly once
    for p in packed:
        assert p.shard_id == expected[p.doc_id], p.doc_id
    assert sum(p.w for p in packed) == sum(r.w_src for r in rows)


def test_pack_shards_single_partition_window_is_bucket_bounded(spark, tables):
    """The data-side cumsum window is partitioned by bucket; the only
    unpartitioned (SinglePartition) stages are the 1-row min/max bounds
    aggregate and the n_buckets-row offsets window — never the data."""
    import re

    from pyspark.sql import functions as F

    from pubsub_mapreduce_spark.operators.sampling import pack_shards

    docs = tables["documents"].select("doc_id", F.length("text").alias("w"))
    plan = pack_shards(
        docs, "doc_id", F.col("w"), budget=500, n_buckets=4
    )._jdf.queryExecution().executedPlan().toString()
    # the per-row cumsum window carries a bucket partition spec
    assert re.search(
        r"Window \[sum\(w#\d+\) windowspecdefinition\(bucket#\d+, k#\d+", plan
    ), plan
    # the offsets window is the ONLY SinglePartition stage (the bounds
    # aggregate resolved eagerly to literals before plan construction)
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_oversample_replication_counts(spark, tables):
    """factor 3.0 -> exactly 3 copies of every row; 0.0 -> none; the
    fractional part is the stratified hash-sample (subset property)."""
    from pyspark.sql import functions as F

    from pubsub_mapreduce_spark.operators.sampling import oversample

    docs = tables["documents"]
    mixed = oversample(
        docs, "doc_id", "source", {"src0": 3.0, "src1": 0.0}, default=1.5
    )
    per = {
        (r["source"], r["doc_id"]): r["n"]
        for r in mixed.groupBy("source", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(n == 3 for (s, _), n in per.items() if s == "src0")
    assert not any(s == "src1" for s, _ in per)
    others = [n for (s, _), n in per.items() if s not in ("src0", "src1")]
    assert others and set(others) <= {1, 2}  # 1.5x: one or two copies
    # copy index is 0-based dense per row
    copies = mixed.where(F.col("source") == "src0").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy")).alias("c")
    ).first()["c"]
    assert copies == [0, 1, 2]


def test_aqp_sum_check_matches_hashlib_reference(spark):
    """est_cents must equal 20x the cents sum over exactly the rows
    whose md5 line-key bucket < 5 (recomputed with hashlib), and
    err_ppm must follow from the integer formula."""
    import hashlib
    import math

    from pubsub_mapreduce_spark.operators.sampling import aqp_sum_check

    rows = [
        (k, ln, "A", float(100 + (k * 7 + ln) % 50) + 0.25)
        for k in range(1, 40)
        for ln in (1, 2)
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber int, l_returnflag string,"
        " l_extendedprice double",
    )
    (r,) = aqp_sum_check(li).collect()

    def bucket(k, ln):
        h = hashlib.md5(str(k * 10 + ln).encode()).hexdigest()[:8]
        return int(h, 16) % 100

    cents = {(k, ln): round(v * 100) for k, ln, _, v in rows}
    exact = sum(cents.values())
    sampled = [c for (k, ln), c in cents.items() if bucket(k, ln) < 5]
    assert r["n"] == len(rows) and r["exact_cents"] == exact
    assert r["n_sample"] == len(sampled)
    assert r["est_cents"] == 20 * sum(sampled)
    err = math.floor(abs(r["est_cents"] - exact) / exact * 1e6 + 0.5)
    assert r["err_ppm"] == err
    assert r["within_tol"] == (err <= 50_000)

"""Value-level checks for operators/robust.py against plain-Python
references on a hand-built frame (the DuckDB twin covers fixture-scale
parity; this pins the semantics on a case small enough to eyeball)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators import robust as RB


def _events(spark, vals):
    rows = [(i, "t", float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "event_id long, event_type string, value double")


def test_value_outliers_matches_sigma_rule(spark):
    # 20 values near 10.00 plus one wild point: only the wild one flags
    vals = [10.0 + 0.01 * i for i in range(20)] + [500.0]
    out = RB.value_outliers(_events(spark, vals), k=3).collect()
    assert [(r.event_id, r.side) for r in out] == [(20, "high")]
    # cross-check the integer predicate against the float z-score
    cents = [round(v * 100) for v in vals]
    n = len(cents)
    mean = sum(cents) / n
    sd = math.sqrt(sum(c * c for c in cents) / n - mean**2)
    assert abs(cents[20] - mean) > 3 * sd
    assert all(abs(c - mean) <= 3 * sd for c in cents[:20])


def test_value_outliers_low_side(spark):
    vals = [100.0 + 0.01 * i for i in range(30)] + [-900.0]
    out = RB.value_outliers(_events(spark, vals), k=3).collect()
    assert [(r.event_id, r.side) for r in out] == [(30, "low")]


def test_winsorized_cutpoints_and_mean(spark):
    # 1..100 cents=100..10000; p=0.05 -> lo at rank 5 (=500), hi at rank 95
    vals = [float(i) for i in range(1, 101)]
    row = RB.winsorized_stats(_events(spark, vals), p=0.05).collect()[0]
    assert (row.n, row.lo_cents, row.hi_cents) == (100, 500, 9500)
    cents = [round(v * 100) for v in vals]
    clamped = [min(max(c, 500), 9500) for c in cents]
    exp = math.floor(sum(clamped) / 100 * 1e4 + 0.5) / 1e4
    assert row.win_mean_cents == exp
    assert row.mean_cents == math.floor(sum(cents) / 100 * 1e4 + 0.5) / 1e4


def test_winsorize_noop_at_p0(spark):
    vals = [1.0, 2.0, 3.0, 4.0]
    row = RB.winsorized_stats(_events(spark, vals), p=0.0).collect()[0]
    # p=0: lo = rank-1 value (the min), hi = rank-n value (the max)
    assert (row.lo_cents, row.hi_cents) == (100, 400)
    assert row.win_mean_cents == row.mean_cents


def test_rare_token_profile_counts(spark):
    from pubsub_mapreduce_spark.operators import textops as TX

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a zz"), (2, "b b qq zz")],
        "doc_id long, text string",
    )
    # corpus freqs: a=3, b=3, zz=2, qq=1; min_df=3 -> rare: zz, qq
    out = {r.doc_id: r for r in TX.rare_token_profile(docs, min_df=3).collect()}
    assert (out[0].n_tokens, out[0].rare_tokens) == (3, 0)
    assert (out[1].n_tokens, out[1].rare_tokens) == (2, 1)
    assert (out[2].n_tokens, out[2].rare_tokens) == (4, 2)
    assert out[2].rare_frac == 0.5

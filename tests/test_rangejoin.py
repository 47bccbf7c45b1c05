"""Range-join operator family (operators/rangejoin.py): the binned
keyless plan must be row-identical to the broadcast-nested-loop plan
(plan choice is a scale decision, never a semantics one), half-open
[start, end) boundaries must be exact at second granularity, and
degenerate intervals must drop rather than crash ``sequence``."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators import rangejoin as RJ


@pytest.mark.parametrize("bucket_seconds", [86400, 3600])
def test_binned_matches_nested_loop(spark, tables, bucket_seconds):
    """Same matches from the bucket-equi-join plan and the pure range
    predicate Spark would run as BroadcastNestedLoopJoin — including at
    an hour-granularity bucket where each 3-day window explodes to 72+
    bucket rows."""
    ev = tables["events"].select("event_id", "ts", "value")
    iv = RJ.launch_windows(tables, days=3)
    binned = RJ.binned_range_join(ev, iv, bucket_seconds=bucket_seconds)
    naive = ev.join(
        iv, (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    cols = ["event_id", "w_type"]
    got = {tuple(r) for r in binned.select(*cols).collect()}
    want = {tuple(r) for r in naive.select(*cols).collect()}
    assert got and got == want


def test_half_open_boundaries(spark):
    iv = spark.createDataFrame(
        [("w", datetime(2024, 1, 2, 0, 0), datetime(2024, 1, 3, 0, 0))],
        "w_type string, w_start timestamp, w_end timestamp",
    )
    pts = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 2, 0, 0)),  # == start: included
            (2, datetime(2024, 1, 2, 23, 59, 59)),  # last second: included
            (3, datetime(2024, 1, 3, 0, 0)),  # == end (bucket boundary): out
            (4, datetime(2024, 1, 1, 23, 59, 59)),  # before start: out
        ],
        "event_id long, ts timestamp",
    )
    got = {r.event_id for r in RJ.binned_range_join(pts, iv).collect()}
    assert got == {1, 2}


def test_degenerate_interval_drops(spark):
    iv = spark.createDataFrame(
        [
            ("zero", datetime(2024, 1, 2), datetime(2024, 1, 2)),
            ("neg", datetime(2024, 1, 3), datetime(2024, 1, 2)),
        ],
        "w_type string, w_start timestamp, w_end timestamp",
    )
    pts = spark.createDataFrame(
        [(1, datetime(2024, 1, 2))], "event_id long, ts timestamp"
    )
    assert RJ.binned_range_join(pts, iv).count() == 0


def test_post_signup_zero_fill(spark, tables):
    """Every signup appears exactly once, including users whose signup has
    no follow-on events (left join: count 0, value 0.0)."""
    out = RJ.post_signup_activity(tables, hours=24)
    n_signups = (
        tables["events"].where(F.col("event_type") == "signup").count()
    )
    assert out.count() == n_signups
    zero = out.where(F.col("n_follow_events") == 0)
    assert zero.where(F.col("follow_value") != 0.0).count() == 0

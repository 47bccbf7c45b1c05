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


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_backward_and_ties(spark):
    """Backward as-of: nearest right row at-or-before; equal-time right
    row matches (inclusive boundary); tie at the same right time goes to
    the MAX tie col; no prior row -> nulls."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-10 12:00:00"), "a"),
         (1, _ts("2024-01-05 00:00:00"), "b"),
         (2, _ts("2024-01-01 00:00:00"), "c")],
        "k long, lt timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-05 00:00:00"), 10, 100.0),
         (1, _ts("2024-01-05 00:00:00"), 11, 110.0),
         (1, _ts("2024-01-09 00:00:00"), 12, 120.0),
         (2, _ts("2024-02-01 00:00:00"), 20, 200.0)],
        "k long, rt timestamp, rid int, val double",
    )
    out = {r["tag"]: r for r in RJ.asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt",
        value_cols=["rid", "val"], tie_cols=["rid"],
    ).collect()}
    assert out["a"]["asof_rid"] == 12 and out["a"]["asof_val"] == 120.0
    assert out["b"]["asof_rid"] == 11  # inclusive boundary, max tie
    assert out["c"]["asof_rid"] is None and out["c"]["asof_val"] is None


def test_asof_join_forward_tolerance(spark):
    """Forward as-of: nearest right row at-or-after; a match farther
    than tolerance_s is nulled out."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), "near"),
         (1, _ts("2024-03-01 00:00:00"), "far"),
         (1, _ts("2024-06-01 00:00:00"), "none")],
        "k long, lt timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-03 00:00:00"), 1),
         (1, _ts("2024-04-15 00:00:00"), 2)],
        "k long, rt timestamp, rid int",
    )
    out = {r["tag"]: r for r in RJ.asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt",
        value_cols=["rid"], direction="forward", tolerance_s=10 * 86400,
        tie_cols=["rid"],
    ).collect()}
    assert out["near"]["asof_rid"] == 1
    assert out["far"]["asof_rid"] is None  # 45 days > 10-day tolerance
    assert out["none"]["asof_rid"] is None  # nothing after


def test_interval_overlap_join_matches_theta(spark):
    """Bin-decomposed overlap join is pair-identical to the naive theta
    join, across bin widths (pairs spanning multiple shared bins must
    dedup to exactly one row)."""
    rows = [
        (1, 101, _ts("2024-01-01 00:00:00"), _ts("2024-01-10 00:00:00")),
        (1, 102, _ts("2024-01-09 00:00:00"), _ts("2024-01-20 00:00:00")),
        (1, 103, _ts("2024-02-01 00:00:00"), _ts("2024-02-02 00:00:00")),
        (2, 201, _ts("2024-01-01 00:00:00"), _ts("2024-03-01 00:00:00")),
        (2, 202, _ts("2024-02-15 00:00:00"), _ts("2024-02-16 00:00:00")),
    ]
    iv = spark.createDataFrame(
        rows, "k long, iid int, start timestamp, end timestamp"
    )
    naive = {
        (a[0], a[1], b[1])
        for a in rows for b in rows
        if a[0] == b[0] and a[2] < b[3] and b[2] < a[3]
    }
    for width in (86400, 7 * 86400, 40 * 86400):
        got = {
            (r["k"], r["iid_l"], r["iid_r"])
            for r in RJ.interval_overlap_join(
                iv, iv, on=["k"], bin_width_s=width
            ).collect()
        }
        assert got == naive, f"width={width}"


def test_interval_overlap_half_open_boundary(spark):
    """Touching intervals ([a,b) then [b,c)) do NOT overlap."""
    iv = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 00:00:00"), _ts("2024-01-05 00:00:00")),
         (1, 2, _ts("2024-01-05 00:00:00"), _ts("2024-01-09 00:00:00"))],
        "k long, iid int, start timestamp, end timestamp",
    )
    got = {
        (r["iid_l"], r["iid_r"])
        for r in RJ.interval_overlap_join(iv, iv, on=["k"]).collect()
    }
    assert got == {(1, 1), (2, 2)}

"""Range / interval joins — a point-in-interval join operator family.

The reference has no joins at all (SURVEY.md §2.6); range joins are part
of the north-star batch surface and the classic "Spark lacks this as a
primitive" operator (alongside the as-of join in relational.py). Spark
executes a join whose ONLY predicate is a range as BroadcastNestedLoopJoin
— fine when one side is tiny, quadratic disaster when both sides are big.
This module provides the three plans, each correct, each with a distinct
scale envelope:

1. equi-key + range (``post_signup_activity``): the equality key drives a
   standard shuffled join; the range predicate rides along as a
   join-condition filter evaluated inside key groups. No nested-loop
   blowup; cost = one shuffle per side on the key. Use whenever a key
   exists.
2. keyless, small interval side (``launch_window_events`` naive form):
   broadcast-nested-loop IS the right plan when |intervals| is
   broadcastable — each task streams its points past the in-memory
   interval list.
3. keyless, LARGE interval side (``binned_range_join``): explode each
   interval across the fixed-width time buckets it covers; each point
   carries exactly one bucket; equi-join on the bucket hash-partitions
   both sides so the range predicate only ever runs within a bucket.
   Shuffle size = |points| + Σ interval-spans/bucket_width — linear, not
   quadratic, and bucket_width tunes the replication-vs-selectivity
   trade (match it to the median interval length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import round_half_up

Tables = dict[str, DataFrame]


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "w_start",
    end: str = "w_end",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Keyless point-in-interval join (half-open: start <= ts < end) that
    scales to interval tables too large to broadcast.

    Each interval row is exploded to one row per ``bucket_seconds``-wide
    epoch bucket it overlaps; each point computes its single bucket; an
    equi-join on the bucket co-partitions the two sides, and the exact
    range predicate filters within the bucket. A point lands in one
    bucket, so a (point, interval) match is produced exactly once —
    no post-join dedup needed. Zero-/negative-length intervals are
    dropped (they can match nothing under half-open semantics and
    ``sequence`` would otherwise run backwards).
    """
    b = F.lit(int(bucket_seconds)).cast("long")
    iv = (
        intervals.where(F.col(end) > F.col(start))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(start) / b),
                    # end is exclusive: an interval ending exactly on a
                    # bucket boundary does not cover that bucket
                    F.floor((F.unix_timestamp(end) - F.lit(1)) / b),
                )
            ),
        )
    )
    pt = points.withColumn("__bucket", F.floor(F.unix_timestamp(ts) / b))
    return (
        pt.join(iv, on="__bucket", how="inner")
        .where((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("__bucket")
    )


def post_signup_activity(t: Tables, hours: int = 24) -> DataFrame:
    """Equi-key + range interval join: for every signup event, the same
    user's follow-on events inside (signup_ts, signup_ts + hours] —
    count and summed value per signup (zero-filled when none).

    Plan shape: NOT a self-join. The semantically equal self-join on
    user_id explodes to |signups_u| x |events_u| intermediate pairs per
    user before the time predicate filters (13M pairs at sf0.1's 150-user
    key space — A/B-measured 2.5s vs 1.2s for this form), and any hot key
    at 100TB pays that quadratically. Instead: ONE shuffle+sort on
    (user_id, ts) and two RANGE-frame window aggregates — Spark's
    WindowExec slides both frames with two pointers over the sorted
    partition, so per-user cost is linear in events, never
    signups x events. The exclusive lower bound is frame algebra:
    agg over (s_ts, s_ts+h] = agg over [s_ts, s_ts+h] minus agg over
    [s_ts, s_ts] (the ties-and-self frame), which also zero-fills
    no-match signups for free (both frames contain self, difference 0).
    """
    horizon = int(hours) * 3600  # whole seconds; rangeBetween needs ints
    tsd = F.col("ts").cast("double")  # epoch seconds, us-exact ordering
    base = Window.partitionBy("user_id").orderBy(tsd)
    w_up = base.rangeBetween(0, horizon)
    w_eq = base.rangeBetween(0, 0)
    return (
        t["events"]
        .select(
            "event_id",
            "user_id",
            "event_type",
            (
                F.count(F.lit(1)).over(w_up) - F.count(F.lit(1)).over(w_eq)
            ).alias("n_follow_events"),
            (F.sum("value").over(w_up) - F.sum("value").over(w_eq)).alias("__fv"),
        )
        .where(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            "n_follow_events",
            round_half_up(F.col("__fv"), 2).alias("follow_value"),
        )
    )


def launch_windows(t: Tables, days: int = 3) -> DataFrame:
    """Per-event-type launch window: [first occurrence, +days)."""
    return (
        t["events"]
        .groupBy(F.col("event_type").alias("w_type"))
        .agg(F.min("ts").alias("w_start"))
        .withColumn("w_end", F.col("w_start") + F.expr(f"INTERVAL {int(days)} DAYS"))
    )


def launch_window_events(t: Tables, days: int = 3) -> DataFrame:
    """Keyless interval join via ``binned_range_join``: count ALL events
    (any type) landing inside each type's launch window.

    The interval side here is tiny (|event types| rows), where a
    broadcast nested loop would also be fine — tests/test_rangejoin.py
    pins parity between the two plans. The binned formulation is the one
    that still works when the interval table is millions of campaign
    windows: shuffle on the day bucket instead of a quadratic loop.
    """
    ev = t["events"].select("event_id", "ts", "value")
    j = binned_range_join(ev, launch_windows(t, days))
    return j.groupBy("w_type").agg(
        F.count(F.lit(1)).alias("n_events_in_window"),
        round_half_up(F.sum("value"), 2).alias("window_value"),
    )

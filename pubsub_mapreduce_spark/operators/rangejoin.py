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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance_s: int | None = None,
    tie_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Generic AS-OF join (the pandas ``merge_asof`` / kdb ``aj``
    operator Spark lacks as a primitive): for every left row, attach
    ``value_cols`` from the single right row sharing the ``on`` keys
    whose ``right_time`` is the nearest at-or-before (``backward``) or
    at-or-after (``forward``) the left row's ``left_time``; rows with
    no qualifying match keep nulls (left as-of).

    The scalable plan is the union-and-carry-forward composition the
    specialized queries already use (relational.events_asof_latest_order):
    tag both sides, union, and per key carry the last (backward:
    ``last(ignorenulls)`` over an unbounded-preceding window) or first
    (forward: ``first(ignorenulls)`` over an unbounded-following
    window) non-null right payload. ONE shuffle on the join keys plus a
    within-partition sort — a sort-merge join's cost shape, never the
    per-row LATERAL point lookup, and never a range-only nested loop.

    Determinism at equal times is contract: the right side sorts
    before (backward) / after (forward) left rows at the same
    timestamp, making the boundary inclusive, and ``tie_cols`` break
    right-right ties (the carried row is the tie-cols MAX for backward,
    MIN for forward — the "latest wins" reading in both directions).
    Pass tie columns whenever right times can collide or results feed
    an exact-hash oracle.

    Single-row carry is contract too: ALL carried fields (__rt plus
    every value column) travel in ONE struct picked by ONE
    last/first(ignorenulls) window, so a right row with NULLs in some
    value columns still contributes exactly its own values — never a
    stitch of fields from different right rows (merge_asof semantics).
    Right rows with a NULL ``right_time`` are not match candidates (no
    time, no as-of position — pandas requires non-null keys).

    ``tolerance_s`` bounds the match gap in whole seconds (timestamps
    compare via ``unix_timestamp``, second precision): a carried match
    farther than the tolerance is nulled out, exactly pandas
    ``merge_asof(tolerance=...)``. At 100TB: one keyed exchange of
    |left|+|right| rows; skewed keys respond to the same salting as any
    sort-merge join, and the window state is O(1) per row (a handful of
    carried columns), never a buffered group."""
    assert direction in ("backward", "forward"), direction
    tie_cols = tie_cols or []
    rdt = dict(right.dtypes)
    ldt = dict(left.dtypes)
    lpay = [c for c in left.columns if c not in on]
    kind_left, carry = (1, "last") if direction == "backward" else (0, "first")

    lt = left.select(
        *on,
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(kind_left).alias("__kind"),
        *lpay,
        *[F.lit(None).cast(rdt[c]).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast("timestamp").alias("__rt"),
        *[F.lit(None).cast(rdt[c]).alias(f"__tb_{c}") for c in tie_cols],
    )
    rt = right.select(
        *on,
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(1 - kind_left).alias("__kind"),
        *[F.lit(None).cast(ldt[c]).alias(c) for c in lpay],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(right_time).cast("timestamp").alias("__rt"),
        *[F.col(c).alias(f"__tb_{c}") for c in tie_cols],
    )
    order = [F.col("__t"), F.col("__kind")] + [
        F.col(f"__tb_{c}") for c in tie_cols
    ]
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    u = lt.unionByName(rt)
    # one struct = one right row: the ignorenulls pick lands on a whole
    # right payload atomically (null on left rows and on right rows with
    # no timestamp), so __rt and every value column come from the SAME row
    payload = F.when(
        (F.col("__kind") == (1 - kind_left)) & F.col("__rt").isNotNull(),
        F.struct(
            F.col("__rt").alias("rt"),
            *[F.col(f"__v_{c}").alias(c) for c in value_cols],
        ),
    )
    u = u.select("*", pick(payload).alias("__p")).where(
        F.col("__kind") == kind_left
    )
    crt = F.col("__p.rt")
    if tolerance_s is not None:
        gap = (
            F.unix_timestamp("__t") - F.unix_timestamp(crt)
            if direction == "backward"
            else F.unix_timestamp(crt) - F.unix_timestamp("__t")
        )
        ok = crt.isNotNull() & (gap <= F.lit(int(tolerance_s)))
        vals = [
            F.when(ok, F.col(f"__p.{c}")).alias(prefix + c)
            for c in value_cols
        ]
    else:
        vals = [F.col(f"__p.{c}").alias(prefix + c) for c in value_cols]
    return u.select(*on, *lpay, *vals)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | None = None,
    bin_width_s: int = 86400,
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Interval-interval OVERLAP join: all (left, right) interval pairs
    with ``l_start < r_end AND r_start < l_end`` (half-open overlap),
    optionally under equality keys. Both inputs carry ``start``/``end``
    timestamp columns plus payload. Degenerate intervals (``end <=
    start``) are empty under half-open semantics and overlap NOTHING —
    they are filtered out of both sides (the pure predicate would
    wrongly match an empty interval strictly inside another).

    The keyless big-big case is where Spark's planner gives up
    (BroadcastNestedLoopJoin): the scalable plan decomposes TIME into
    fixed-width bins — each interval explodes across the bins it
    touches, pairs meet in an equi-join on the bin, and a pair that
    overlaps multiple shared bins is kept once by crediting it to the
    FIRST shared bin (``greatest(l_bin_start, r_bin_start) == bin``) —
    dedup by construction, no distinct shuffle. Replication is
    span/bin_width per row (pick bin_width near the median interval
    length); the equi-join hash-partitions both sides so the overlap
    predicate only runs within a bin. With ``on`` keys the bin rides
    along as an extra equi column, bounding skew within key groups.

    At 100TB: shuffle = Σ spans/bin_width + |rows|, linear; the classic
    alternative (range-only theta join) is quadratic. Same envelope as
    ``binned_range_join`` (its interval-point special case)."""
    on = on or []

    def _binned(df: DataFrame, side: str) -> DataFrame:
        # degenerate (end <= start) intervals are empty under half-open
        # semantics and overlap nothing — drop them up front (also keeps
        # sequence() from running backwards and exploding phantom bins)
        df = df.where(F.col("end") > F.col("start"))
        s = F.unix_timestamp("start")
        e = F.unix_timestamp("end")
        first_bin = F.floor(s / bin_width_s).cast("long")
        # half-open [start, end): an interval touching a bin boundary at
        # its end does not occupy the next bin
        last_bin = F.floor((e - 1) / bin_width_s).cast("long")
        pay = [c for c in df.columns if c not in on]
        # every output column is side-suffixed so the self-join case
        # (left IS right) resolves unambiguously
        return df.select(
            *[F.col(k).alias(k + side) for k in on],
            F.explode(F.sequence(first_bin, last_bin)).alias("__bin" + side),
            first_bin.alias("__fb" + side),
            *[F.col(c).alias(c + side) for c in pay],
        )

    li, ri = suffixes
    lb, rb = _binned(left, li), _binned(right, ri)
    cond = F.col("__bin" + li) == F.col("__bin" + ri)
    for k in on:
        cond = cond & (F.col(k + li) == F.col(k + ri))
    j = lb.join(rb, cond)
    keep = (
        (F.unix_timestamp(f"start{li}") < F.unix_timestamp(f"end{ri}"))
        & (F.unix_timestamp(f"start{ri}") < F.unix_timestamp(f"end{li}"))
        & (F.greatest("__fb" + li, "__fb" + ri) == F.col("__bin" + li))
    )
    out_cols = (
        [F.col(k + li).alias(k) for k in on]
        + [F.col(c + li) for c in left.columns if c not in on]
        + [F.col(c + ri) for c in right.columns if c not in on]
    )
    return j.where(keep).select(*out_cols)

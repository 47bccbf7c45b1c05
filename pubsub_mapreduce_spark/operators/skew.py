"""Skew mitigation: salted two-phase aggregation and salted broadcast
join — the manual tools for hot keys that AQE's runtime skew handling
(enabled in session.py) can't fix.

When to reach for these (and when not to):
- Plain ``groupBy().count()/sum()`` does NOT need salting: Catalyst's
  partial HashAggregate already collapses hot keys map-side, so the
  shuffle carries one partial row per (partition, key) regardless of
  skew.
- Salting matters when the per-key REDUCE state is heavy — percentile /
  collect-style aggregates, or stateful streaming keys — or when a hot
  key concentrates a JOIN's probe side on one task. AQE splits skewed
  shuffle-join partitions at runtime, but only for sort-merge joins; the
  salted broadcast replicate below works for any join shape and keeps
  the hot key's rows spread across ``n_salts`` tasks deterministically.

Salt choice: ``spark_partition_id() % n_salts`` — deterministic for a
fixed scan layout, zero bytes of extra shuffle key entropy beyond the
salt int, and a hot key's rows land in as many salt groups as input
partitions, which is exactly the parallelism available anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, n_salts: int = DEFAULT_SALTS, out: str = "__salt") -> DataFrame:
    return df.withColumn(out, F.spark_partition_id() % n_salts)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    n_salts: int = DEFAULT_SALTS,
    **aggs: tuple[str, Column],
) -> DataFrame:
    """Two-phase salted aggregation: phase 1 aggregates per
    (keys, salt) — splitting a hot key's rows across ``n_salts`` reduce
    tasks — phase 2 merges the per-salt partials per key.

    ``aggs`` maps output column -> (merge_fn_name, phase1_column_expr),
    where merge_fn is 'sum' / 'min' / 'max' (the merge of the partial
    must be associative). Example::

        salted_agg(events, ["event_type"],
                   n_events=("sum", F.count(F.lit(1))),
                   total_value=("sum", F.sum("value")))
    """
    merge_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[
            merge_fns[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof join of a big skewed table against a small one: the big
    side gets a deterministic salt, the small side is replicated once per
    salt value (explode of a literal sequence — n_salts x |small| rows,
    fine for broadcast-sized tables), and the join key becomes
    (on, salt). A hot key's probe rows now spread over ``n_salts`` tasks
    instead of hammering one.

    Only inner/left are allowed: each big row carries exactly one salt so
    those joins keep exact semantics; right/full would multiply unmatched
    small-side rows by ``n_salts``."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted join supports inner/left only, got {how!r}")
    big_s = with_salt(big, n_salts)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(F.broadcast(small_s), on=[on, "__salt"], how=how)
    return out.drop("__salt")


def key_skew_report(
    tables: list[tuple[str, DataFrame, str]],
) -> DataFrame:
    """The DIAGNOSTIC that decides when the salting above is worth it:
    one row per candidate grouping/join key with integer-exact skew
    statistics — total rows, distinct keys, the hottest key's count,
    exact p50/p99 per-key counts, the hot key's row share in ppm, and
    max/median as a x1000 ratio. "l_partkey skew_x1000 = 1200" reads
    as a healthy key; "user_id top1_ppm = 180000" says one user owns
    18% of the table and every shuffle on it will strangle a task at
    100 TB (reference has no planner; this is the operational input
    its fixed topology never needed — see SURVEY.md §4).

    Scale design: per-key counts are one keyed exchange with map-side
    partial aggregation (skew-immune by itself — see module header);
    the order statistics then run on the COUNTS-OF-COUNTS relation
    (distinct count values, typically a few thousand rows even at
    billions of keys) via the cumulative-rank cross-multiplication
    trick from ``robust.weighted_median`` — the single-partition
    window is over that tiny relation, never over keys or rows.
    p50 = smallest count with 2*cum >= n_keys, p99 with
    100*cum >= 99*n_keys (cum >= ceil(a/b) <=> b*cum >= a for
    positive integers — rank selection with zero division). All
    outputs BIGINT or truncating integer division (`div` here, `//`
    in the oracle — identical for non-negative operands), so the
    report is exactly value-hashable on any engine."""
    outs = []
    for label, df, key in tables:
        counts = df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        cc = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("freq"))
        from pyspark.sql import Window

        wc = Window.orderBy("cnt").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        wt = Window.partitionBy()
        r = cc.select(
            "cnt",
            "freq",
            F.sum("freq").over(wc).alias("cum"),
            F.sum("freq").over(wt).alias("nk"),
        )
        one = r.agg(
            F.sum(F.col("cnt") * F.col("freq")).alias("n_rows"),
            F.max("nk").alias("n_keys"),
            F.max("cnt").alias("max_cnt"),
            F.min(
                F.when(2 * F.col("cum") >= F.col("nk"), F.col("cnt"))
            ).alias("p50_cnt"),
            F.min(
                F.when(100 * F.col("cum") >= 99 * F.col("nk"), F.col("cnt"))
            ).alias("p99_cnt"),
        ).select(
            F.lit(label).alias("key_col"),
            "n_rows",
            "n_keys",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
            F.expr("max_cnt * 1000000L div n_rows").alias("top1_ppm"),
            F.expr("max_cnt * 1000L div p50_cnt").alias("skew_x1000"),
        )
        outs.append(one)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out

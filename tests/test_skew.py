"""Skew-mitigation operators: salted results must be IDENTICAL to their
unsalted equivalents (salting changes the physical distribution, never
the answer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators.skew import salted_agg, salted_broadcast_join


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_matches_plain(tables):
    ev = tables["events"]
    # NOTE: partials must stay unrounded — rounding per-salt sums before
    # the merge would change the answer (sum of 16 rounded partials !=
    # rounded total); round only after the final merge
    salted = salted_agg(
        ev,
        ["event_type"],
        n_events=("sum", F.count(F.lit(1))),
        total_value=("sum", F.sum("value")),
        max_value=("max", F.max("value")),
        min_ts=("min", F.min("ts")),
    ).select(
        "event_type", "n_events", F.round("total_value", 2).alias("total_value"),
        "max_value", "min_ts",
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max("value").alias("max_value"),
        F.min("ts").alias("min_ts"),
    )
    assert canon(salted) == canon(plain)


def test_salted_broadcast_join_matches_plain(tables):
    ev = tables["events"].withColumnRenamed("user_id", "c_custkey")
    dim = tables["customer"].select("c_custkey", "c_mktsegment")
    salted = salted_broadcast_join(ev, dim, on="c_custkey").select(
        "event_id", "c_custkey", "c_mktsegment"
    )
    plain = ev.join(dim, "c_custkey").select("event_id", "c_custkey", "c_mktsegment")
    assert canon(salted) == canon(plain)
    # hot-key spread: every salt bucket of a replicated row joins at most once
    assert salted.count() == plain.count()

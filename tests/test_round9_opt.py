"""Round-9 OPTIMIZATION equality pins: every operator whose internals
were restructured for performance must emit bit-identical values to the
pre-optimization form (recomputed literally here, not imported)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from pubsub_mapreduce_spark.session import get_spark

    return get_spark(app_name="round9-opt-tests")


def _emb(spark, n=40, dim=8):
    return spark.createDataFrame(
        [
            (
                i,
                [
                    float(((i * 7 + j * 13) % 11) - 5) / 3.0
                    for j in range(dim)
                ],
            )
            for i in range(n)
        ],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_assign_matches_literal_lloyd(spark):
    """kmeans_assign now runs map-side argmin over driver-collected
    centroid literals (was: exploded broadcast join + argmin window).
    Pin: literal Python Lloyd rounds over the SAME int8 codes produce
    the same (cluster, d2) per vec — including the truncating (toward
    zero) centroid division on NEGATIVE sums."""
    from pubsub_mapreduce_spark.operators.similarity import (
        _int8_codes,
        kmeans_assign,
    )

    emb = _emb(spark)
    k, iters, seed_every = 3, 2, 7
    codes = {r.vec_id: list(r.codes) for r in _int8_codes(emb).collect()}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def trunc_div(s, n):
        return -((-s) // n) if s < 0 else s // n

    seeds = sorted(v for v in codes if v % seed_every == 0)[:k]
    cents = {ci: list(codes[v]) for ci, v in enumerate(seeds)}
    assign = {}
    for it in range(iters):
        assign = {
            v: min((d2(c, cents[g]), g) for g in cents)
            for v, c in codes.items()
        }
        if it < iters - 1:
            upd = {}
            for v, (_, g) in assign.items():
                upd.setdefault(g, []).append(codes[v])
            cents = {
                g: [
                    trunc_div(sum(col), len(rows))
                    for col in zip(*rows)
                ]
                for g, rows in upd.items()
            }
    got = {
        r.vec_id: (r.d2, r.cluster)
        for r in kmeans_assign(
            emb, k=k, iters=iters, seed_every=seed_every
        ).collect()
    }
    assert got == assign and len(got) == len(codes)


def test_kmeans_assign_negative_sum_truncation(spark):
    """Force a cluster whose per-dim code sum is negative and not
    divisible by the member count: floor-vs-trunc division diverges
    there, so this pins the Spark-div semantics of the driver-side
    centroid update."""
    from pubsub_mapreduce_spark.operators.similarity import (
        _int8_codes,
        kmeans_assign,
    )

    # vectors clustered around -1 and +1 with asymmetric magnitudes:
    # the negative cluster's sums are negative and odd-sized
    rows = [
        (0, [-1.0, -0.5]),
        (1, [-0.9, -0.4]),
        (2, [-0.8, -0.6]),
        (3, [1.0, 0.5]),
        (4, [0.9, 0.6]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    codes = {
        r.vec_id: list(r.codes)
        for r in _int8_codes(emb).collect()
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def trunc_div(s, n):
        return -((-s) // n) if s < 0 else s // n

    k, iters, seed_every = 2, 2, 3  # seeds: vec 0 and vec 3
    seeds = sorted(v for v in codes if v % seed_every == 0)[:k]
    cents = {ci: list(codes[v]) for ci, v in enumerate(seeds)}
    assign = {}
    for it in range(iters):
        assign = {
            v: min((d2(c, cents[g]), g) for g in cents)
            for v, c in codes.items()
        }
        if it < iters - 1:
            upd = {}
            for v, (_, g) in assign.items():
                upd.setdefault(g, []).append(codes[v])
            cents = {
                g: [trunc_div(sum(col), len(rows)) for col in zip(*rows)]
                for g, rows in upd.items()
            }
    got = {
        r.vec_id: (r.d2, r.cluster)
        for r in kmeans_assign(
            emb, k=k, iters=iters, seed_every=seed_every
        ).collect()
    }
    assert got == assign


def test_copurchase_edges_matches_join_form(spark):
    """copurchase_edges now builds pairs from a per-order sorted
    collect_set (was: distinct + order-keyed self-join). Pin: the two
    forms produce the identical weighted edge multiset on a synthetic
    lineitem with duplicate (order, part) lines and singleton orders."""
    from pubsub_mapreduce_spark.operators.graph import copurchase_edges

    rows = []
    for ok in range(30):
        parts = [(ok * 3 + j) % 11 for j in range(ok % 5 + 1)]
        parts += parts[:1]  # duplicate line for the dedup path
        rows += [(ok, p) for p in parts]
    li = spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    )
    got = {
        (r.a, r.b): r.w for r in copurchase_edges(li, min_w=1).collect()
    }
    e0 = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a, b = e0.alias("x"), e0.alias("y")
    want = {
        (r.a, r.b): r.w
        for r in (
            a.join(
                b,
                (F.col("x.ok") == F.col("y.ok"))
                & (F.col("x.pk") < F.col("y.pk")),
            )
            .groupBy(F.col("x.pk").alias("a"), F.col("y.pk").alias("b"))
            .agg(F.count(F.lit(1)).alias("w"))
            .collect()
        )
    }
    assert got == want and len(want) > 10


def test_theil_sen_matches_single_window_form(spark):
    """theil_sen_daily now selects the median via the range-partitioned
    two-pass rank (forced large path). Pin: identical output to the
    single-partition window form on a synthetic order calendar with
    slope ties (the two-pass form may permute ties; the VALUES at the
    middle positions cannot change)."""
    from pubsub_mapreduce_spark.functions.text import round_half_up
    from pubsub_mapreduce_spark.operators.robust import theil_sen_daily
    from pyspark.sql import Window

    import datetime

    base = datetime.date(1995, 1, 1)
    rows = []
    for d in range(40):
        for _ in range((d * 7) % 5 + 1):  # ties in daily counts
            rows.append((base + datetime.timedelta(days=d),))
    orders = spark.createDataFrame(rows, "o_orderdate date")
    got = theil_sen_daily(orders).collect()

    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    x0 = daily.agg(F.min("d").alias("d0"))
    idx = daily.crossJoin(F.broadcast(x0)).select(
        F.datediff("d", "d0").cast("long").alias("x"), "cnt"
    )
    a = idx.select(F.col("x").alias("x1"), F.col("cnt").alias("c1"))
    b = idx.select(F.col("x").alias("x2"), F.col("cnt").alias("c2"))
    pairs = a.join(b, F.col("x1") < F.col("x2")).select(
        (
            (F.col("c2") - F.col("c1")).cast("double")
            / (F.col("x2") - F.col("x1")).cast("double")
        ).alias("slope")
    )
    m = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    rn = F.row_number().over(Window.orderBy("slope"))
    mid = (
        pairs.select("slope", rn.alias("rn"))
        .crossJoin(F.broadcast(m))
        .where(
            (F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2))
            | (F.col("rn") == F.floor(F.col("n_pairs") / 2) + 1)
        )
    )
    want = mid.groupBy("n_pairs").agg(
        round_half_up(F.avg("slope"), 6).alias("slope_med"),
        F.count(F.lit(1)).cast("long").alias("n_mid"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_silhouette_closed_form_small_cluster_edges(spark):
    """The cluster-moment silhouette must drop singleton-own-cluster
    samples exactly like the pair-join form (cnt = 0 row filtered, not
    a 0-division) — 3 vectors, one isolated."""
    from pubsub_mapreduce_spark.operators.similarity import silhouette_eval

    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (2, [0.1, 0.0]),
            (4, [10.0, 10.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    # k=2 seeds at vec 0 and 2 -> clusters {0,2} and... depends on
    # Lloyd; the pin is just: no crash, and every emitted s in [-1, 1]
    out = silhouette_eval(
        emb, k=2, iters=1, seed_every=2, every=1
    ).collect()
    for r in out:
        assert -1.0 <= r.s <= 1.0

"""Approximate sketch aggregates — the 100TB path for distinct counts
and percentiles (one pass, mergeable state, no per-group sort). Pinned
against their exact counterparts within documented error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(tables):
    ev = tables["events"]
    rows = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        # HyperLogLog++ at rsd=0.02: allow 3 sigma
        assert abs(r["approx"] - r["exact"]) <= max(3, 0.06 * r["exact"]), r


def test_approx_distinct_operator_within_rsd(tables):
    """The sketches.approx_distinct operator (rsd=0.05) tracks the exact
    per-group distinct count within 3 sigma."""
    from pubsub_mapreduce_spark.operators.sketches import approx_distinct

    ev = tables["events"]
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct(ev).collect()
    }
    exact = {
        r[0]: r[1]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id"))
        .collect()
    }
    assert approx.keys() == exact.keys() and approx
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(3, 0.15 * ex), (k, approx[k], ex)


def test_approx_percentile_within_accuracy(tables):
    orders = tables["orders"]
    row = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx"),
    ).first()
    # accuracy=10000 -> rank error <= n/10000; translate to value space
    # loosely via a 2% relative bound on this distribution
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02


def test_heavy_hitters_exact_and_freq_items_superset(tables):
    """freqItems (Karp single-pass) must return EVERY true heavy hitter
    (frequency > support) — false positives allowed, false negatives
    not. The exact operator is separately oracle-checked by the driver."""
    from pyspark.sql import functions as F

    from pubsub_mapreduce_spark.operators.sketches import (
        freq_items,
        heavy_hitters,
    )

    ev = tables["events"]
    support = 0.008
    hh = heavy_hitters(ev, "user_id", support)
    rows = hh.collect()
    assert rows, "vacuous: no heavy hitters at this support"
    total = ev.count()
    for r in rows:
        assert r["cnt"] >= total * support
    strict = {
        r["user_id"] for r in rows if r["cnt"] > total * support
    }
    approx = freq_items(ev, "user_id", support)
    assert strict <= approx, f"missing true hitters: {strict - approx}"


def test_hll_rollup_error_bound_and_merge_consistency(spark, tables):
    """Merged daily sketches estimate per-type distinct users within the
    HLL error envelope, and the two-level rollup (day sketches -> union)
    agrees with a single-pass sketch over the same rows — the merge is
    lossless w.r.t. the sketch state, which is what makes pre-aggregated
    sketch tables trustworthy."""
    from pyspark.sql import functions as F

    from pubsub_mapreduce_spark.operators.sketches import hll_daily_rollup

    ev = tables["events"]
    rolled = {
        r["event_type"]: r["approx_users"]
        for r in hll_daily_rollup(ev).collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for et, est in rolled.items():
        assert abs(est - exact[et]) / exact[et] <= 0.05, (et, est, exact[et])

    single = {
        r["event_type"]: r["e"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("e")
        )
        .collect()
    }
    assert rolled == single


def test_fixed_width_histogram_conserves_and_clamps(spark):
    from pyspark.sql import functions as F

    from pubsub_mapreduce_spark.operators.sketches import fixed_width_histogram

    df = spark.createDataFrame(
        [(float(x),) for x in [0, 1, 2, 5, 9, 10, 10, 10]] + [(None,)],
        "v double",
    )
    h = {r["bin"]: r for r in fixed_width_histogram(df, "v", n_bins=5).collect()}
    assert len(h) == 5  # empty bins emitted
    assert sum(r["n"] for r in h.values()) == 8  # nulls excluded, rest conserved
    assert h[4]["n"] == 4  # 9 plus the three max values (clamped) land last
    assert h[3]["n"] == 0  # [6, 8): genuinely empty, still emitted
    assert h[0]["lo"] == 0.0 and h[4]["hi"] == 10.0
    # degenerate all-equal input: everything in bin 0, no div-by-zero
    one = spark.createDataFrame([(7.0,), (7.0,)], "v double")
    h1 = {r["bin"]: r["n"] for r in fixed_width_histogram(one, "v", 5).collect()}
    assert h1[0] == 2 and sum(h1.values()) == 2


def test_cms_overestimate_bound_and_merge(spark):
    """CMS contract: (1) never underestimates; (2) the Cormode &
    Muthukrishnan bound — err <= (e/width)*N for the vast majority of
    keys at depth 4; (3) sketches built on disjoint halves sum
    cell-wise to the whole-corpus sketch (mergeability — the property
    that makes it a 100TB structure)."""
    import math

    from pyspark.sql import functions as F

    from pubsub_mapreduce_spark.io import load_tables
    from pubsub_mapreduce_spark.operators.sketches import (
        cms_build,
        cms_estimates,
    )
    from tests.conftest import SF_MED

    ev = load_tables(spark, SF_MED)["events"]
    est = cms_estimates(ev, "user_id").collect()
    n_total = ev.count()
    bound = math.e / 256 * n_total
    assert all(r["overestimate"] >= 0 for r in est)
    n_bad = sum(r["overestimate"] > bound for r in est)
    # P(err > bound) <= e^-4 per key; allow 3x slack on the expectation
    assert n_bad <= max(3, int(3 * math.exp(-4) * len(est))), n_bad
    # mergeability: half-sketches sum cell-wise to the full sketch
    full = {(r["d"], r["cell"]): r["cnt"] for r in cms_build(ev, "user_id").collect()}
    lo = cms_build(ev.where(F.col("event_id") % 2 == 0), "user_id").collect()
    hi = cms_build(ev.where(F.col("event_id") % 2 == 1), "user_id").collect()
    merged: dict = {}
    for r in [*lo, *hi]:
        merged[(r["d"], r["cell"])] = merged.get((r["d"], r["cell"]), 0) + r["cnt"]
    assert merged == full


def test_histogram_quantiles_bracket_exact(spark):
    """The bracket contract: for each q, the exact rank-percentile
    (k = ceil(q*N)-th smallest value) lies within [est_lo, est_hi] of
    the reported bin (hi inclusive for the clamped max bin), and the
    brackets come from merged bin counts — the mergeable-quantile
    guarantee the operator exists for."""
    import math

    from pyspark.sql import functions as F

    from pubsub_mapreduce_spark.io import load_tables
    from pubsub_mapreduce_spark.operators.sketches import histogram_quantiles
    from tests.conftest import SF_MED

    ev = load_tables(spark, SF_MED)["events"]
    vals = sorted(r["value"] for r in ev.select("value").collect()
                  if r["value"] is not None)
    got = {r["q"]: r for r in histogram_quantiles(ev, "value").collect()}
    assert set(got) == {0.25, 0.5, 0.75, 0.95}
    for q, r in got.items():
        exact = vals[math.ceil(q * len(vals)) - 1]
        assert r["est_lo"] <= exact <= r["est_hi"], (q, exact, r)
        assert r["total"] == len(vals)


def test_cms_join_estimate_never_undercounts(spark):
    """Inner-product join estimation: est >= exact always (collisions
    only add), and with a wide grid vs small key domain the estimate
    is exact."""
    from pyspark.sql import functions as F

    from pubsub_mapreduce_spark.io import load_tables
    from pubsub_mapreduce_spark.operators.sketches import cms_join_estimate
    from tests.conftest import SF_SMALL

    t = load_tables(spark, SF_SMALL)
    r = cms_join_estimate(t["events"], "user_id", t["orders"], "o_custkey").first()
    assert r["overestimate"] >= 0
    assert r["est"] >= r["exact"] > 0
    # tiny planted tables, wide grid -> no collisions -> exact
    a = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    b = spark.createDataFrame([(1,), (2,), (2,)], "k long")
    r2 = cms_join_estimate(a, "k", b, "k", depth=4, width=1024).first()
    assert (r2["est"], r2["exact"]) == (4, 4)


def test_hll_overlap_check_planted_sets(spark):
    """Planted overlap: A∩B = 500 shared users of 1000/800; C disjoint.
    Exact overlaps must be exact, the I–E estimate must sit inside the
    3-term bound, and zero-overlap pairs must stay in the output."""
    from pubsub_mapreduce_spark.operators.sketches import hll_overlap_check

    rows = (
        [(i, "A") for i in range(1000)]
        + [(i, "B") for i in range(500, 1300)]
        + [(i, "C") for i in range(5000, 5200)]
    )
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {(r["type_a"], r["type_b"]): r
           for r in hll_overlap_check(ev).collect()}
    assert out[("A", "B")]["exact_overlap"] == 500
    assert out[("A", "C")]["exact_overlap"] == 0
    assert out[("B", "C")]["exact_overlap"] == 0
    assert all(r["within_bound"] for r in out.values())
    assert len(out) == 3

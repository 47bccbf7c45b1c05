"""Round-8 fix pins (VERDICT r7 ask #2): the rank.global_* two-pass
range-partitioned order statistics are BIT-IDENTICAL to the
single-partition ``Window.orderBy(...)`` forms they replaced in
spend_gini / rfm_segments / abc_parts / lorenz_deciles / skyline_2d /
weighted_median — and the rank stage actually runs across >1 partition
on multi-partition input (the whole point of the rewrite).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pubsub_mapreduce_spark.io import load_tables
from pubsub_mapreduce_spark.operators import rank as RK
from pubsub_mapreduce_spark.operators import relational as R
from pubsub_mapreduce_spark.operators import robust as RB

SF_MED = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def _per_cust(spark, sf):
    return (
        load_tables(spark, sf)["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            ).alias("cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def _order():
    return [F.col("cents").asc(), F.col("o_custkey").asc()]


def test_global_row_number_equals_window_sf01(spark):
    """Two-pass global row_number == single-partition window
    row_number on the real |customers| relation at sf0.1 (the equality
    pin VERDICT r7 #2 demands), for every customer."""
    pc = _per_cust(spark, SF_BIG)
    got = RK.global_row_number(
        pc, _order(), "i", with_total="n", small_threshold=0
    )
    w = Window.orderBy(*_order())
    want = pc.select("o_custkey", F.row_number().over(w).alias("i"))
    diff = (
        got.select("o_custkey", "i")
        .exceptAll(want)
        .union(want.exceptAll(got.select("o_custkey", "i")))
    )
    assert diff.count() == 0
    n = got.select("n").distinct().collect()
    assert len(n) == 1 and n[0][0] == pc.count()


def test_global_ntile_equals_window_sf01(spark):
    """Two-pass ntile(k) == window ntile(k) for the rfm/lorenz bucket
    counts at sf0.1 (k=4 and k=10), bucket-for-bucket."""
    pc = _per_cust(spark, SF_BIG)
    for k in (4, 10):
        got = RK.global_ntile(pc, _order(), k, "b", small_threshold=0)
        w = Window.orderBy(*_order())
        want = pc.select("o_custkey", F.ntile(k).over(w).alias("b"))
        diff = (
            got.select("o_custkey", "b")
            .exceptAll(want)
            .union(want.exceptAll(got.select("o_custkey", "b")))
        )
        assert diff.count() == 0


def test_global_ntile_small_n_edge(spark):
    """n < k: every row gets its own bucket 1..n — the SQL NTILE edge
    where q = 0 (the closed form's second branch must never fire)."""
    df = spark.createDataFrame([(3,), (1,), (2,)], "x long")
    got = {
        (r["x"], r["b"])
        for r in RK.global_ntile(
            df, [F.col("x").asc()], 10, "b", small_threshold=0
        ).collect()
    }
    assert got == {(1, 1), (2, 2), (3, 3)}


def test_global_prefix_sum_equals_window_sf01(spark):
    """Two-pass exclusive prefix sum == window ROWS UNBOUNDED
    PRECEDING AND -1 on the abc_parts revenue ordering at sf0.1."""
    rev = (
        load_tables(spark, SF_BIG)["lineitem"]
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * (1 - l_discount)"
                    " * 10000) AS BIGINT)"
                )
            ).alias("rev")
        )
    )
    order = [F.col("rev").desc(), F.col("l_partkey").asc()]
    got = RK.global_prefix_sum(
        rev, order, "rev", "cum_before", inclusive=False,
        small_threshold=0,
    ).select("l_partkey", "cum_before")
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = rev.select(
        "l_partkey",
        F.coalesce(F.sum("rev").over(w), F.lit(0)).alias("cum_before"),
    )
    diff = got.exceptAll(want).union(want.exceptAll(got))
    assert diff.count() == 0


def test_global_prefix_min_equals_window(spark):
    """Strict-prefix running min == window form, including the NULL
    first row and ties."""
    rows = [(1, 5), (2, 3), (3, 3), (4, 7), (5, 1), (6, 9)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = RK.global_prefix_min(
        df, [F.col("k").asc()], "v", "p", num_partitions=4,
        small_threshold=0,
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = df.select("k", F.min("v").over(w).alias("p"))
    g = {(r["k"], r["p"]) for r in got.select("k", "p").collect()}
    assert g == {(r["k"], r["p"]) for r in want.collect()}


def test_adaptive_small_path_identity(spark):
    """DEFAULT knobs at fixture scale take the single-window path; it
    must be cell-identical to the forced two-pass path (the adaptive
    cutover changes the plan, never the value)."""
    pc = _per_cust(spark, SF_MED)
    a = RK.global_ntile(pc, _order(), 4, "b").select("o_custkey", "b")
    b = RK.global_ntile(
        pc, _order(), 4, "b", small_threshold=0
    ).select("o_custkey", "b")
    assert a.exceptAll(b).union(b.exceptAll(a)).count() == 0


def test_rank_stage_is_multi_partition(spark):
    """The plan-shape assertion VERDICT r7 #2 demands: on a
    multi-partition input the staged rank relation occupies >1 range
    partition (i.e. the rank work is spread across tasks, not funneled
    through Exchange SinglePartition)."""
    pc = _per_cust(spark, SF_MED).repartition(8)
    staged = RK._staged(pc, _order(), None)
    pids = staged.select(RK._PID).distinct().count()
    assert pids > 1
    # and the single-partition stage the helper DOES keep is the P-row
    # offsets relation, bounded by shuffle partitions
    assert (
        RK._offsets(staged, F.count(F.lit(1)).cast("long"), 0).count()
        == pids
    )


def test_weighted_median_two_level_equals_row_level(spark):
    """The (g, v) pre-aggregated weighted median == the row-level
    window form it replaced, per return flag on the sf0.01 lineitem
    fixture (all four output columns)."""
    li = load_tables(spark, SF_MED)["lineitem"]
    got = RB.weighted_median(
        li,
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long"),
        F.col("l_quantity").cast("long"),
        tiebreak="l_orderkey",
    )
    # row-level reference (the pre-r8 implementation, verbatim)
    d = li.select(
        F.col("l_returnflag").alias("g"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
        F.col("l_orderkey").alias("tb"),
    )
    wc = Window.partitionBy("g").orderBy("v", "tb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("g")
    c = d.select(
        "g",
        "v",
        F.sum("w").over(wc).alias("cum"),
        F.sum("w").over(wt).alias("tot"),
        F.count(F.lit(1)).over(wt).alias("n_rows"),
    ).where(F.lit(2) * F.col("cum") >= F.col("tot"))
    pick = Window.partitionBy("g").orderBy("cum", "v")
    want = (
        c.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            F.col("g").alias("l_returnflag"),
            "n_rows",
            F.col("tot").alias("total_weight"),
            F.col("v").alias("weighted_median"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_skyline_equals_quadratic_not_exists(spark):
    """skyline_2d with the global_prefix_min frontier == the quadratic
    NOT-EXISTS dominance definition on the sf0.01 orders fixture."""
    orders = (
        load_tables(spark, SF_MED)["orders"]
        .select(
            "o_orderkey",
            "o_totalprice",
            F.datediff(
                F.col("o_orderdate"), F.lit("1992-01-01").cast("date")
            ).alias("order_day"),
        )
    )
    got = R.skyline_2d(orders, "o_totalprice", "order_day", "o_orderkey")
    a = orders.alias("a")
    b = orders.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("b.o_totalprice") <= F.col("a.o_totalprice"))
            & (F.col("b.order_day") <= F.col("a.order_day"))
            & (
                (F.col("b.o_totalprice") < F.col("a.o_totalprice"))
                | (F.col("b.order_day") < F.col("a.order_day"))
            ),
            "left_semi",
        )
        .select("a.o_orderkey")
    )
    want = orders.join(dominated, "o_orderkey", "left_anti").select(
        "o_orderkey", "o_totalprice", F.col("order_day").alias("__gy")
    )
    g = sorted(
        (r["o_orderkey"], r[1], r[2]) for r in got.collect()
    )
    assert len(g) > 0
    assert g == sorted((r[0], r[1], r[2]) for r in want.collect())


def test_registered_rank_queries_consistency(spark):
    """End-to-end sanity of the four rewritten registered queries at
    sf0.01: decile/quartile populations partition the customers, gini
    in [0, 1], ABC classes cover all parts."""
    import __spark_entry__ as m

    n_cust = (
        load_tables(spark, SF_MED)["orders"]
        .select("o_custkey")
        .distinct()
        .count()
    )
    lor = m.queries()["lorenz_deciles"](spark, SF_MED).collect()
    assert len(lor) == 10
    assert sum(r["n_customers"] for r in lor) == n_cust
    assert abs(lor[-1]["cum_share"] - 1.0) < 1e-9
    rfm = m.queries()["rfm_segments"](spark, SF_MED).collect()
    assert sum(r["n_customers"] for r in rfm) == n_cust
    gini = m.queries()["spend_gini"](spark, SF_MED).collect()[0]
    assert gini["n_customers"] == n_cust and 0.0 <= gini["gini"] <= 1.0
    n_parts = (
        load_tables(spark, SF_MED)["lineitem"]
        .select("l_partkey")
        .distinct()
        .count()
    )
    abc = m.queries()["abc_parts"](spark, SF_MED).collect()
    assert sum(r["n_parts"] for r in abc) == n_parts

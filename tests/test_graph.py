"""Integer PageRank invariants: hand-computed micro-graph, mass
conservation under flooring, and partitioning-independence (the
property the integer formulation exists to guarantee)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators.graph import SCALE, pagerank


def edges_df(spark, rows):
    return spark.createDataFrame(
        rows, "type_from string, type_to string, n_transitions long"
    )


def test_pagerank_micro_graph_by_hand(spark):
    """A -> B (w=1): after one iteration A holds only the base mass,
    B gets base + 85% of A's initial rank — checked against the exact
    integer arithmetic by hand."""
    e = edges_df(spark, [("A", "B", 1)])
    r = {x["node"]: x["r"] for x in pagerank(e, iters=1).collect()}
    base = (15 * SCALE) // (100 * 2)
    assert r == {"A": base, "B": base + (85 * (SCALE // 2)) // 100}


def test_pagerank_mass_and_sink_ordering(spark):
    """Star graph A,B,C -> D: the sink must out-rank every source, and
    total mass never exceeds scale (flooring only leaks downward)."""
    e = edges_df(spark, [("A", "D", 2), ("B", "D", 1), ("C", "D", 5)])
    r = {x["node"]: x["r"] for x in pagerank(e, iters=3).collect()}
    assert r["D"] > max(r["A"], r["B"], r["C"])
    assert sum(r.values()) <= SCALE
    assert all(v >= 0 for v in r.values())


def test_pagerank_partitioning_independent(spark, tables):
    """Same bits whatever the physical layout: rank the fixture
    transition graph from a 1-partition and a 13-partition edge list
    and require exact equality — integer sums are order-free, which is
    the whole point of the scaled formulation."""
    from pubsub_mapreduce_spark.operators.relational import session_transitions

    edges = session_transitions(tables)
    a = {r["node"]: r["r"] for r in pagerank(edges.coalesce(1)).collect()}
    b = {r["node"]: r["r"] for r in pagerank(edges.repartition(13)).collect()}
    assert a == b and len(a) > 1


def test_triangle_count_k4_and_square(spark):
    """K4 has 4 triangles, every node in 3; a 4-cycle has none; edge
    direction and duplicates must not double-count."""
    from pubsub_mapreduce_spark.operators.graph import triangle_count

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d"), ("c", "b")]  # one reversed duplicate
    e = spark.createDataFrame(k4, "u string, v string")
    rows = triangle_count(e).collect()
    assert rows and all(r["total_triangles"] == 4 for r in rows)
    assert {r["node"]: r["n_triangles"] for r in rows} == {
        "a": 3, "b": 3, "c": 3, "d": 3,
    }
    square = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], "u string, v string"
    )
    assert triangle_count(square).count() == 0


def test_bfs_hops_star_with_tail(spark):
    """Star centre (max degree) is the seed; hop = path length; nodes
    in other components never appear; max_hops truncates the frontier.
    Graph: 1-{2,3,4}, 4-5, 5-6 plus a disconnected 10-11 edge."""
    from pubsub_mapreduce_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (4, 5), (5, 6), (10, 11)],
        "a long, b long",
    )
    full = {r["node"]: r["hop"] for r in bfs_hops(e, max_hops=4).collect()}
    assert full == {1: 0, 2: 1, 3: 1, 4: 1, 5: 2, 6: 3}
    near = {r["node"]: r["hop"] for r in bfs_hops(e, max_hops=1).collect()}
    assert near == {1: 0, 2: 1, 3: 1, 4: 1}


def test_bfs_hops_seed_tiebreak_min_id(spark):
    """All nodes tie on degree -> the smallest id wins the seed slot,
    deterministically, whatever the physical partitioning."""
    from pubsub_mapreduce_spark.operators.graph import bfs_hops

    e = spark.createDataFrame([(7, 8), (3, 9)], "a long, b long")
    got = {r["node"]: r["hop"] for r in bfs_hops(e.repartition(5)).collect()}
    assert got == {3: 0, 9: 1}


def test_component_size_histogram_by_hand(spark):
    """Two triangles, a chain of 3 and a lone pair: three size-3
    components (the chain counts by reach, not by shape) plus one
    size-2 — histogram {3: (3 comps, 9 nodes), 2: (1, 2)}."""
    from pubsub_mapreduce_spark.operators.graph import (
        component_size_histogram,
    )

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3),
         (4, 5), (5, 6), (4, 6),
         (10, 11),
         (20, 21), (21, 22)],
        "a long, b long",
    )
    got = {r["size"]: (r["n_components"], r["n_nodes"])
           for r in component_size_histogram(e).collect()}
    assert got == {3: (3, 9), 2: (1, 2)}


def test_component_size_histogram_distributed_path(spark):
    """Forcing the distributed min-label path (cap 0) must produce the
    same census as the driver union-find."""
    from pubsub_mapreduce_spark.operators.dedup import connected_components
    from pyspark.sql import functions as F2

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)], "a long, b long"
    )
    dist = connected_components(e, max_driver_edges=0)
    sizes = (
        dist.groupBy("component").agg(F2.count(F2.lit(1)).alias("size"))
        .groupBy("size").count()
    )
    got = {r["size"]: r["count"] for r in sizes.collect()}
    assert got == {3: 2, 2: 1}


def test_item_cf_recs_hand_cosines(spark):
    """Edges 1-2 (w=4) and 1-3 (w=1): degrees s1=5, s2=4, s3=1, so
    sim(1,2) = 4/sqrt(20) and sim(1,3) = 1/sqrt(5) — item 1 ranks 2
    before 3, and the leaf items each recommend only item 1."""
    import math

    from pubsub_mapreduce_spark.operators.graph import item_cf_recs

    e = spark.createDataFrame([(1, 2, 4), (1, 3, 1)], "a long, b long, w long")
    rows = item_cf_recs(e, k=5).collect()
    got = {(r["item"], r["rnk"]): (r["rec"], r["sim_r"]) for r in rows}
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    assert got[(1, 1)] == (2, r6(4 / math.sqrt(20)))
    assert got[(1, 2)] == (3, r6(1 / math.sqrt(5)))
    assert got[(2, 1)][0] == 1 and got[(3, 1)][0] == 1
    assert len(rows) == 4

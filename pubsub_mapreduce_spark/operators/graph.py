"""Graph analytics over edge lists derived from the warehouse tables.

Connected components (dedup.connected_components) handles the
equivalence-closure case; this module adds centrality. Everything is
INTEGER arithmetic by design: scaled ranks, integer division, integer
sums — bit-reproducible across engines and partitionings (float
PageRank sums are summation-order-dependent and can never carry an
exact cross-engine oracle), so even an iterative algorithm gets a full
value-hash oracle via unrolled-CTE SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1_000_000
DECZ = "decimal(38,0)"


def pagerank(
    edges: DataFrame,
    src: str = "type_from",
    dst: str = "type_to",
    weight: str = "n_transitions",
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
) -> DataFrame:
    """Weighted PageRank, integer-exact, fixed iteration count.

    rank'(v) = base + (d_num * S_v) div d_den, where
    S_v = sum over in-edges (u,v) of (rank(u) * w_uv) div W_u,
    base = ((d_den - d_num) * scale) div (d_den * N).

    Every operation is int64 (div = integral division, sums of
    integers are order-free), so the result is a pure function of the
    edge multiset — same bits on any engine, any partitioning, any
    schedule. Dangling mass (nodes with no out-edges) is dropped, the
    standard pruned variant; flooring leaks at most one unit per edge
    per iteration, bounded and deterministic.

    Scale shape: each iteration is one join of the edge list against
    the |nodes|-sized rank relation on src (both pre-partitioned on
    the same key at scale) + one dst-keyed integer aggregate — the
    textbook distributed PageRank step. ``iters`` is fixed, not
    converged-tested, to keep the plan static; N and the edge/degree
    relations are computed once and reused across iterations.
    Overflow headroom: rank <= scale, so rank * w stays within int64
    for total edge weight < 2^63 / scale (~9e12 events at the default
    scale — raise ``scale`` granularity only with narrower weights).
    """
    e = (
        edges.select(
            F.col(src).alias("u"),
            F.col(dst).alias("v"),
            F.col(weight).cast("long").alias("w"),
        )
        .persist()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded by the node universe, not the event volume
    outw = e.groupBy("u").agg(F.sum("w").alias("wout"))
    # pre-join the out-weight onto the edge list ONCE (optimization r9,
    # guide §2.4): the former loop joined r AND outw per iteration —
    # one u-keyed join per round instead of two, same r*w div wout
    ew = e.join(outw, "u").persist()
    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    r = nodes.select("node", F.lit(scale // n).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            ew.join(r.withColumnRenamed("node", "u"), "u")
            .select(
                F.col("v").alias("node"),
                F.expr("r * w div wout").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        r = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"{damping_num} * coalesce(s, 0L) div {damping_den}"
                )
            ).cast("long").alias("r"),
        )
    # materialize the final ranks (node-universe-sized) and RELEASE the
    # three persisted relations (ADVICE r9 / guide §5: a long-lived
    # session running many graph queries otherwise pins a corpus-sized
    # cached edge list per call, forever). The eager checkpoint runs
    # the same jobs the first consumer would have triggered — identical
    # values, bounded cache lifetime.
    r = r.localCheckpoint(eager=True)
    for c in (ew, nodes, e):
        c.unpersist()
    return r


def duckdb_pagerank_sql(
    edges_cte: str,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
) -> str:
    """Unrolled-iteration DuckDB mirror of ``pagerank``. ``edges_cte``
    must yield (u, v, w). Integer ops only — `//` on positive BIGINTs
    == Spark's `div` — so the mirror is exact, not approximate."""
    blocks = [
        f"""e AS ({edges_cte}),
      nodes AS (SELECT DISTINCT u AS node FROM e
                UNION SELECT DISTINCT v FROM e),
      nn AS (SELECT count(*) AS n FROM nodes),
      outw AS (SELECT u, CAST(sum(w) AS BIGINT) AS W FROM e GROUP BY 1),
      r0 AS (SELECT node, CAST({scale} // nn.n AS BIGINT) AS r
             FROM nodes, nn)"""
    ]
    for i in range(iters):
        blocks.append(
            f"""c{i + 1} AS (
        SELECT e.v AS node, CAST(sum((r.r * e.w) // o.W) AS BIGINT) AS s
        FROM e JOIN r{i} r ON r.node = e.u JOIN outw o ON o.u = e.u
        GROUP BY 1),
      r{i + 1} AS (
        SELECT n.node,
               CAST((({damping_den} - {damping_num}) * {scale})
                      // ({damping_den} * nn.n)
                    + ({damping_num} * COALESCE(c.s, 0)) // {damping_den}
                 AS BIGINT) AS r
        FROM nodes n CROSS JOIN nn LEFT JOIN c{i + 1} c ON c.node = n.node)"""
        )
    return (
        "WITH " + ",\n      ".join(blocks) + f"\n      SELECT node, r FROM r{iters}"
    )


def triangle_count(
    edges: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """Undirected triangle count per node + the global total — the
    clustering/community density metric that rounds out the graph
    toolbox (components = connectivity, PageRank = centrality,
    triangles = cohesion).

    The classic distributed formulation: canonicalize each edge to
    (lo, hi), dedupe, then join edge (a,b) with edge (b,c) and close
    with (a,c) — every triangle found exactly once because a < b < c.
    Two joins riding the edge-key hash; at scale the standard
    degree-ordering optimization (orient edges from low- to
    high-degree endpoints) bounds the wedge fan-out, noted here and
    unnecessary at the fixture's graph size. Integer counts — exact
    everywhere."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    ac = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (
        ab.join(bc, "y")
        .join(ac, ["x", "z"])
        .select("x", "y", "z")
    )
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    total = tri.agg(F.count(F.lit(1)).alias("__t"))
    from pyspark.sql.functions import broadcast

    return per_node.crossJoin(broadcast(total)).select(
        "node", "n_triangles", F.col("__t").alias("total_triangles")
    )


def copurchase_edges(lineitem: DataFrame, min_w: int = 2) -> DataFrame:
    """Weighted part co-purchase graph: (a, b, w) for parts appearing in
    the same order at least ``min_w`` times (a < b, undirected-stored-
    once). The (order, part) dedup collapses line-level volume first;
    the self-join is keyed on the order and order sizes are bounded
    (TPC-H: <= 7 lines), so pair fan-out per order is O(size^2), never
    corpus-quadratic."""
    # One order-keyed collect_set replaces the former distinct +
    # order-keyed self-join (optimization r9, guide §2.4): the dedup,
    # both join branches and the pair fan-out collapse into ONE
    # exchange on l_orderkey; pairs are generated map-side from the
    # sorted per-order part set (orders are bounded — TPC-H <= 7 lines
    # — so the HOF product is O(size^2) per order, same as the join's
    # fan-out). Pair multiset identical by construction: sorted
    # distinct parts x < y  <=>  the join's x.pk < y.pk on distinct
    # (ok, pk). A/B at sf0.1: edge build 2.0s -> 0.8s, inherited by
    # every co-purchase consumer (moran_geary, part_* family,
    # betweenness, eccentricity, ...).
    # NOTE: widening the scan before this partial aggregate was A/B'd
    # and REVERTED (bench map: every co-purchase consumer regressed
    # +0.2-0.6s with widen(8) — the round-robin exchange of the raw
    # rows costs more than the single-task partial collect_set saves;
    # at 100TB the scan is already wide and this is moot either way).
    parts = (
        lineitem.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        )
        .groupBy("ok")
        .agg(F.sort_array(F.collect_set("pk")).alias("ps"))
        .select(F.col("ps"))
        .where(F.size("ps") >= 2)
    )
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ps"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("ps"), i + F.lit(2), F.size(F.col("ps"))
                    ),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
    )
    return (
        parts.select(pair.alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= min_w)
    )


def label_propagation(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Deterministic synchronous weighted label propagation: every node
    starts as its own label; each round it adopts the label with the
    largest total incident edge weight among its neighbors (ties ->
    smallest label; isolated nodes keep their own). ``iters`` fixed
    rounds, so the whole run is a finite composition of joins and
    integer argmax aggregates — exactly value-hashable, and the DuckDB
    oracle unrolls the identical rounds.

    Community detection for the dedup/curation family: groups of parts
    (or docs, via near-dup edges) that hang together. Scale shape: per
    round ONE node-keyed join + ONE (node, label)-keyed aggregate, all
    exchanges on the node key so the partitioning is reused; state is
    the |nodes|-sized label table, never materialized on the driver.
    Sync variant (not async) so results are order-independent."""
    # Catalyst has no cross-branch CSE: every round re-references the
    # edge relation, so an unchecked lineage replays the lineitem
    # self-join each round. Checkpointing UND alone is the measured
    # sweet spot at sf0.1 (2.6s vs 3.6s also-checkpointing-labels —
    # three extra materialization barriers cost more than the pruned
    # label lineage saves — vs 3.2s unchecked).
    und = edges.select("a", "b", "w").union(
        edges.select(
            F.col("b").alias("a"), F.col("a").alias("b"), F.col("w")
        )
    ).localCheckpoint(eager=False)
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(iters):
        contrib = (
            und.join(
                labels.withColumnRenamed("node", "b_node"),
                F.col("b") == F.col("b_node"),
            )
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.sum("w").alias("lw"))
        )
        wpick = Window.partitionBy("node").orderBy(
            F.desc("lw"), F.asc("label")
        )
        pick = (
            contrib.withColumn("rn", F.row_number().over(wpick))
            .where(F.col("rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(pick, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
        )
    return labels


def kcore_peel(edges: DataFrame, k: int = 3, rounds: int = 3) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` synchronous passes of "drop
    every node with degree < k (and its edges)" over an undirected
    weighted edge list — the standard filter for hairball graphs
    (keep the cohesive core, shed the tendrils) before community or
    centrality work. Full k-core decomposition iterates to a fixed
    point whose round count is data-dependent; fixing ``rounds`` keeps
    the operator a finite relational composition (exact value-hash
    oracle by unrolling — same contract as label_propagation /
    pagerank) and each pass only shrinks the graph, so the result is a
    SUPERSET of the true k-core that converges monotonically; tests
    pin fixed-point equality on graphs that settle within the budget.

    Per round: one node-keyed degree aggregate + two semi-joins, all
    exchanges on the node key. Emits surviving nodes with their final
    within-subgraph degree."""
    # same no-cross-branch-CSE hazard as label_propagation: cur feeds
    # three branches per round (degree + two semi-joins), so without
    # the per-round checkpoint the edge build replays ~3^rounds times
    # (measured 6.6s for 3 rounds at sf0.1; checkpointed: ~1s).
    und = edges.select("a", "b").union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    cur = und.localCheckpoint(eager=False)
    for _ in range(rounds):
        deg = cur.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("a")
        cur = (
            cur.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
    return cur.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("core_deg")
    )


def bfs_hops(edges: DataFrame, max_hops: int = 4) -> DataFrame:
    """Single-source BFS: minimum hop distance from the smallest node
    in the edge list to every node within ``max_hops``, over the
    undirected graph — the frontier-expansion primitive (reachability,
    blast-radius, recommendation radius) that LPA/PageRank/k-core
    don't cover: those iterate over ALL nodes every round, BFS's working
    set is only the newly-reached frontier.

    The seed is picked IN-PLAN (the max-degree node, ties to the
    smallest id — two 1-row aggregates broadcast into round 1):
    deterministic at any SF, no driver collect, and it lands in the
    dense region of the graph (the min-id seed it replaced sat in a
    2-node component at sf0.1 — a seed rule must be
    degree-aware to survive refixturing). Level-set formulation:
    L_h = distinct neighbors of
    L_{h-1}; hop(v) = min h with v in L_h, taken by ONE final
    (node)-keyed min aggregate over the unioned level relations — so
    each round is a single join + distinct (one keyed shuffle), with
    no per-round anti-join. Measured A/B at sf0.01 (warm): level-set
    1.7s vs the Pregel frontier/visited anti-join form 2.8s (and 10.1s
    with per-round localCheckpoint barriers — 2 scheduled jobs per
    round cost more than the replayed frontier-sized joins they
    truncate). The level sets re-join the full <=h reach set each
    round, which for the small fixed ``max_hops`` this op targets is
    within a constant of the frontier (growth regime); a deep-BFS
    variant (max_hops >~ 6, saturating reach) should flip to
    frontier + anti-join with per-round checkpoints.

    Rounds are fixed (``max_hops``), keeping the plan static and the
    oracle unrollable by a hop-bounded recursive CTE; only the edge
    list is localCheckpoint'd (Catalyst has no cross-branch CSE — an
    unchecked lineage would replay the upstream edge build every
    round). Integer-exact throughout (node ids + hop counters), so
    the oracle value-hashes bit-for-bit."""
    und = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=False)
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    maxdeg = deg.agg(F.max("deg").alias("maxdeg"))
    level = (
        deg.join(F.broadcast(maxdeg), F.col("deg") == F.col("maxdeg"))
        .agg(F.min("a").alias("node"))
    )
    out = level.select("node", F.lit(0).cast("int").alias("hop"))
    for h in range(1, max_hops + 1):
        level = (
            level.join(und, F.col("node") == F.col("a"))
            .select(F.col("b").alias("node"))
            .distinct()
        )
        out = out.union(
            level.select("node", F.lit(h).cast("int").alias("hop"))
        )
    return out.groupBy("node").agg(F.min("hop").alias("hop"))


def component_size_histogram(edges: DataFrame) -> DataFrame:
    """Component census over an undirected edge list: true transitive-
    closure connected components (the hybrid driver-union-find /
    distributed min-label machinery from ``dedup.connected_components``
    — same cap, same convergence contract), rolled into a
    counts-of-sizes histogram (size, n_components, n_nodes). The
    one-number health check for any pairwise relation: a dedup pair
    source whose largest component suddenly spans half the corpus, or
    a co-purchase graph collapsing into one giant hairball, shows up
    here before any downstream consumer breaks.

    Scale shape: closure cost is the validated hybrid's (bounded
    driver collect under the 5M-edge cap, per-round checkpointed
    min-label loop above it); the census itself is two keyed rollups
    over |nodes| then |components| rows — the histogram relation is
    bounded by the number of DISTINCT sizes, which is at most
    O(sqrt(n_nodes)) (sum of distinct sizes <= n). Exact integers
    throughout."""
    from .dedup import connected_components

    comps = connected_components(edges, a="a", b="b")
    sizes = comps.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("size")
    )
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_components"))
        .select(
            "size",
            "n_components",
            (F.col("size") * F.col("n_components"))
            .cast("long")
            .alias("n_nodes"),
        )
    )


def item_cf_recs(edges: DataFrame, k: int = 5) -> DataFrame:
    """Item-item collaborative-filtering recommendations from the
    weighted co-purchase graph: for every part, the top-``k`` most
    similar parts by co-occurrence cosine sim(a,b) =
    w_ab / sqrt(s_a * s_b), where s_x is x's weighted degree — the
    classic "customers who bought X also bought" readout, computed
    entirely from the edge list (no user-item matrix materialized).

    Exactness: w and the degrees are BIGINT sums; the degree product
    is one int64 multiply and the score one division by an
    IEEE-correctly-rounded sqrt — bit-equal doubles, so the
    (sim DESC, neighbor ASC) top-k ordering is engine-independent and
    the rounded score value-hashes. Scale: degrees are one keyed
    rollup over edges; scoring decorates each edge twice via the
    degree relation (broadcast when |parts| is small, shuffle-join
    otherwise — Catalyst's call); the per-item window orders each
    item's neighbor list only."""
    und = edges.select("a", "b", "w").union(
        edges.select(
            F.col("b").alias("a"), F.col("a").alias("b"), F.col("w")
        )
    )
    deg = und.groupBy("a").agg(F.sum("w").cast("long").alias("s"))
    scored = (
        und.join(deg.select(F.col("a"), F.col("s").alias("sa")), "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("s").alias("sb")),
            "b",
        )
        .select(
            F.col("a").alias("item"),
            F.col("b").alias("rec"),
            F.col("w").cast("long").alias("w"),
            (
                F.col("w")
                / F.sqrt((F.col("sa") * F.col("sb")).cast("double"))
            ).alias("sim"),
        )
    )
    win = Window.partitionBy("item").orderBy(
        F.col("sim").desc(), F.col("rec").asc()
    )
    from ..functions.text import round_half_up

    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= k)
        .select(
            "item",
            "rnk",
            "rec",
            "w",
            round_half_up(F.col("sim"), 6).alias("sim_r"),
        )
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "u", dst: str = "v", min_degree: int = 2
) -> DataFrame:
    """Local clustering coefficient per node — triangles normalized by
    the node's wedge count, the cohesion DENSITY readout on top of
    ``triangle_count``'s raw counts:

        cc(v) = 2 * tri(v) / (deg(v) * (deg(v) - 1))

    Integer everywhere (triangle and degree counts) with ONE division
    under round_half_up; nodes below ``min_degree`` have no wedges and
    drop by integer predicate. Scale shape: the triangle join is
    triangle_count's (canonical a<b<c closure); degrees are one keyed
    rollup of the deduped edge set — both exchanges on the node key."""
    from pyspark.sql.functions import broadcast  # noqa: F401

    from ..functions.text import round_half_up

    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    ac = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = ab.join(bc, "y").join(ac, ["x", "z"]).select("x", "y", "z")
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    z = F.lit(0).cast("long")
    joined = deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", z).alias("n_triangles"),
    )
    cc = (2 * F.col("n_triangles")).cast("double") / (
        F.col("degree") * (F.col("degree") - 1)
    ).cast("double")
    return joined.where(F.col("degree") >= min_degree).select(
        "node",
        "degree",
        "n_triangles",
        round_half_up(cc, 6).alias("clustering_coeff"),
    )


def adamic_adar(
    edges: DataFrame, top_k: int = 100, max_deg: int = 200
) -> DataFrame:
    """Adamic–Adar link prediction over the co-purchase graph: for every
    NON-edge pair (u, v) sharing at least one neighbor, score

        AA(u, v) = sum_{w in N(u) & N(v), 2 <= deg(w) <= max_deg}
                   1 / ln(deg(w))

    and emit the ``top_k`` candidates — "parts that are not yet bought
    together but whose neighborhoods say they will be" (the classic
    complement to ``item_cf_recs``: CF ranks within observed edges,
    this predicts MISSING ones, rare-neighbor-weighted so sharing a
    niche part means more than sharing a bestseller).

    Exactness: each neighbor's contribution is QUANTIZED to integer
    micros — floor(1e6 / ln(deg) + 0.5) on a BIGINT degree — so the
    per-pair score is an exact BIGINT sum (no float-sum reassociation),
    and ranking/tie-breaks are integer-deterministic (aa_micro desc,
    u, v). deg >= 2 is definitional (ln 1 = 0); ``max_deg`` is the skew
    cap: the common-neighbor expansion fans out sum_w C(deg_w, 2), so
    one hub node would otherwise quadratically dominate the shuffle
    (the dedup max_df precedent) while contributing the least possible
    weight per pair — at the default cap each dropped hub term is
    worth < 1/ln(200) ~ 0.19.

    Scale: neighbor lists shuffle once on the common node w; the
    expansion is bounded per w by the cap; the anti-join that removes
    existing edges and the final TakeOrdered(top_k) keep the output
    constant-sized."""
    und = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=False)
    )
    deg = und.groupBy(F.col("a").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    mid = deg.where((F.col("d") >= 2) & (F.col("d") <= max_deg)).select(
        "w",
        F.floor(F.lit(1000000.0) / F.log(F.col("d").cast("double")) + 0.5)
        .cast("long")
        .alias("contrib"),
    )
    nbr = und.select(F.col("b").alias("w"), F.col("a").alias("n"))
    x = nbr.join(mid, "w").select("w", "contrib", F.col("n").alias("u"))
    y = nbr.select("w", F.col("n").alias("v"))
    pairs = (
        x.join(y, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.sum("contrib").cast("long").alias("aa_micro"),
            F.count(F.lit(1)).cast("long").alias("n_common"),
        )
    )
    non_edges = pairs.join(
        und.select(F.col("a").alias("u"), F.col("b").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    return (
        non_edges.orderBy(
            F.desc("aa_micro"), F.asc("u"), F.asc("v")
        )
        .limit(top_k)
        .select(
            "u",
            "v",
            "n_common",
            "aa_micro",
            (F.col("aa_micro").cast("double") / 1000000.0).alias("aa"),
        )
    )


def neighbor_jaccard(
    edges: DataFrame, top_k: int = 100, max_deg: int = 200
) -> DataFrame:
    """Neighborhood Jaccard similarity over the co-purchase graph: for
    every pair (u, v) sharing >= 1 eligible common neighbor,

        J(u, v) = |N*(u) & N*(v)| / |N*(u) | N*(v)|

    where N* keeps only neighbors w with 2 <= deg(w) <= ``max_deg`` —
    the set-overlap companion to ``adamic_adar`` (AA weights shared
    rare neighbors; Jaccard normalizes by neighborhood SIZE, so a
    2-neighbor part sharing both with another reads 1.0 while a
    500-neighbor hub sharing two reads ~0) — the substitutable-parts
    signal deduplication and recommendation both consume.

    The hub cap is SEMANTIC here, not just a shuffle guard: both the
    intersection and the capped degrees |N*| count the same eligible
    neighbor set, so J is the exact Jaccard of the hub-filtered
    neighborhoods (documented contract; the adamic_adar max_deg
    precedent, same C(deg, 2) expansion bound).

    Exactness: pure integer counts; the score ships as jac_micro =
    floor(common * 1e6 / union + 0.5) so ranking and tie-breaks
    (jac_micro desc, n_common desc, u, v) never touch a float."""
    und = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=False)
    )
    deg = und.groupBy(F.col("a").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    mid = deg.where((F.col("d") >= 2) & (F.col("d") <= max_deg)).select(
        "w"
    )
    nbr = und.select(F.col("b").alias("w"), F.col("a").alias("n"))
    elig = nbr.join(mid, "w").localCheckpoint(eager=False)
    cap_deg = elig.groupBy(F.col("n").alias("u")).agg(
        F.count(F.lit(1)).cast("long").alias("dcap")
    )
    x = elig.select("w", F.col("n").alias("u"))
    y = elig.select("w", F.col("n").alias("v"))
    pairs = (
        x.join(y, "w")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    j = (
        pairs.join(cap_deg, "u")
        .withColumnRenamed("dcap", "du")
        .join(
            cap_deg.select(
                F.col("u").alias("v"), F.col("dcap").alias("dv")
            ),
            "v",
        )
    )
    uni = F.col("du") + F.col("dv") - F.col("n_common")
    scored = j.select(
        "u",
        "v",
        "n_common",
        F.col("du").cast("long").alias("du"),
        F.col("dv").cast("long").alias("dv"),
        F.floor(
            F.col("n_common").cast("double")
            * 1000000.0
            / uni.cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("jac_micro"),
    )
    return (
        scored.orderBy(
            F.desc("jac_micro"), F.desc("n_common"), F.asc("u"), F.asc("v")
        )
        .limit(top_k)
        .select(
            "u",
            "v",
            "n_common",
            "du",
            "dv",
            "jac_micro",
            (F.col("jac_micro").cast("double") / 1000000.0).alias(
                "jaccard"
            ),
        )
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity of the co-purchase graph: the Pearson
    correlation of endpoint degrees over all ORDERED edge incidences
    (each undirected edge contributes both orientations, the standard
    Newman r) — positive reads "popular parts co-purchase with popular
    parts" (assortative mixing), negative the hub-and-spoke opposite;
    the one-number topology summary that says whether degree-targeted
    partitioning/salting will pay.

    Exactness: all five moments are exact integers (DECIMAL(38)
    squares — degree products overflow int64 on dense graphs); r is
    ONE mirrored float expression, shipped as r_plus1 (the -0.0
    convention). Zero-variance (regular) graphs drop by integer
    predicate.

    Scale: one degree rollup, one broadcast-degree decoration of the
    edge list, one global moment rollup — no quadratic stage."""
    und = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=False)
    )
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    DEC = "decimal(38,0)"
    inc = (
        und.join(
            deg.select(F.col("node").alias("a"), F.col("d").alias("x")),
            "a",
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("d").alias("y")),
            "b",
        )
    )
    m = inc.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(DEC) * F.col("y").cast(DEC))
        .cast(DEC)
        .alias("sxy"),
        F.sum(F.col("x").cast(DEC) * F.col("x").cast(DEC))
        .cast(DEC)
        .alias("sx2"),
        F.sum(F.col("y").cast(DEC) * F.col("y").cast(DEC))
        .cast(DEC)
        .alias("sy2"),
    )
    vx = (
        F.col("m").cast(DEC) * F.col("sx2")
        - F.col("sx").cast(DEC) * F.col("sx").cast(DEC)
    ).cast("double")
    vy = (
        F.col("m").cast(DEC) * F.col("sy2")
        - F.col("sy").cast(DEC) * F.col("sy").cast(DEC)
    ).cast("double")
    num = (
        F.col("m").cast(DEC) * F.col("sxy")
        - F.col("sx").cast(DEC) * F.col("sy").cast(DEC)
    ).cast("double")
    from ..functions.text import round_half_up

    return m.where((vx > 0) & (vy > 0)).select(
        (F.col("m") / 2).cast("long").alias("n_edges"),
        round_half_up(
            num / (F.sqrt(vx) * F.sqrt(vy)) + F.lit(1.0), 6
        ).alias("r_plus1"),
    )


def hits_scores(
    orders: DataFrame, lineitem: DataFrame, top_k: int = 20
) -> DataFrame:
    """Two-iteration HITS over the customer-part purchase bipartite
    graph, ALL-INTEGER: h0(u) = 1; a1(p) = in-degree; h1(u) = sum of
    a1 over u's parts; a2(p) = sum of h1 over p's buyers — authority
    reads "parts bought by customers who buy well-bought parts", the
    mutual-reinforcement ranking plain degree can't give (event_pagerank
    ranks a unipartite session graph; this ranks the bipartite
    purchase structure). Unnormalized integer iterations, normalized
    ONCE at the end — so every intermediate is an exact BIGINT and the
    oracle mirrors by two unrolled joins, no float drift to chase.

    Exactness: integer sums; auth_ratio = a2/max(a2) is the single
    mirrored division; ordering (a2 desc, part asc) is integer.

    Scale: the edge list shuffles twice (once per iteration side) on
    its natural keys; at 1000 executors each iteration is one keyed
    aggregate — the degree-bounded fan-out never materializes pairs.
    Int64 envelope: a2 <= max_deg_p * max_deg_u * max_deg_p."""
    edges = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            lineitem.select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    a1 = edges.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("a1"))
    h1 = (
        edges.join(a1, "p")
        .groupBy("u")
        .agg(F.sum("a1").cast("long").alias("h1"))
    )
    a2 = (
        edges.join(h1, "u")
        .groupBy("p")
        .agg(F.sum("h1").cast("long").alias("a2"))
    )
    mx = a2.agg(F.max("a2").alias("mx"))
    from ..functions.text import round_half_up

    return (
        a2.crossJoin(F.broadcast(mx))
        .orderBy(F.desc("a2"), F.asc("p"))
        .limit(top_k)
        .select(
            F.col("p").alias("partkey"),
            F.col("a2").alias("authority"),
            round_half_up(
                F.col("a2").cast("double") / F.col("mx").cast("double"),
                6,
            ).alias("auth_ratio"),
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    src: str = "type_from",
    dst: str = "type_to",
    weight: str = "n_transitions",
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
) -> DataFrame:
    """PERSONALIZED PageRank, integer-exact: identical iteration to
    ``pagerank`` but the teleport mass returns entirely to ONE seed
    node — the node with the largest weighted out-degree (ties: lowest
    node id), picked RELATIONALLY so both engines choose the same seed
    — turning global centrality into "importance AS SEEN FROM the
    dominant state" (the random-walk-with-restart relevance behind
    'people who did X go on to...' recommendations; global PageRank
    can't distinguish reachable-from-seed from merely-popular).

        rank'(v) = [v = seed] * ((d_den - d_num) * scale) div d_den
                   + (d_num * S_v) div d_den

    with rank0 = scale on the seed, 0 elsewhere. Same int64-only
    arithmetic as ``pagerank`` (order-free integer sums, div floors),
    so the fixed-iteration result is a pure function of the edge
    multiset. Nodes unreachable from the seed report exactly 0 — a
    feature: the score doubles as a reachability-weighted distance.

    Scale: the seed pick is one TakeOrdered over the |nodes|-sized
    degree relation; iterations are the same edge-vs-rank joins as
    pagerank."""
    e = edges.select(
        F.col(src).alias("u"),
        F.col(dst).alias("v"),
        F.col(weight).cast("long").alias("w"),
    ).persist()
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    outw = e.groupBy("u").agg(F.sum("w").cast("long").alias("wout"))
    # the seed is ONE bounded row (TakeOrdered over the degree relation)
    # referenced by rank0 and every iteration — collect it once instead
    # of re-materializing the broadcast subplan per round (optimization
    # r9, house bounded-collect pattern; same relational pick, so both
    # engines still choose the same seed)
    seed_row = (
        outw.orderBy(F.col("wout").desc(), F.col("u").asc())
        .limit(1)
        .collect()
    )
    if not seed_row:
        out = nodes.select(
            "node", F.lit(0).cast("long").alias("r")
        ).localCheckpoint(eager=True)
        nodes.unpersist()
        e.unpersist()
        return out
    seed_val = seed_row[0]["u"]
    # pre-join the out-weight onto the edge list once (see pagerank)
    ew = e.join(outw, "u").persist()
    base_lit = ((damping_den - damping_num) * scale) // damping_den
    r = nodes.select(
        "node",
        F.when(F.col("node") == F.lit(seed_val), F.lit(scale))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    for _ in range(iters):
        contrib = (
            ew.join(r.withColumnRenamed("node", "u"), "u")
            .select(
                F.col("v").alias("node"),
                F.expr("r * w div wout").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("s"))
        )
        r = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.when(
                        F.col("node") == F.lit(seed_val),
                        F.lit(base_lit),
                    ).otherwise(F.lit(0))
                    + F.expr(
                        f"{damping_num} * coalesce(s, 0L)"
                        f" div {damping_den}"
                    )
                ).cast("long").alias("r"),
            )
        )
    # materialize + release the persisted relations (see pagerank)
    r = r.localCheckpoint(eager=True)
    for c in (ew, nodes, e):
        c.unpersist()
    return r


def duckdb_ppr_sql(
    edges_cte: str,
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = SCALE,
) -> str:
    """Unrolled-iteration DuckDB mirror of ``personalized_pagerank``:
    the same relational seed pick and integer arithmetic."""
    base_lit = ((damping_den - damping_num) * scale) // damping_den
    blocks = [
        f"""e AS ({edges_cte}),
      nodes AS (SELECT DISTINCT u AS node FROM e
                UNION SELECT DISTINCT v FROM e),
      outw AS (SELECT u, CAST(sum(w) AS BIGINT) AS W FROM e GROUP BY 1),
      seed AS (SELECT u AS s FROM outw
               ORDER BY W DESC, u ASC LIMIT 1),
      r0 AS (SELECT node,
                    CAST(CASE WHEN node = seed.s THEN {scale}
                              ELSE 0 END AS BIGINT) AS r
             FROM nodes, seed)"""
    ]
    for i in range(iters):
        blocks.append(
            f"""c{i + 1} AS (
        SELECT e.v AS node, CAST(sum((r.r * e.w) // o.W) AS BIGINT) AS s
        FROM e JOIN r{i} r ON r.node = e.u JOIN outw o ON o.u = e.u
        GROUP BY 1),
      r{i + 1} AS (
        SELECT n.node,
               CAST(CASE WHEN n.node = seed.s THEN {base_lit}
                         ELSE 0 END
                    + ({damping_num} * COALESCE(c.s, 0))
                      // {damping_den} AS BIGINT) AS r
        FROM nodes n CROSS JOIN seed
        LEFT JOIN c{i + 1} c ON c.node = n.node)"""
        )
    return (
        "WITH "
        + ",\n      ".join(blocks)
        + f"\n      SELECT node, r FROM r{iters}"
    )


def clustering_coefficient_capped(
    edges: DataFrame, top_k: int = 100, max_deg: int = 200
) -> DataFrame:
    """Local clustering coefficient over the hub-capped co-purchase
    graph: C(v) = 2 T(v) / (d(v) (d(v) - 1)) where T(v) counts
    triangles through v in the subgraph of nodes with 2 <= deg <=
    ``max_deg`` — the "are my neighbors also neighbors of each other"
    read that separates clique-like substitute families from star-like
    accessory hubs (``neighbor_jaccard`` scores PAIRS; this scores
    NODES).

    Triangles are wedge-closures: every wedge (u < w through center v)
    in the capped subgraph is checked against the edge set, and a
    triangle {x,y,z} closes exactly one wedge per corner — so the
    per-center closure count IS T(v), no multiplicity correction.

    Exactness: pure integer counts; C ships as clust_micro =
    floor(2 T * 1e6 / (d (d-1)) + 0.5). Top-k by (degree desc, node
    asc) — a deterministic total order.

    Scale: the hub cap bounds wedges by C(max_deg, 2) per center (the
    adamic_adar / neighbor_jaccard envelope); the closure check is an
    edge-keyed join, never a pair materialization."""
    und = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=False)
    )
    deg = und.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    keep = deg.where((F.col("d") >= 2) & (F.col("d") <= max_deg))
    # capped subgraph: both endpoints eligible
    sub = (
        und.join(keep.select(F.col("v").alias("a")), "a")
        .join(keep.select(F.col("v").alias("b")), "b")
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    dsub = sub.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    x = sub.select(F.col("a").alias("c"), F.col("b").alias("u"))
    y = sub.select(F.col("a").alias("c"), F.col("b").alias("w"))
    wedges = x.join(y, "c").where(F.col("u") < F.col("w"))
    half = sub.where(F.col("a") < F.col("b")).select(
        F.col("a").alias("u"), F.col("b").alias("w")
    )
    tri = (
        wedges.join(half, ["u", "w"])
        .groupBy(F.col("c").alias("v"))
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    # the eligible-eligible restriction can drop a node's SUBGRAPH
    # degree below 2 -> C undefined (d(d-1) = 0): exclude those
    scored = dsub.where(F.col("d") >= 2).join(tri, "v", "left").select(
        "v",
        "d",
        F.coalesce("t", F.lit(0).cast("long")).alias("triangles"),
        F.floor(
            F.lit(2.0)
            * F.coalesce("t", F.lit(0).cast("long")).cast("double")
            * 1000000.0
            / (F.col("d") * (F.col("d") - 1)).cast("double")
            + F.lit(0.5)
        ).cast("long").alias("clust_micro"),
    )
    return (
        scored.orderBy(F.col("d").desc(), F.col("v").asc())
        .limit(top_k)
        .select(
            F.col("v").alias("partkey"),
            F.col("d").alias("degree"),
            "triangles",
            "clust_micro",
        )
    )


def moran_geary(edges: DataFrame, values: DataFrame) -> DataFrame:
    """Moran's I and Geary's C autocorrelation of a node attribute
    over the co-purchase graph (binary weights): do connected parts
    have SIMILAR revenue?

        I = (n / W) * sum_ij w z_i z_j / sum z^2        (z = x - mean)
        C = ((n-1) / 2W) * sum_ij w (z_i - z_j)^2 / sum z^2

    with W = 2|E| — the graph-native dependence screens (I > 0 /
    C < 1: revenue clusters along co-purchase ties, so graph features
    carry signal for demand models; I ~ 0 / C ~ 1: the graph is
    revenue-neutral). ``degree_assortativity`` correlates DEGREES;
    these correlate an external ATTRIBUTE over the same edges.

    Exactness: with nz_i = n x_i - S (exact BIGINT), every sum is a
    DECIMAL of exact integers — the 1/n^2 factors cancel in both
    ratios, leaving one float division each:

        I = n/(2E) * 2 sum_{a<b} nz_a nz_b / sum nz^2
        C = (n-1)/(4E) * 2 sum_{a<b} (nz_a - nz_b)^2 / sum nz^2

    ``values``: (node, x BIGINT). Nodes outside the edge set are
    ignored; isolated graph nodes contribute to mean/variance only.
    Scale: one |nodes| rollup + one edge-keyed join — never a pair
    materialization.

    Magnitude bound (ADVICE r8): nz = n*x - S is DECIMAL(38,0) and the
    squared-moment sums need nz^2 * |rows| <= 10^38, i.e.
    |n * x| <~ 10^17 (e.g. 10^9 nodes x 10^8-cent revenues). Beyond
    that Spark's non-ANSI decimal overflow NULLs while DuckDB's
    HUGEINT errors — silently divergent. For larger deployments
    pre-scale x to whole currency units (or thousands) BEFORE calling;
    the statistics are scale-invariant (both ratios are homogeneous of
    degree 0 in x), so the only effect is the quantization itself."""
    # und feeds the node-universe branch AND the edge-sum join — one
    # checkpoint or the whole upstream edge build (the lineitem
    # co-purchase rollup) replays per consumer (optimization r9, house
    # multi-consumer rule; measured 3.2s -> ~2s at sf0.1)
    und = edges.select("a", "b").localCheckpoint(eager=False)
    nodes = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .distinct()
    )
    x = nodes.join(values, "node").select(
        "node", F.col("x").cast("long").alias("x")
    ).localCheckpoint(eager=False)
    # (n, s) are TWO bounded scalars consumed by every nz row — collect
    # them once (house bounded-collect pattern, optimization r9) instead
    # of materializing a broadcast-agg subplan; exact BIGINTs re-embed
    # exactly as literals
    stat = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    ).collect()[0]
    n_lit, s_lit = int(stat["n"]), int(stat["s"] or 0)
    nz = x.select(
        "node",
        F.lit(n_lit).cast("long").alias("n"),
        (
            F.lit(n_lit).cast(DECZ) * F.col("x").cast(DECZ)
            - F.lit(s_lit).cast(DECZ)
        ).cast(DECZ).alias("nz"),
    ).localCheckpoint(eager=False)
    ssq = nz.agg(
        F.max("n").alias("n"),
        F.sum(F.col("nz") * F.col("nz")).cast(DECZ).alias("ssq"),
    )
    e = (
        und.join(
            nz.select(F.col("node").alias("a"), F.col("nz").alias("za")),
            "a",
        )
        .join(
            nz.select(F.col("node").alias("b"), F.col("nz").alias("zb")),
            "b",
        )
    )
    esum = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.col("za") * F.col("zb")).cast(DECZ).alias("cross"),
        F.sum(
            (F.col("za") - F.col("zb")) * (F.col("za") - F.col("zb"))
        ).cast(DECZ).alias("sqdiff"),
    )
    j = esum.crossJoin(F.broadcast(ssq))
    nD = F.col("n").cast("double")
    eD = F.col("n_edges").cast("double")
    moran = (
        nD
        / (2.0 * eD)
        * (
            2.0
            * F.col("cross").cast("double")
            / F.col("ssq").cast("double")
        )
    )
    geary = (
        (nD - 1.0)
        / (4.0 * eD)
        * (
            2.0
            * F.col("sqdiff").cast("double")
            / F.col("ssq").cast("double")
        )
    )
    from ..functions.text import round_half_up

    return j.where(
        (F.col("n") >= 2) & (F.col("n_edges") >= 1) & (F.col("ssq") > 0)
    ).select(
        F.col("n").alias("n_nodes"),
        "n_edges",
        round_half_up(moran, 6).alias("moran_i"),
        round_half_up(geary, 6).alias("geary_c"),
    )


def betweenness_sampled(
    edges: DataFrame, k_sources: int = 4, max_hops: int = 3, top_k: int = 20
) -> DataFrame:
    """Sampled betweenness centrality (Brandes accumulation from
    ``k_sources`` md5-chosen sources, BFS bounded to ``max_hops``) over
    the co-purchase graph — WHICH parts sit on the shortest paths
    between other parts (``hits_scores``/``event_pagerank`` rank by
    connectivity volume; betweenness ranks by BROKERAGE, the classic
    bottleneck read). Bounded-hop, sampled-source betweenness is the
    standard scalable estimator (exact Brandes is O(V E)).

    Forward pass: level-synchronous BFS keeps exact integer path
    counts sigma per (source, node, hop); each level is one edge join
    + one keyed sum + one anti-join against the visited set
    (checkpointed per round — the iterative-loop replay rule).
    Backward pass: dependencies fold hop-by-hop through

        delta(u) += sigma(u) / sigma(v) * (1 + delta(v))

    over the BFS-DAG edges (u at hop h, v at hop h+1), each term
    NANO-QUANTIZED via the round-half-up integer form
    (2 sigma_u (1e9 + delta_v_nano) + sigma_v) div (2 sigma_v), so
    every sum is an order-free exact BIGINT (the mutual_information
    discipline — the quantization IS the semantics). Nodes at the hop
    horizon carry delta = 0 (bounded-hop semantics, stated).

    Scale: per source per level the join volume is <= |edges|; k and
    the hop bound are knobs. Output: top_k nodes by accumulated
    nano-betweenness (ties on the smaller part key)."""
    und = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=False)
    )
    srcs = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .orderBy(F.md5(F.col("node").cast("string").cast("binary")))
        .limit(int(k_sources))
        .select(F.col("node").alias("src"))
        .localCheckpoint(eager=False)
    )
    DECL = "decimal(38,0)"
    levels = [
        srcs.select(
            "src",
            F.col("src").alias("node"),
            F.lit(1).cast(DECL).alias("sigma"),
        ).localCheckpoint(eager=False)
    ]
    visited = levels[0]
    for _ in range(int(max_hops)):
        nxt = (
            levels[-1]
            .join(und, levels[-1]["node"] == und["a"])
            .groupBy("src", F.col("b").alias("node"))
            .agg(F.sum("sigma").cast(DECL).alias("sigma"))
            .join(visited.select("src", "node"), ["src", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        levels.append(nxt)
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
    # backward accumulation: deepest level carries delta 0
    two = F.lit(2).cast(DECL)
    e9 = F.lit(1_000_000_000).cast(DECL)
    deltas = {len(levels) - 1: levels[-1].select(
        "src", "node", F.lit(0).cast(DECL).alias("dn")
    )}
    for h in range(len(levels) - 2, 0, -1):
        child = (
            levels[h + 1]
            .join(deltas[h + 1], ["src", "node"])
            .select(
                "src",
                F.col("node").alias("__c"),
                F.col("sigma").alias("__cs"),
                "dn",
            )
        )
        terms = (
            levels[h]
            .join(und, levels[h]["node"] == und["a"])
            .join(
                child,
                (F.col("b") == F.col("__c"))
                & (levels[h]["src"] == child["src"]),
            )
            .select(
                levels[h]["src"].alias("src"),
                "node",
                F.expr(
                    "CAST((2 * sigma * (CAST(1000000000 AS DECIMAL(38,0))"
                    " + dn) + __cs) div (2 * __cs) AS DECIMAL(38,0))"
                ).alias("term"),
            )
        )
        dh = terms.groupBy("src", "node").agg(
            F.sum("term").cast(DECL).alias("dn")
        )
        # level members with no children at h+1 carry delta 0
        deltas[h] = (
            levels[h]
            .select("src", "node")
            .join(dh, ["src", "node"], "left")
            .select(
                "src",
                "node",
                F.coalesce("dn", F.lit(0).cast(DECL)).alias("dn"),
            )
            .localCheckpoint(eager=False)
        )
    parts = [deltas[h] for h in range(1, len(levels))]
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    bc = acc.groupBy("node").agg(F.sum("dn").cast(DECL).alias("bc_nano"))
    from ..functions.text import round_half_up

    return (
        bc.orderBy(F.col("bc_nano").desc(), F.col("node").asc())
        .limit(int(top_k))
        .select(
            F.col("node").alias("partkey"),
            F.col("bc_nano").cast("long").alias("bc_nano"),
            round_half_up(
                F.col("bc_nano").cast("double") / F.lit(1e9), 6
            ).alias("betweenness"),
        )
    )


def eccentricity_sample(
    edges: DataFrame, k_sources: int = 6, max_hops: int = 6
) -> DataFrame:
    """Sampled eccentricity / diameter lower bound: BFS from
    ``k_sources`` md5-chosen sources, bounded to ``max_hops``; each
    source reports how FAR its component stretches (eccentricity =
    max shortest-path hop reached) and how MUCH it reaches — and the
    max over sources is the classic iFUB-style diameter lower bound
    ("how many hops across is this graph", the topology read next to
    ``part_component_census``'s "how big are the pieces").

    Exactness: pure integer hop counts; first-discovery level IS the
    shortest path (level-synchronous BFS). ``at_cap`` flags sources
    whose frontier was still alive at the bound (their ecc is a lower
    bound, stated). Scale: per source per level one edge join + one
    anti-join, volume <= |edges|; k and the bound are knobs."""
    und = (
        edges.select("a", "b")
        .union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .localCheckpoint(eager=False)
    )
    srcs = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .orderBy(F.md5(F.col("node").cast("string").cast("binary")))
        .limit(int(k_sources))
        .select(F.col("node").alias("src"))
        .localCheckpoint(eager=False)
    )
    frontier = srcs.select(
        "src", F.col("src").alias("node"), F.lit(0).alias("hop")
    ).localCheckpoint(eager=False)
    visited = frontier
    for h in range(1, int(max_hops) + 1):
        frontier = (
            frontier.join(und, frontier["node"] == und["a"])
            .select("src", F.col("b").alias("node"))
            .distinct()
            .join(
                visited.select("src", "node"), ["src", "node"], "left_anti"
            )
            .select("src", "node", F.lit(h).alias("hop"))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(frontier).localCheckpoint(
            eager=False
        )
    per = visited.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_reached"),
        F.max("hop").cast("long").alias("ecc"),
    )
    live = frontier.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("__alive")
    )
    dia = per.agg(F.max("ecc").cast("long").alias("diameter_lb"))
    return (
        per.join(F.broadcast(live), "src", "left")
        .crossJoin(F.broadcast(dia))
        .select(
            F.col("src").alias("source"),
            "n_reached",
            "ecc",
            (F.coalesce("__alive", F.lit(0)) > 0).alias("at_cap"),
            "diameter_lb",
        )
    )

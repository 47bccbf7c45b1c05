"""Frequency sketches: heavy hitters over an event stream.

The reference has no analytics surface at all (SURVEY.md §2.6), but its
whole topology is a frequency counter (mapper partial counts →  reducer
merge, mapper.go:64-104 / reducer.go:145-153); heavy hitters is that
same computation with a support threshold, so it belongs in the engine's
training-data toolbox (skew detection: which users/domains dominate a
crawl before you sample it).

Scale shape: one hash-shuffle of PRE-AGGREGATED per-key counts (map-side
combine makes the exchange |keys|-sized, not |rows|-sized), then the
total rides back as a 1-row broadcast — no second pass over the data and
no driver-side count. For key spaces too large to groupBy exactly,
``freq_items`` wraps Spark's Karp et al. single-pass sketch whose output
is a guaranteed SUPERSET of the true heavy hitters (false positives
possible, false negatives not — pinned in tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.text import round_half_up


def heavy_hitters(
    df: DataFrame, key: str = "user_id", support: float = 0.008
) -> DataFrame:
    """Exact keys with count >= support * total, with their share.

    total is derived from the (already tiny) per-key counts and joined
    back as a broadcast single row, keeping the whole thing one Catalyst
    plan: scan → partial/final count → 1-row broadcast → filter.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    return (
        counts.crossJoin(broadcast(total))
        .where(F.col("cnt") >= F.col("total") * F.lit(support))
        .select(
            key,
            "cnt",
            round_half_up(F.col("cnt") / F.col("total"), 5).alias("share"),
        )
    )


def approx_distinct(
    df: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group approximate distinct count via HyperLogLog++
    (``approx_count_distinct``), relative standard deviation ``rsd``.

    The scale rationale: exact COUNT(DISTINCT key) must shuffle every
    distinct (group, key) pair — |rows|-sized worst case. The HLL sketch
    is a fixed-size (~1.5KB at rsd=0.05) mergeable buffer, so the
    map-side partials make the exchange |groups|-sized regardless of
    data volume; at 100TB this is the difference between a terabyte
    shuffle and a kilobyte one. Accuracy contract (±3·rsd vs exact) is
    pinned in tests/test_sketches.py; the driver records a rows-only
    check since no oracle reproduces Spark's exact HLL estimate.
    """
    return df.groupBy(group).agg(
        F.approx_count_distinct(key, rsd).alias("approx_distinct"),
    )


def approx_distinct_check(
    df: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    rsd: float = 0.05,
) -> DataFrame:
    """Oracle-able form of :func:`approx_distinct`: per group, the EXACT
    distinct count plus a deterministic ``within_bound`` boolean
    asserting the HLL++ estimate landed inside ±3·rsd of it.

    This is the eval/validation shape (like ``ann_eval``): the exact
    side is the point — it certifies the sketch on THIS corpus, so a
    DuckDB oracle can reproduce the whole row (exact count + literal
    TRUE) and the driver gets a full value-hash check instead of the
    rows-only carve-out the raw estimate forced. HLL++ is deterministic
    for a given dataset (no RNG), so the boolean is stable run-to-run.
    The production query (sketch only, no exact pass) remains
    :func:`approx_distinct`.
    """
    # two single-purpose aggregates joined on the group key — mixing
    # countDistinct with other aggregates in ONE agg routes everything
    # through the N+1x Expand (the measured house finding)
    sk = df.groupBy(group).agg(
        F.approx_count_distinct(key, rsd).alias("approx")
    )
    ex = df.groupBy(group).agg(F.countDistinct(key).alias("exact_distinct"))
    return sk.join(ex, group).select(
        group,
        "exact_distinct",
        (
            F.abs(F.col("approx") - F.col("exact_distinct"))
            <= F.lit(3.0 * rsd) * F.col("exact_distinct")
        ).alias("within_bound"),
    )


def freq_items(df: DataFrame, key: str = "user_id", support: float = 0.008):
    """Approximate heavy-hitter KEY SET via Spark's single-pass
    ``freqItems`` sketch (Karp/Shenker/Papadimitriou): every key with
    frequency > support is returned, possibly plus false positives.
    Returns a Python set — the sketch output is bounded by 1/support,
    not data-sized, so driver-side is the right place for it."""
    return set(df.stat.freqItems([key], support).first()[0])


def hll_daily_rollup(
    events: DataFrame, key: str = "user_id", lg_k: int = 12
) -> DataFrame:
    """Mergeable-sketch rollup — the 100TB pattern for distinct counts.

    Phase 1 materializes one Apache DataSketches HLL per (event_type,
    day): ~|types x days| rows of ~2^lg_k-byte binaries, the thing a
    lake pipeline computes once at ingest and stores next to the
    partition. Phase 2 answers "distinct users per type, any date
    range" by UNIONING sketches (``hll_union_agg`` — associative,
    order-independent, so the result is deterministic) without ever
    rescanning raw events. Relative error ~1.04/sqrt(2^lg_k) (~1.6% at
    lg_k=12; bound pinned in tests/test_sketches.py).

    vs ``approx_count_distinct``: same HLL idea, but the sketch COLUMN
    is the product here — it persists, merges across partitions/days
    incrementally, and re-aggregates at query time, which the scalar
    estimate cannot."""
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(False)))
            .alias("approx_users"),
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select("event_type", "approx_users", "n_events", "n_days")
    )


def hll_rollup_check(
    events: DataFrame, key: str = "user_id", lg_k: int = 12
) -> DataFrame:
    """Oracle-able form of :func:`hll_daily_rollup`: same two-level
    sketch pipeline (per-(type, day) DataSketches HLL → ``hll_union_agg``
    per type), but the output carries the EXACT distinct count and a
    deterministic ``within_bound`` boolean (|est − exact| ≤ 3·1.04/√2^lg_k
    relative) instead of the raw estimate — so a DuckDB oracle reproduces
    every column (exact counts + literal TRUE) and the driver records a
    full value-hash match. The sketch union still runs: a silent sketch
    regression flips the boolean and fails the hash. DataSketches HLL is
    deterministic per dataset, so the boolean is stable.
    """
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_events"),
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch", F.lit(False)))
        .alias("approx_users"),
        F.sum("n_events").alias("n_events"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct(key).alias("exact_users")
    )
    rel = 3.0 * 1.04 / float(2 ** (lg_k / 2.0))
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            "n_events",
            "n_days",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.lit(rel) * F.col("exact_users")
            ).alias("within_bound"),
        )
    )


def hll_overlap_check(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    lg_k: int = 12,
) -> DataFrame:
    """Sketch SET-INTERSECTION — audience-overlap estimation, the
    theta-sketch use case, on HLL via inclusion–exclusion: for every
    group pair, |A∩B| ≈ est(A) + est(B) − est(A∪B), where the union
    estimate comes from ``hll_union`` of the two stored sketches (never
    a rescan). This is how a 100TB pipeline answers "how many users do
    these two segments share" from kilobyte sketches computed once at
    ingest: per-group sketches are |groups| rows, the pair expansion is
    tiny-×-tiny, and no raw-data pass happens at query time.

    Oracle-able ``_check`` form (the house pattern for approximate
    ops): the output carries the EXACT overlap plus a deterministic
    ``within_bound`` boolean. I–E error compounds three estimates, each
    relatively bounded by its own cardinality, so the bound is
    3·1.04/√2^lg_k · (|A| + |B| + |A∪B|) with exact cardinalities on
    the right-hand side — DuckDB reproduces every column (exact counts
    + literal TRUE). The sketches still run: a sketch regression flips
    the boolean and fails the value hash. Zero-overlap pairs stay in
    the output (left join, coalesce 0)."""
    sk = events.groupBy(group).agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("sketch")
    )
    a = sk.select(F.col(group).alias("type_a"), F.col("sketch").alias("sk_a"))
    b = sk.select(F.col(group).alias("type_b"), F.col("sketch").alias("sk_b"))
    est = (
        a.join(broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            (
                F.hll_sketch_estimate("sk_a")
                + F.hll_sketch_estimate("sk_b")
                - F.hll_sketch_estimate(F.hll_union("sk_a", "sk_b"))
            ).alias("est_overlap"),
        )
    )
    du = events.select(group, key).distinct()
    dua = du.select(F.col(group).alias("type_a"), F.col(key).alias("k"))
    dub = du.select(F.col(group).alias("type_b"), F.col(key).alias("k"))
    overlap = (
        dua.join(dub, (dua["k"] == dub["k"]) & (F.col("type_a") < F.col("type_b")))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    sizes = du.groupBy(group).agg(F.count(F.lit(1)).alias("n"))
    na = sizes.select(F.col(group).alias("type_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(group).alias("type_b"), F.col("n").alias("n_b"))
    rel = 3.0 * 1.04 / float(2 ** (lg_k / 2.0))
    return (
        est.join(overlap, ["type_a", "type_b"], "left")
        .join(broadcast(na), "type_a")
        .join(broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.coalesce("exact_overlap", F.lit(0)).alias("exact_overlap"),
            (
                F.abs(
                    F.col("est_overlap")
                    - F.coalesce("exact_overlap", F.lit(0))
                )
                <= F.lit(rel)
                * (
                    F.col("n_a")
                    + F.col("n_b")
                    + (
                        F.col("n_a")
                        + F.col("n_b")
                        - F.coalesce("exact_overlap", F.lit(0))
                    )
                )
            ).alias("within_bound"),
        )
    )


def fixed_width_histogram(
    df: DataFrame, col: str, n_bins: int = 20
) -> DataFrame:
    """Fixed-width value histogram — the distribution profile that
    complements ``profile_table``'s scalar stats (skew/outlier shape at
    a glance, and the bin spec a numeric drift monitor diffs).

    The [min, max] bounds resolve eagerly to two literals (the bounded-
    collect pattern — leaving them as a subplan would rescan for both
    the bin projection and the per-bin rollup), then binning is one
    map-side projection + one |bins|-keyed aggregate. Bin edges are
    derived with the same IEEE ops on both engines, and every value
    lands via ``least(n-1, floor((v - min) / span * n))`` — the max
    value's floor(n) clamps into the last bin. Empty bins are emitted
    (dense spine via ``sequence``) so the histogram shape is positional,
    not presence-dependent."""
    from pyspark.sql.functions import broadcast

    mn, mx = df.agg(F.min(col), F.max(col)).first()
    span = float(mx) - float(mn)
    if span <= 0:
        span = 1.0  # degenerate: all mass in bin 0
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col(col) - F.lit(float(mn))) / F.lit(span) * n_bins),
    ).cast("int")
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            (F.lit(float(mn)) + F.col("bin") * F.lit(span) / n_bins).alias("lo"),
            (F.lit(float(mn)) + (F.col("bin") + 1) * F.lit(span) / n_bins).alias("hi"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )


def cms_build(
    df: DataFrame,
    key: str = "user_id",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch build: a ``depth x width`` grid of counters,
    row d incrementing cell ``h_d(key) mod width`` per occurrence.
    Returns the non-zero cells as (d, cell, cnt).

    THE mergeable frequency structure for key spaces too large to
    groupBy exactly (per-token counts over a 100TB crawl): the
    exchange is bounded by depth*width REGARDLESS of |keys| — map-side
    partial aggregation collapses each partition to at most the grid
    size, so the shuffle is constant-bytes where an exact count is
    |keys|-sized. Grids from disjoint corpora/days add cell-wise
    (sum-merge in a later rollup), same contract as the HLL sketches.

    Hash = the shared-with-DuckDB md5 trick (sampling.hash_bucket),
    salted by the row index — deterministic and engine-independent, so
    the whole sketch (not just its outputs) is exactly oracle-able."""
    c = F.col(key).cast("string")
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"), c.alias("k")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("d").cast("string"), F.lit("|"), F.col("k")).cast("binary")),
            1, 8,
        ),
        16, 10,
    )
    return (
        rows.select("d", (h.cast("long") % width).alias("cell"))
        .groupBy("d", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(
    df: DataFrame,
    key: str = "user_id",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Per-key CMS frequency estimate vs exact count: (key, exact,
    cms_est, overestimate). The estimate is min over the sketch's depth
    rows — by construction ``cms_est >= exact`` (collisions only ADD),
    with error <= (e/width)*N at probability 1 - e^-depth (Cormode &
    Muthukrishnan 2005); the bound is pinned in tests.

    Plan: the sketch build's one constant-size exchange; the exact side
    (here: the query keys' true counts, |keys|-sized) exists only
    because the operator REPORTS the error — a production probe joins
    its query keys against the broadcast 4096-cell grid and never
    computes ``exact``. Width is deliberately small (256) so the
    fixtures actually collide and the overestimate column is non-trivial."""
    cells = cms_build(df, key=key, depth=depth, width=width)
    exact = df.groupBy(key).agg(F.count(F.lit(1)).alias("exact"))
    kd = exact.select(
        key, "exact",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("d").cast("string"), F.lit("|"), F.col(key).cast("string")
                ).cast("binary")
            ),
            1, 8,
        ),
        16, 10,
    )
    probes = kd.select(key, "exact", "d", (h.cast("long") % width).alias("cell"))
    return (
        probes.join(broadcast(cells), ["d", "cell"])
        .groupBy(key, "exact")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            key,
            "exact",
            "cms_est",
            (F.col("cms_est") - F.col("exact")).alias("overestimate"),
        )
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    n_bins: int = 64,
    qs: tuple = (0.25, 0.5, 0.75, 0.95),
) -> DataFrame:
    """Approximate quantiles from the MERGEABLE fixed-width histogram:
    the CDF over ``fixed_width_histogram``'s bins brackets quantile q
    between the first bin whose cumulative count reaches ceil(q*N) —
    [lo, hi) of that bin bound the true order statistic, so the error
    is at most one bin width. This is the quantile the 100TB path
    actually computes: exact rank-percentiles need a full sort (or the
    non-reproducible interpolation of approx_percentile), while bin
    counts partial-aggregate map-side, MERGE across days/corpora by
    addition (same contract as the HLL/CMS sketches), and the final
    CDF walk happens over |bins| rows.

    All arithmetic is bin-index integers plus the SAME IEEE edge
    derivation as the histogram — exactly oracle-able. The bracket
    contract (est_lo <= exact <= est_hi within one bin) is pinned
    against the exact rank percentile in tests."""
    from pyspark.sql import Window

    h = fixed_width_histogram(df, col, n_bins=n_bins)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cdf = h.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(Window.partitionBy())
    )
    q_spine = df.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    # first bin whose cumulative count reaches ceil(q * N)
    hit = (
        cdf.join(
            q_spine,
            F.col("cum") >= F.ceil(F.col("q") * F.col("total")),
        )
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    return (
        hit.join(cdf.select("bin", "lo", "hi", "cum", "total"), "bin")
        .select(
            "q",
            "bin",
            F.col("lo").alias("est_lo"),
            F.col("hi").alias("est_hi"),
            "cum",
            "total",
        )
    )


def cms_join_estimate(
    a: DataFrame,
    a_key: str,
    b: DataFrame,
    b_key: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Join-cardinality estimation from count-min sketches (Cormode &
    Muthukrishnan 2005, inner-product form): |A join B on key| is
    estimated as min over sketch rows of the cell-wise product sum
    sum_cell a_d[cell] * b_d[cell]. Collisions only ADD mass, so the
    estimate NEVER undercounts — est >= exact always, with expected
    error |A||B|/width.

    This is what the sketch family buys a query PLANNER: both sides'
    grids are constant-size (built map-side in one pass each, stored
    with the table like catalog stats), and the estimate is a
    |grid|-row join — no data is touched at planning time. The exact
    join count is computed here only to REPORT the error; a planner
    reads just ``est``.

    Same md5-salted hashes as ``cms_build`` (keys compare as strings,
    so bigint keys match across tables) — every number integer, the
    whole report exactly oracle-able."""
    ga = cms_build(a.select(F.col(a_key).alias("k")), "k", depth, width)
    gb = cms_build(b.select(F.col(b_key).alias("k")), "k", depth, width)
    per_d = (
        ga.join(gb.withColumnRenamed("cnt", "cnt_b"), ["d", "cell"])
        .groupBy("d")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("est_d"))
    )
    est = per_d.agg(F.min("est_d").alias("est"))
    exact = (
        a.select(F.col(a_key).alias("k"))
        .join(b.select(F.col(b_key).alias("k")), "k")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return (
        est.crossJoin(broadcast(exact))
        .select(
            "est",
            "exact",
            (F.col("est") - F.col("exact")).alias("overestimate"),
        )
    )


def histogram_drift(
    old: DataFrame, new: DataFrame, col: str, n_bins: int = 20
) -> DataFrame:
    """Distribution-level drift between two snapshots: both histograms
    on ONE shared bin spec (bounds from the union, so bins align), then
    per-bin counts side by side plus the scaled total-variation
    distance — the numeric companion to ``profile_drift``'s scalar
    deltas (a mean can sit still while the whole shape slides).

    TVD is computed in INTEGERS: sum over bins of
    |n_old * N_new - n_new * N_old| is an exact int64 (cross-
    multiplying avoids per-bin rate rounding), divided ONCE by
    2 * N_old * N_new — so the drift statistic itself is
    bit-reproducible (the PSI/KL alternatives need logs, which are
    not). Bin counts partial-agg map-side; everything after is
    |bins|-sized."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    from ..functions.text import round_half_up

    both = old.select(F.col(col).alias("v")).unionByName(
        new.select(F.col(col).alias("v"))
    )
    mn, mx = both.agg(F.min("v"), F.max("v")).first()
    span = float(mx) - float(mn)
    if span <= 0:
        span = 1.0
    bin_of = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col("v") - F.lit(float(mn))) / F.lit(span) * n_bins),
    ).cast("int")
    co = (
        old.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy(bin_of.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    cn = (
        new.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy(bin_of.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    spine = old.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    z = F.lit(0).cast("long")
    bins = (
        spine.join(co, "bin", "left")
        .join(cn, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_old", z).alias("n_old"),
            F.coalesce("n_new", z).alias("n_new"),
        )
    )
    w = Window.partitionBy()
    totals = bins.select(
        "bin",
        "n_old",
        "n_new",
        F.sum("n_old").over(w).alias("__No"),
        F.sum("n_new").over(w).alias("__Nn"),
    )
    tot = totals.withColumn(
        "__l1",
        F.sum(
            F.abs(F.col("n_old") * F.col("__Nn") - F.col("n_new") * F.col("__No"))
        ).over(w),
    )
    return tot.select(
        "bin",
        "n_old",
        "n_new",
        round_half_up(
            F.col("__l1") / (2.0 * F.col("__No") * F.col("__Nn")), 6
        ).alias("tvd"),
    )


def grouped_histogram(
    df: DataFrame, col: str, group: str, n_bins: int = 10
) -> DataFrame:
    """Per-group value histograms on ONE shared global bin spec — the
    cohort profiler (doc-length by language, spend by segment): shapes
    are directly comparable across groups because every group bins
    against the same edges, and each group's spine is dense (empty
    bins emitted) so downstream diffing is positional.

    Same bounded-collect + single keyed aggregate shape as
    ``fixed_width_histogram``; the spine is |groups| x |bins| rows via
    one cross join of two tiny relations."""
    from pyspark.sql.functions import broadcast

    mn, mx = df.agg(F.min(col), F.max(col)).first()
    span = float(mx) - float(mn)
    if span <= 0:
        span = 1.0
    bin_col = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col(col) - F.lit(float(mn))) / F.lit(span) * n_bins),
    ).cast("int")
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(F.col(group).alias("grp"), bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    groups = df.select(F.col(group).alias("grp")).distinct()
    spine = df.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    return (
        groups.crossJoin(broadcast(spine))
        .join(counts, ["grp", "bin"], "left")
        .select(
            F.col("grp").alias(group),
            "bin",
            (F.lit(float(mn)) + F.col("bin") * F.lit(span) / n_bins).alias("lo"),
            (F.lit(float(mn)) + (F.col("bin") + 1) * F.lit(span) / n_bins).alias(
                "hi"
            ),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )


def approx_quantile_check(
    events: DataFrame,
    group: str = "event_type",
    accuracy: int = 10000,
) -> DataFrame:
    """Oracle-able quantile-sketch validation (the HLL bound-check
    pattern applied to ``percentile_approx``): per group, the exact
    lower median of the integer cent values plus a deterministic
    ``within_bound`` boolean asserting the Greenwald–Khanna sketch's
    pick has rank within ``n/accuracy`` (+1 slack) of the true median
    rank. The production form is the sketch alone — a fixed-size
    mergeable summary whose exchange is |groups|-sized where exact
    percentiles must shuffle every (group, value) pair; this eval form
    certifies it on the corpus so DuckDB can reproduce every column
    (exact order statistics + literal TRUE).

    Integer discipline: values are exact cents; the exact median is an
    order statistic via the cross-multiplication rank rule (first v
    with 2*cum >= n — no division); the rank check compares integer
    counts. percentile_approx is deterministic per dataset, so the
    boolean is stable."""
    from pyspark.sql import Window

    cents = F.round(F.col("value") * 100).cast("long")
    base = events.select(F.col(group).alias("g"), cents.alias("c"))
    sk = base.groupBy("g").agg(
        F.percentile_approx("c", 0.5, accuracy).alias("approx"),
        F.count(F.lit(1)).alias("n"),
    )
    # exact lower median: per-(group, value) counts -> cumulative -> the
    # first value whose 2*cum >= n (cross-multiplication, no division)
    vc = base.groupBy("g", "c").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("g")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("g")
    med = (
        vc.select(
            "g",
            "c",
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt").over(wn).alias("tot"),
        )
        .where(F.lit(2) * F.col("cum") >= F.col("tot"))
        .groupBy("g")
        .agg(F.min("c").alias("exact_p50_cents"))
    )
    # rank interval of the sketch's pick: [lt+1, le]; pass when it
    # intersects [target - err, target + err], target = ceil(n/2)
    ranks = (
        base.join(F.broadcast(sk), "g")
        .groupBy("g", "approx", "n")
        .agg(
            F.sum((F.col("c") < F.col("approx")).cast("long")).alias("lt"),
            F.sum((F.col("c") <= F.col("approx")).cast("long")).alias("le"),
        )
    )
    err = F.expr(f"n div {int(accuracy)}") + F.lit(1)
    target = F.expr("(n + 1) div 2")
    return (
        ranks.join(med, "g")
        .select(
            F.col("g").alias(group),
            F.col("n"),
            "exact_p50_cents",
            (
                (F.col("lt") + F.lit(1) <= target + err)
                & (F.col("le") >= target - err)
            ).alias("within_bound"),
        )
    )


def psi_drift(
    old: DataFrame, new: DataFrame, col: str, n_bins: int = 20
) -> DataFrame:
    """Population Stability Index between two snapshots — the scorecard
    industry's standard drift metric (rule of thumb: < 0.1 stable,
    0.1–0.25 shifting, > 0.25 action):

        PSI = sum_bins (p_i - q_i) * ln(p_i / q_i)

    on the same shared-bin-spec histograms as ``histogram_drift`` (its
    TVD is the bounded L1 read; PSI weights tail bins by the log ratio,
    so a thin-bin migration that barely moves TVD still alarms).

    Exactness: bins are Laplace-smoothed (+1 per bin — the standard
    empty-bin guard, documented), so p_i = (n_old_i + 1)/(N_o + B) is a
    double division of exact integers; each term and the ln are
    mirrored, and the one float reduction runs as a SEQUENTIAL fold
    over the bin-sorted list (theils_u/zipf ln-fold discipline) — the
    statistic value-hashes exactly.

    Scale: identical envelope to histogram_drift — two map-side
    histogram rollups, then everything is |bins|-sized."""
    from pyspark.sql.functions import broadcast  # noqa: F401

    from ..functions.text import round_half_up

    both = old.select(F.col(col).alias("v")).unionByName(
        new.select(F.col(col).alias("v"))
    )
    mn, mx = both.agg(F.min("v"), F.max("v")).first()
    if mn is None or mx is None:
        # Both snapshots empty / all-NULL in the binned column: no bin
        # spec exists — return the empty report (same degenerate-guard
        # discipline as the integer predicates below) instead of
        # raising on float(None).
        return old.sparkSession.createDataFrame(
            [], "n_old_total long, n_new_total long, psi double"
        )
    span = float(mx) - float(mn)
    if span <= 0:
        span = 1.0
    bin_of = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col("v") - F.lit(float(mn))) / F.lit(span) * n_bins),
    ).cast("int")
    co = (
        old.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy(bin_of.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    cn = (
        new.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy(bin_of.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    spine = old.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    z = F.lit(0).cast("long")
    bins = (
        spine.join(co, "bin", "left")
        .join(cn, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_old", z).alias("n_old"),
            F.coalesce("n_new", z).alias("n_new"),
        )
    )
    lst = bins.agg(
        F.array_sort(
            F.collect_list(F.struct("bin", "n_old", "n_new"))
        ).alias("l"),
        F.sum("n_old").cast("long").alias("n_old_total"),
        F.sum("n_new").cast("long").alias("n_new_total"),
    )
    bd = float(n_bins)

    def term(acc, t):
        p = (t["n_old"].cast("double") + 1.0) / (
            F.col("n_old_total").cast("double") + bd
        )
        q = (t["n_new"].cast("double") + 1.0) / (
            F.col("n_new_total").cast("double") + bd
        )
        return acc + (p - q) * F.log(p / q)

    psi = F.aggregate(F.col("l"), F.lit(0.0), term)
    return lst.where(
        (F.col("n_old_total") > 0) & (F.col("n_new_total") > 0)
    ).select(
        "n_old_total",
        "n_new_total",
        round_half_up(psi, 6).alias("psi"),
    )


def js_divergence(
    old: DataFrame, new: DataFrame, col: str, n_bins: int = 20
) -> DataFrame:
    """Jensen–Shannon divergence between two snapshots — the BOUNDED,
    SYMMETRIC member of the drift family (PSI is unbounded and blows
    up on thin bins; TVD ignores ratio structure; JSD lives in
    [0, ln 2] and never divides by an empty bin once smoothed):

        JSD = 0.5 * sum_i p_i ln(p_i / m_i) + 0.5 * sum_i q_i ln(q_i / m_i),
        m_i = (p_i + q_i) / 2

    on the same shared-bin-spec, Laplace-smoothed (+1 per bin)
    histograms as ``psi_drift``. Each bin's term is computed in a
    mirrored expression order and the one float reduction runs as a
    SEQUENTIAL fold over the bin-sorted list — value-hashes exactly.

    Scale: two map-side histogram rollups; everything after is
    |bins|-sized."""
    from ..functions.text import round_half_up

    both = old.select(F.col(col).alias("v")).unionByName(
        new.select(F.col(col).alias("v"))
    )
    mn, mx = both.agg(F.min("v"), F.max("v")).first()
    if mn is None or mx is None:
        return old.sparkSession.createDataFrame(
            [], "n_old_total long, n_new_total long, jsd double"
        )
    span = float(mx) - float(mn)
    if span <= 0:
        span = 1.0
    bin_of = F.least(
        F.lit(n_bins - 1),
        F.floor((F.col("v") - F.lit(float(mn))) / F.lit(span) * n_bins),
    ).cast("int")
    co = (
        old.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy(bin_of.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    cn = (
        new.select(F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy(bin_of.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    spine = old.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("bin")
    )
    z = F.lit(0).cast("long")
    bins = (
        spine.join(co, "bin", "left")
        .join(cn, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_old", z).alias("n_old"),
            F.coalesce("n_new", z).alias("n_new"),
        )
    )
    lst = bins.agg(
        F.array_sort(
            F.collect_list(F.struct("bin", "n_old", "n_new"))
        ).alias("l"),
        F.sum("n_old").cast("long").alias("n_old_total"),
        F.sum("n_new").cast("long").alias("n_new_total"),
    )
    bd = float(n_bins)

    def term(acc, t):
        p = (t["n_old"].cast("double") + 1.0) / (
            F.col("n_old_total").cast("double") + bd
        )
        q = (t["n_new"].cast("double") + 1.0) / (
            F.col("n_new_total").cast("double") + bd
        )
        m = (p + q) / 2.0
        return acc + (0.5 * (p * F.log(p / m)) + 0.5 * (q * F.log(q / m)))

    jsd = F.aggregate(F.col("l"), F.lit(0.0), term)
    return lst.where(
        (F.col("n_old_total") > 0) & (F.col("n_new_total") > 0)
    ).select(
        "n_old_total",
        "n_new_total",
        round_half_up(jsd, 6).alias("jsd"),
    )

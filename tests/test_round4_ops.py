"""Round-4 operator pins: brute-force / closed-form replicas of the new
statistics ops on tiny synthetic frames (the DuckDB oracle drive checks
the fixture-scale twin; these pin the SEMANTICS independently)."""

from __future__ import annotations

import itertools
import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators import robust as RB


def _orders(spark, rows):
    return spark.createDataFrame(
        [
            (i, 1, s, p, datetime(2024, 1, 1) + timedelta(days=d), pr)
            for i, (d, p, s, pr) in enumerate(rows)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def test_kendall_daily_matches_bruteforce(spark):
    # one priority, 6 days: counts and revenues with ties in both dims
    days = [(0, 10.0), (1, 10.0), (2, 30.0), (3, 20.0), (4, 20.0), (5, 5.0)]
    rows = []
    counts = [2, 2, 1, 3, 1, 2]  # daily order counts (x series)
    for (d, price), c in zip(days, counts):
        rows += [(d, price, "O", "P") for _ in range(c)]
    out = RB.kendall_daily(_orders(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    x = counts
    y = [p * c * 100 for (_, p), c in zip(days, counts)]  # daily cents
    nc = nd = n1 = n2 = 0
    for i, j in itertools.combinations(range(len(x)), 2):
        sx = (x[i] > x[j]) - (x[i] < x[j])
        sy = (y[i] > y[j]) - (y[i] < y[j])
        nc += sx * sy == 1
        nd += sx * sy == -1
        n1 += sx == 0
        n2 += sy == 0
    n0 = len(x) * (len(x) - 1) // 2
    assert (r["n0"], r["nc"], r["nd"], r["n1"], r["n2"]) == (
        n0, nc, nd, n1, n2,
    )
    tau = (nc - nd) / (math.sqrt(n0 - n1) * math.sqrt(n0 - n2))
    assert abs(r["tau_plus1"] - round(tau + 1.0, 6)) < 1e-9


def test_spearman_types_matches_rank_pearson(spark):
    # two types over the same 5 days, with count ties inside each type
    a = [3, 1, 4, 1, 5]
    b = [2, 7, 1, 8, 2]
    rows = []
    for d, (ca, cb) in enumerate(zip(a, b)):
        base = datetime(2024, 1, 1 + d)
        rows += [(i, base, 1, "alpha", 1.0, "{}") for i in range(ca)]
        rows += [(i, base, 1, "beta", 1.0, "{}") for i in range(cb)]
    ev = spark.createDataFrame(
        [(i,) + tuple(r[1:]) for i, r in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = RB.spearman_types(ev).collect()
    assert len(out) == 1
    r = out[0]

    def avg_ranks(v):
        s = sorted(v)
        return [
            (s.index(x) + 1 + (len(s) - s[::-1].index(x))) / 2 for x in v
        ]

    ra, rb = avg_ranks(a), avg_ranks(b)
    n = len(a)
    mx, my = sum(ra) / n, sum(rb) / n
    num = sum((p - mx) * (q - my) for p, q in zip(ra, rb))
    den = math.sqrt(sum((p - mx) ** 2 for p in ra)) * math.sqrt(
        sum((q - my) ** 2 for q in rb)
    )
    assert (r["ta"], r["tb"], r["n"]) == ("alpha", "beta", n)
    assert abs(r["rho_plus1"] - round(num / den + 1.0, 6)) < 1e-9


def test_cramers_v_matches_direct_chi2(spark):
    cells = {
        ("A", "F"): 20, ("A", "O"): 5,
        ("B", "F"): 7, ("B", "O"): 18,
        ("C", "F"): 11, ("C", "O"): 9,
    }
    rows = []
    for (p, s), c in cells.items():
        rows += [(0, 1.0, s, p)] * c
    out = RB.cramers_v(_orders(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    n = sum(cells.values())
    rsum = {p: sum(c for (pp, _), c in cells.items() if pp == p)
            for p in "ABC"}
    csum = {s: sum(c for (_, ss), c in cells.items() if ss == s)
            for s in "FO"}
    chi2 = sum(
        (cells[(p, s)] - rsum[p] * csum[s] / n) ** 2
        / (rsum[p] * csum[s] / n)
        for p in "ABC"
        for s in "FO"
    )
    v = math.sqrt(chi2 / (n * min(len(rsum) - 1, len(csum) - 1)))
    assert r["n"] == n and r["n_priorities"] == 3 and r["n_statuses"] == 2
    assert abs(r["chi2"] - chi2) < 1e-5
    assert abs(r["cramers_v"] - v) < 1e-6


def test_runs_test_daily_hand_case(spark):
    # 9 days around median: pattern ABABABAB_A with one median day cut
    counts = [5, 1, 5, 1, 5, 1, 5, 1, 3]  # median (lower) = 3, dropped
    rows = []
    for d, c in enumerate(counts):
        base = datetime(2024, 1, 1 + d)
        rows += [(base, "t") for _ in range(c)]
    ev = spark.createDataFrame(
        [(i, ts, 1, t, 1.0, "{}") for i, (ts, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = RB.runs_test_daily(ev).collect()
    assert len(out) == 1
    r = out[0]
    # kept series: 5,1,5,1,5,1,5,1 -> signs 1,0,1,0,1,0,1,0 -> 8 runs
    assert (r["r"], r["n1"], r["n2"]) == (8, 4, 4)
    n1 = n2 = 4
    m = n1 + n2
    mu = 2 * n1 * n2 / m + 1
    var = (2 * n1 * n2 * (2 * n1 * n2 - m)) / (m * m * (m - 1))
    z = (8 - mu) / math.sqrt(var)
    assert abs(r["z"] - round(z, 6)) < 1e-9
    assert bool(r["nonrandom"]) == (abs(z) > 1.96)


def test_semdedup_prunes_planted_duplicates(spark):
    """Plant 3 near-copies of one vector among orthogonal-ish noise:
    inside whatever cluster they land in, the 2 higher ids must be
    pruned; orthogonal vectors must survive."""
    import random

    from pubsub_mapreduce_spark.operators.similarity import semdedup_prune

    rng = random.Random(7)
    dim = 16
    base = [rng.uniform(-1, 1) for _ in range(dim)]
    vecs = []
    for i in range(40):
        vecs.append((i, [rng.uniform(-1, 1) for _ in range(dim)], 0))
    for j, vid in enumerate((100, 101, 102)):
        vecs.append(
            (vid, [v + 0.01 * j for v in base], 0)
        )
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    )
    out = semdedup_prune(emb, k=4, iters=2, tau_num=9, tau_den=10).collect()
    assert sum(r["n_pruned"] for r in out) == 2
    assert sum(r["n_dup_pairs"] for r in out) >= 2
    assert sum(r["n_members"] for r in out) == 43
    for r in out:
        assert 0 <= r["n_pruned"] < r["n_members"] or r["n_members"] == 0


def test_cochran_armitage_matches_closed_form(spark):
    """Hand-replicate the trend statistic from the operator's own
    per-variant table (conversion = more purchases than errors)."""
    from collections import defaultdict

    from pubsub_mapreduce_spark.operators.sampling import hash_bucket

    rows = []
    eid = 0
    # 12 users: purchases/errors chosen to mix converted / not
    for u in range(12):
        np_, ne_ = (u % 4 + 1, 1) if u % 3 else (1, 2)
        for _ in range(np_):
            rows.append((eid, datetime(2024, 1, 1), u, "purchase", 1.0, "{}")); eid += 1
        for _ in range(ne_):
            rows.append((eid, datetime(2024, 1, 1), u, "error", 1.0, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = RB.cochran_armitage(ev).collect()
    assert len(out) == 1
    r = out[0]
    # replicate assignment + conversion in python
    buckets = {
        row["user_id"]: row["bucket"]
        for row in spark.createDataFrame(
            [(u,) for u in range(12)], "user_id long"
        ).select("user_id", hash_bucket(F.col("user_id"), 4)).collect()
    }
    conv = {u: (u % 3 != 0 and (u % 4 + 1) > 1) for u in range(12)}
    per = defaultdict(lambda: [0, 0])
    for u in range(12):
        per[buckets[u]][0] += 1
        per[buckets[u]][1] += int(conv[u])
    N = sum(n for n, _ in per.values())
    R = sum(r_ for _, r_ in per.values())
    snt = sum(t * n for t, (n, _) in per.items())
    snt2 = sum(t * t * n for t, (n, _) in per.items())
    srt = sum(t * r_ for t, (_, r_) in per.items())
    T = srt * N - R * snt
    var = R * (N - R) * (N * snt2 - snt * snt) / N
    z = T / math.sqrt(var)
    assert r["n_users"] == N and r["n_converted"] == R and r["t_num"] == T
    assert abs(r["z"] - round(z, 6)) < 1e-9


def test_wasserstein_shift_detects_offset_distribution(spark):
    """Source A = values {10..19}, source B = same values + 100: the
    W1 of each vs rest must equal the mean shift (100), exactly."""
    rows = []
    i = 0
    for v in range(10, 20):
        rows.append((i, "x" * v, "en", "A", v)); i += 1
        rows.append((i, "x" * v, "en", "B", v + 100)); i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {r["source"]: r for r in
           RB.wasserstein_source_drift(docs).collect()}
    # two equal-size sources offset by a constant: W1 = the offset
    assert out["A"]["w1"] == 100.0 and out["B"]["w1"] == 100.0
    assert out["A"]["n1"] == 10 and out["A"]["n2"] == 10


def test_wasserstein_zero_for_identical_distributions(spark):
    rows = []
    i = 0
    for v in (5, 5, 7, 9):
        for s in ("A", "B"):
            rows.append((i, "t", "en", s, v)); i += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {r["source"]: r["w1"] for r in
           RB.wasserstein_source_drift(docs).collect()}
    assert out == {"A": 0.0, "B": 0.0}


def test_theils_u_matches_direct_entropy(spark):
    cells = {
        ("A", "F"): 30, ("A", "O"): 2,
        ("B", "F"): 3, ("B", "O"): 25,
    }
    rows = []
    for (p, s), c in cells.items():
        rows += [(0, 1.0, s, p)] * c
    out = RB.theils_u(_orders(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    n = sum(cells.values())
    rs = {p: cells[(p, "F")] + cells[(p, "O")] for p in "AB"}
    cs = {s: cells[("A", s)] + cells[("B", s)] for s in "FO"}
    hx = -sum(v / n * math.log(v / n) for v in rs.values())
    hy = -sum(v / n * math.log(v / n) for v in cs.values())
    hxy = -sum(o / n * math.log(o / cs[s]) for (p, s), o in cells.items())
    hyx = -sum(o / n * math.log(o / rs[p]) for (p, s), o in cells.items())
    assert abs(r["u_priority_given_status"] - (hx - hxy) / hx) < 1e-6
    assert abs(r["u_status_given_priority"] - (hy - hyx) / hy) < 1e-6
    # strongly associated table: knowing one removes most uncertainty
    assert r["u_priority_given_status"] > 0.5


def test_frame_scene_cuts_counts_jumps(spark):
    """Two synthetic 'videos' via the fake decoder: a repeated-content
    video (identical 256-byte frames -> zero-hamming transitions, no
    cuts) and doc-level invariants on the fixture shape."""
    from pubsub_mapreduce_spark.operators.multimodal import (
        attach_media,
        frame_scene_cuts,
    )

    static_text = ("A" * 256) * 4  # 4 identical frames
    docs = spark.createDataFrame(
        [(1, static_text, "en", "s", len(static_text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = frame_scene_cuts(attach_media(docs)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_frames"] == 4
    assert r["n_cuts"] == 0 and r["max_jump"] == 0


def test_round4_stats_degenerate_inputs_drop_cleanly(spark):
    """Degenerate shapes must DROP rows via the integer predicates —
    never divide by zero or emit NaN (Spark NaN vs DuckDB NULL would
    diverge cross-engine)."""
    # kendall: single day per priority -> no pairs -> empty
    one_day = _orders(spark, [(0, 10.0, "O", "P"), (0, 12.0, "O", "Q")])
    assert RB.kendall_daily(one_day).count() == 0
    # kendall: constant x series (one order per day -> every pair tied
    # in x -> n0 == n1) must drop before the zero division
    const_x = _orders(
        spark, [(d, 10.0 + d, "O", "P") for d in range(4)]
    )
    assert RB.kendall_daily(const_x).count() == 0
    # cramers_v: single status column -> ck == 1 -> empty
    single_s = _orders(spark, [(0, 1.0, "F", p) for p in "ABC"] * 3)
    assert RB.cramers_v(single_s).count() == 0
    # theils_u: same degenerate table -> empty
    assert RB.theils_u(single_s).count() == 0
    # runs test: every day equals the median (constant series) -> all
    # days discarded -> no row survives the predicates
    ev = spark.createDataFrame(
        [(i, datetime(2024, 1, 1 + (i % 5)), 1, "t", 1.0, "{}")
         for i in range(10)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    assert RB.runs_test_daily(ev).count() == 0
    # wasserstein: single source -> empty complement -> empty result
    docs = spark.createDataFrame(
        [(i, "t", "en", "only", 10 + i) for i in range(4)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    assert RB.wasserstein_source_drift(docs).count() == 0

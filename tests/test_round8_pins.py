"""Round-8 brute-force pins (VERDICT r7 asks #3 and #4).

Ask #3 — the round-7 statistics tail gets the full literal-Python
recomputation discipline every r5/r6 stat got: each test mirrors the
operator's exact float-expression ORDER on planted multi-group data
and asserts equality of every output cell (not just a qualitative
direction). Ask #4 — 10x-scale synthetic envelope pins for the
round-7 heavies (event_ppr iteration volume, nelson_aalen /
gehan_wilcoxon day-spine bound, ann_k_sweep's DEFAULT-knob query cap).
"""

from __future__ import annotations

import pytest
import datetime as dt
import math
from fractions import Fraction

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators import robust as RB
from pubsub_mapreduce_spark.operators.graph import personalized_pagerank

D = dt.datetime


def _orders(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


def _r6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def _r2(x):
    return math.floor(x * 1e2 + 0.5) / 1e2


# ---------------------------------------------------------------- #
# ask #3: literal recomputations
# ---------------------------------------------------------------- #


def test_tukey_hsd_literal_studentized_range(spark):
    """Four priority groups of unequal sizes with pseudo-random cents;
    recompute every pair's q statistic literally (group moments ->
    MSW via the ANOVA identity -> studentized-range scale) in the
    operator's float order and assert every output cell."""
    groups = {
        "1-URGENT": [(i * 37) % 50 + 10 for i in range(7)],
        "2-HIGH": [(i * 53) % 60 + 5 for i in range(11)],
        "3-MEDIUM": [(i * 29) % 40 + 20 for i in range(5)],
        "4-LOW": [(i * 71) % 90 + 1 for i in range(9)],
    }
    rows, k = [], 0
    for p, vals in groups.items():
        for v in vals:
            rows.append((k, 1, "O", float(v), D(2024, 1, 1), p))
            k += 1
    out = {
        (r.p1, r.p2): r
        for r in RB.tukey_hsd(_orders(spark, rows)).collect()
    }
    cents = {p: [round(v * 100) for v in vals] for p, vals in groups.items()}
    n = {p: len(c) for p, c in cents.items()}
    s = {p: sum(c) for p, c in cents.items()}
    q = sum(sum(x * x for x in c) for c in cents.values())
    nn = sum(n.values())
    kk = len(cents)
    between = 0.0
    for p in sorted(cents):  # priority-sorted fold, like array_sort
        between += float(s[p] * s[p]) / float(n[p])
    msw = (float(q) - between) / float(nn - kk)
    ps = sorted(cents)
    expected_pairs = [
        (a, b) for i, a in enumerate(ps) for b in ps[i + 1 :]
    ]
    assert sorted(out) == sorted(expected_pairs)
    for a, b in expected_pairs:
        m1 = float(s[a]) / float(n[a])
        m2 = float(s[b]) / float(n[b])
        se = math.sqrt(msw / 2.0 * (1.0 / n[a] + 1.0 / n[b]))
        r = out[(a, b)]
        assert (r.n1, r.n2) == (n[a], n[b])
        assert r.mean_diff_usd == _r2((m1 - m2) / 100.0)
        assert r.q_stat == _r6(abs(m1 - m2) / se)


def test_chow_literal_odd_n(spark):
    """31 days (odd split: half 1 gets n div 2 = 15 days) — literal
    RSS/F recomputation with the operator's centered-moment float
    order; pins break_index on the odd-count path."""
    counts = [3 + ((i * 7) % 5) for i in range(15)] + [
        10 + 3 * i + ((i * 11) % 4) for i in range(16)
    ]
    rows, k = [], 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (k, 1, "O", 1.0, D(2024, 1, 1) + dt.timedelta(days=i), "1")
            )
            k += 1
    out = RB.chow_test(_orders(spark, rows)).collect()[0]

    def rss(pts):
        nn = len(pts)
        st = sum(t for t, _ in pts)
        sy = sum(y for _, y in pts)
        stt = sum(t * t for t, _ in pts)
        sty = sum(t * y for t, y in pts)
        syy = sum(y * y for _, y in pts)
        ctt = float(nn * stt - st * st)
        cty = float(nn * sty - st * sy)
        cyy = float(nn * syy - sy * sy)
        return (cyy - cty * cty / ctt) / float(nn)

    pts = list(enumerate(counts))
    r_p, r_1, r_2 = rss(pts), rss(pts[:15]), rss(pts[15:])
    f = ((r_p - r_1 - r_2) / 2.0) / ((r_1 + r_2) / float(31 - 4))
    assert out.n_days == 31 and out.break_index == 15
    assert out.rss_pooled == _r6(r_p)
    assert out.rss_split == _r6(r_1 + r_2)
    assert out.f_stat == _r6(f)


def test_granger_literal_lag1_ols(spark):
    """Literal lag-1 OLS equality for BOTH directions (not just
    dominance): Python recomputes the restricted and unrestricted fits
    from the same centered BIGINT moments, in the operator's float
    order, and asserts f_stat / rss_reduction / n cell-for-cell."""
    a_counts = [((i * 7) % 5) + 1 + (i % 2) for i in range(24)]
    b_counts = [0] + [a_counts[i - 1] + ((i * 3) % 4) for i in range(1, 24)]
    rows, k = [], 0
    for i in range(24):
        for _ in range(a_counts[i]):
            rows.append((k, D(2024, 1, 1 + i), 1, "aa", 0.0))
            k += 1
        for _ in range(b_counts[i]):
            rows.append((k, D(2024, 1, 1 + i), 2, "bb", 0.0))
            k += 1
    out = {
        r.direction: r
        for r in RB.granger_lite(_events(spark, rows)).collect()
    }

    # busiest two types: 'aa' vs 'bb' totals decide rk 1/2
    tot_a, tot_b = sum(a_counts), sum(b_counts)
    ranked = sorted(
        [("aa", tot_a), ("bb", tot_b)], key=lambda t: (-t[1], t[0])
    )
    series = {"aa": a_counts, "bb": b_counts}
    a = series[ranked[0][0]]  # rk 1
    b = series[ranked[1][0]]  # rk 2

    def direction(y, l1, l2):
        n = len(y)
        sy, s1, s2 = sum(y), sum(l1), sum(l2)
        syy = sum(v * v for v in y)
        s11 = sum(v * v for v in l1)
        s22 = sum(v * v for v in l2)
        s12 = sum(u * v for u, v in zip(l1, l2))
        s1y = sum(u * v for u, v in zip(l1, y))
        s2y = sum(u * v for u, v in zip(l2, y))
        c11 = float(n * s11 - s1 * s1)
        c22 = float(n * s22 - s2 * s2)
        c12 = float(n * s12 - s1 * s2)
        c1y = float(n * s1y - s1 * sy)
        c2y = float(n * s2y - s2 * sy)
        cyy = float(n * syy - sy * sy)
        det = c11 * c22 - c12 * c12
        rss_r = cyy - c1y * c1y / c11
        rss_u = cyy - (
            c22 * c1y * c1y - 2.0 * c12 * c1y * c2y + c11 * c2y * c2y
        ) / det
        f = (rss_r - rss_u) / (rss_u / float(n - 3))
        return n, _r6((rss_r - rss_u) / rss_r), _r6(f)

    # lag rows: t = 1..23 (first day dropped)
    ya = a[1:]
    yb = b[1:]
    la = a[:-1]
    lb = b[:-1]
    want = {
        "b_causes_a": direction(ya, la, lb),
        "a_causes_b": direction(yb, lb, la),
    }
    assert set(out) == set(want)
    for d, (n, red, f) in want.items():
        assert out[d].n == n
        assert out[d].rss_reduction == red
        assert out[d].f_stat == f


def test_fisher_exact_comb_reference(spark):
    """Independent EXACT reference: math.comb hypergeometric masses as
    Fractions (no ratio recurrence, no floats) on a 60-customer table;
    the operator's folded double p must agree to the rounded 1e-6."""
    # outcome+ = custkeys 1..18 (>=1 order); pred+ = acctbal >= 5000
    # for custkeys {1..12} U {19..27} -> k_obs = 12, r1 = 18, c1 = 21
    pred_pos = set(range(1, 13)) | set(range(19, 28))
    cust = spark.createDataFrame(
        [
            (i, f"c{i}", 0, 9000.0 if i in pred_pos else 100.0, "S")
            for i in range(1, 61)
        ],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    orders = _orders(
        spark,
        [(i, i, "O", 1.0, D(2024, 1, 1), "1") for i in range(1, 19)],
    )
    out = RB.fisher_exact(
        {"customer": cust, "orders": orders}, min_orders=1
    ).collect()[0]
    n, r1, c1, k_obs = 60, 18, 21, 12
    assert (out.n, out.r1, out.c1, out.k_obs) == (n, r1, c1, k_obs)
    kmin, kmax = max(0, r1 + c1 - n), min(r1, c1)
    mass = {
        k: Fraction(math.comb(r1, k) * math.comb(n - r1, c1 - k))
        for k in range(kmin, kmax + 1)
    }
    thr = mass[k_obs] * Fraction(10**7 + 1, 10**7)
    p = Fraction(sum(m for m in mass.values() if m <= thr)) / sum(
        mass.values()
    )
    assert abs(out.p_two_sided - float(p)) < 2e-6


def test_event_ppr_literal_python(spark):
    """Literal Python personalized PageRank (integer div, 5
    iterations) on a small weighted digraph with a dangling node and
    an unreachable component — exact per-node equality, unreachable
    nodes report exactly 0."""
    edges = [
        ("a", "b", 6),
        ("a", "c", 2),
        ("b", "c", 3),
        ("c", "a", 1),
        ("b", "d", 1),  # d is dangling (no out-edges)
        ("x", "y", 9),  # unreachable from the seed component's seed
    ]
    df = spark.createDataFrame(
        edges, "type_from string, type_to string, n_transitions long"
    )
    out = {
        r.node: r.r for r in personalized_pagerank(df).collect()
    }

    scale, dn, dd, iters = 1_000_000, 85, 100, 5
    wout = {}
    for u, _, w in edges:
        wout[u] = wout.get(u, 0) + w
    # seed: largest weighted out-degree, ties lowest id
    seed = sorted(wout, key=lambda u: (-wout[u], u))[0]
    assert seed == "x" or seed == "a"  # wout: a=8, b=4, c=1, x=9 -> x
    base = (dd - dn) * scale // dd
    nodes = {u for u, _, _ in edges} | {v for _, v, _ in edges}
    r = {v: (scale if v == seed else 0) for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for u, v, w in edges:
            s[v] += r[u] * w // wout[u]
        r = {
            v: (base if v == seed else 0) + dn * s[v] // dd
            for v in nodes
        }
    assert out == r
    # the whole a/b/c/d component is unreachable from seed x
    assert all(out[v] == 0 for v in ("a", "b", "c", "d"))
    assert out["y"] > 0


def test_hurst_literal_python(spark):
    """Full literal mirror of hurst_rs on a 128-day synthetic revenue
    series: per-window R/S from exact BIGINT adj sums, nano
    quantization, per-size means, and the log-log fold — every output
    cell equal."""
    prices = [
        float((i * 37) % 100 + 1) + 0.25 * ((i * 13) % 4)
        for i in range(128)
    ]
    rows = [
        (i, 1, "O", prices[i], D(2024, 1, 1) + dt.timedelta(days=i), "1")
        for i in range(128)
    ]
    out = RB.hurst_rs(_orders(spark, rows)).collect()[0]

    y = [round(p * 100) for p in prices]
    per_w = {}
    for w in (8, 16, 32):
        nanos, n_win = 0, 0
        for win in range(len(y) // w):
            seg = y[win * w : (win + 1) * w]
            if len(seg) != w:
                continue
            s = sum(seg)
            q = sum(v * v for v in seg)
            var_num = float(w * q - s * s)
            if var_num <= 0:
                continue
            cum, adjs = 0, []
            for t, v in enumerate(seg):
                cum += v
                adjs.append(w * cum - (t + 1) * s)
            rs = float(max(adjs) - min(adjs)) / math.sqrt(var_num)
            nanos += math.floor(rs * 1e9 + 0.5)
            n_win += 1
        per_w[w] = (float(nanos) / (float(n_win) * 1e9), n_win)
    sx = sy = sxy = sx2 = 0.0
    for w in (8, 16, 32):  # w-sorted fold
        lw, lrs = math.log(float(w)), math.log(per_w[w][0])
        sx += lw
        sy += lrs
        sxy += lw * lrs
        sx2 += lw * lw
    npd = 3.0
    hurst = (npd * sxy - sx * sy) / (npd * sx2 - sx * sx)
    assert out.rs8 == _r6(per_w[8][0])
    assert out.rs16 == _r6(per_w[16][0])
    assert out.rs32 == _r6(per_w[32][0])
    assert out.hurst == _r6(hurst)


def test_ewma_literal_python(spark):
    """Literal EWMA recursion + control-limit recomputation over two
    types with a planted level shift: every (type, day) row's ewma and
    breach flag equal the Python mirror."""
    series = {
        "aa": [5 + ((i * 3) % 4) for i in range(30)]
        + [25 + (i % 2) for i in range(10)],
        "bb": [8 + ((i * 5) % 3) for i in range(40)],
    }
    rows, k = [], 0
    for t, counts in series.items():
        uid = 1 if t == "aa" else 2
        for i, c in enumerate(counts):
            for _ in range(c):
                rows.append((k, D(2024, 1, 1) + dt.timedelta(days=i), uid, t, 0.0))
                k += 1
    out = {
        (r.event_type, r.day): r
        for r in RB.ewma_control(_events(spark, rows)).collect()
    }
    lam = 0.3
    for t, counts in series.items():
        n = len(counts)
        s = sum(counts)
        q = sum(c * c for c in counts)
        mean = float(s) / float(n)
        var_num = float(n * q - s * s)
        sd = math.sqrt(var_num / (float(n) * float(n - 1)))
        limit = 3.0 * sd * math.sqrt(lam / (2.0 - lam))
        z = float(counts[0])
        for i, c in enumerate(counts):
            if i > 0:
                z = lam * float(c) + (1.0 - lam) * z
            day = (D(2024, 1, 1) + dt.timedelta(days=i)).strftime(
                "%Y-%m-%d"
            )
            r = out[(t, day)]
            assert r.cnt == c
            assert r.ewma == _r6(z)
            assert r.breach == (1 if abs(z - mean) > limit else 0)


# ---------------------------------------------------------------- #
# ask #4: 10x-scale envelope pins
# ---------------------------------------------------------------- #


def test_event_ppr_at_scale_integer_envelope(spark):
    """PPR on a 100k-leaf star: the iteration stays edge-join-sized
    (no pair blowup is even expressible), every leaf gets the
    identical integer rank the literal Python mirror computes, and the
    seed pick is the hub (largest weighted out-degree)."""
    hub = spark.range(100_000).selectExpr(
        "'hub' AS type_from",
        "CAST(id AS STRING) AS type_to",
        "CAST(1 AS LONG) AS n_transitions",
    )
    back = spark.createDataFrame(
        [("0", "hub", 5)], "type_from string, type_to string, n_transitions long"
    )
    out = personalized_pagerank(hub.unionByName(back)).collect()
    by_node = {r.node: r.r for r in out}

    scale, dn, dd, iters = 1_000_000, 85, 100, 5
    base = (dd - dn) * scale // dd
    # literal mirror with leaf-class compression: all leaves are
    # symmetric except leaf "0" (which has the back edge out)
    wout = {"hub": 100_000, "0": 5}
    r = {"hub": scale, "leaf": 0, "0": 0}
    for _ in range(iters):
        s_leaf = r["hub"] * 1 // wout["hub"]
        s_hub = r["0"] * 5 // wout["0"]
        r = {
            "hub": base + dn * s_hub // dd,
            "leaf": dn * s_leaf // dd,
            "0": dn * s_leaf // dd,
        }
    assert by_node["hub"] == r["hub"]
    assert by_node["0"] == r["0"]
    leaf_vals = {v for k, v in by_node.items() if k not in ("hub", "0")}
    assert leaf_vals == {r["leaf"]}


def test_nelson_aalen_gehan_day_spine_at_scale(spark):
    """20k users over a 30-day calendar: both survival operators'
    outputs stay day-spine-bounded (|groups x days|, never user- or
    row-sized), the NA hazard is monotone, and Klein's variance is
    positive where hazard increments exist."""
    base = spark.range(20_000)
    first = base.selectExpr(
        "id AS event_id",
        "timestamp'2024-01-01' AS ts",  # everyone enters day 0
        "id AS user_id",
        "CASE WHEN id % 2 = 0 THEN 'aa' ELSE 'bb' END AS event_type",
        "CAST(0.0 AS DOUBLE) AS value",
    )
    last = base.selectExpr(
        "id + 20000 AS event_id",
        # last active day spread over the 30-day calendar
        "timestamp'2024-01-01' + make_interval(0,0,0,CAST(id % 30 AS INT),0,0,0) AS ts",
        "id AS user_id",
        "CASE WHEN id % 2 = 0 THEN 'aa' ELSE 'bb' END AS event_type",
        "CAST(0.0 AS DOUBLE) AS value",
    )
    ev = first.unionByName(last)
    na = RB.nelson_aalen(ev).collect()
    assert 0 < len(na) <= 2 * 30
    by_g = {}
    for r in sorted(na, key=lambda r: (r.event_type, r.day)):
        prev = by_g.get(r.event_type, 0.0)
        assert r.cum_hazard >= prev
        by_g[r.event_type] = r.cum_hazard
    gw = RB.gehan_wilcoxon(ev).collect()
    assert len(gw) == 1  # one pair of groups
    assert gw[0].chi2 >= 0.0


@pytest.mark.full  # 26s synthetic-scale pin (gate tier: VERDICT r9 #1)
def test_ann_k_sweep_default_cap_binds_at_scale(spark):
    """ann_k_sweep with every=1 on a 4000-vector corpus: the DEFAULTS
    cap (QUERY_MAX_SAMPLE = 2000) binds, so the sweep runs exactly
    2000 queries — the capped-sample envelope with default knobs
    (VERDICT r7 ask #4), observable in the output's n_queries."""
    from pubsub_mapreduce_spark.operators.similarity import ann_k_sweep
    from pubsub_mapreduce_spark.sources.synthetic import (
        synthetic_embeddings,
    )

    emb = synthetic_embeddings(spark, 4000)
    out = ann_k_sweep(emb, ks=(1, 5), every=1).collect()
    assert len(out) == 2
    for r in out:
        assert r.n_queries == 2000  # cap bound, not 4000
        assert 0.0 <= r.recall <= 1.0
        assert r.n_matched <= r.n_exact

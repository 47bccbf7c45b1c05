"""Round-9 operator pins: every new statistic recomputed literally in
Python (same integer spines, same float-expression order) on planted
data — the r5-r8 discipline.
"""

from __future__ import annotations

import datetime as dt
import math

from pubsub_mapreduce_spark.operators import robust as RB

D = dt.datetime


def _r6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def _lcg(seed):
    x = seed
    while True:
        x = (1103515245 * x + 12345) % (1 << 31)
        yield x


def _daily_orders(spark, ys, base=D(2024, 5, 1)):
    rows, k = [], 0
    for t, y in enumerate(ys):
        for _ in range(y):
            k += 1
            rows.append((k, base + dt.timedelta(days=t), 100.0))
    return spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )


def test_jarque_bera_literal(spark):
    """Planted skewed prices; recompute the integer shift-centering
    (c, e, T2..T4), the binomial-shift float moments, and JB in the
    operator's expression order."""
    g = _lcg(3)
    vals = [
        float(100 + next(g) % 900) + (next(g) % 100) / 100.0
        for _ in range(200)
    ]
    vals += [9000.25, 9500.75, 12000.5]  # a heavy right tail
    df = spark.createDataFrame(
        [(i, D(2024, 1, 1), v) for i, v in enumerate(vals)],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    row = RB.jarque_bera(df).collect()[0]

    # HALF_UP quantization (Python round() is banker's — would diverge
    # on the planted .5-cent values)
    xs = [math.floor(v + 0.5) for v in vals]
    n, s1 = len(xs), sum(xs)
    c = (2 * s1 + n) // (2 * n)
    e = s1 - n * c
    t2 = sum((x - c) ** 2 for x in xs)
    t3 = sum((x - c) ** 3 for x in xs)
    t4 = sum((x - c) ** 4 for x in xs)
    nD, eD = float(n), float(e)
    m2 = (t2 - eD * eD / nD) / nD
    m3 = (t3 - 3.0 * eD * t2 / nD + 2.0 * eD * eD * eD / (nD * nD)) / nD
    m4 = (
        t4
        - 4.0 * eD * t3 / nD
        + 6.0 * eD * eD * t2 / (nD * nD)
        - 3.0 * eD * eD * eD * eD / (nD * nD * nD)
    ) / nD
    g1 = m3 / (m2 * math.sqrt(m2))
    g2 = m4 / (m2 * m2) - 3.0
    jb = nD / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    assert row["n"] == n
    assert row["skewness"] == _r6(g1)
    assert row["ex_kurtosis"] == _r6(g2)
    assert row["jb_stat"] == _r6(jb)
    assert g1 > 1.0  # the planted tail is visibly right-skewed


def test_turning_point_literal(spark):
    """Planted series with known peaks, troughs, and flat ties (ties
    are NOT turning points by the stated strict convention)."""
    ys = [3, 5, 2, 2, 4, 4, 4, 1, 6, 6, 2, 7, 3]
    row = RB.turning_point_test(_daily_orders(spark, ys)).collect()[0]
    t_obs = sum(
        1
        for i in range(1, len(ys) - 1)
        if (ys[i - 1] < ys[i] > ys[i + 1])
        or (ys[i - 1] > ys[i] < ys[i + 1])
    )
    n = len(ys)
    mean_t = 2.0 * (n - 2.0) / 3.0
    var_t = (16.0 * n - 29.0) / 90.0
    assert row["n_days"] == n and row["t_obs"] == t_obs == 4
    assert row["expected"] == _r6(mean_t)
    assert row["z"] == _r6((t_obs - mean_t) / math.sqrt(var_t))


def test_bartels_rank_literal(spark):
    """Planted series with ties; recompute the doubled average ranks
    off the value spine (2Rbar = n+1 holds exactly under ties), the
    successive-difference and centering sums, and z."""
    g = _lcg(17)
    ys = [1 + next(g) % 5 for _ in range(30)]
    row = RB.bartels_rank(_daily_orders(spark, ys)).collect()[0]
    n = len(ys)
    r2 = []
    for y in ys:
        below = sum(1 for v in ys if v < y)
        cnt = sum(1 for v in ys if v == y)
        r2.append(2 * below + cnt + 1)
    num4 = sum(
        (r2[t] - r2[t + 1]) ** 2 for t in range(n - 1)
    )
    den4 = sum((r - (n + 1)) ** 2 for r in r2)
    rvn = num4 / den4
    nD = float(n)
    var = (
        4.0
        * (nD - 2.0)
        * (5.0 * nD * nD - 2.0 * nD - 9.0)
        / (5.0 * nD * (nD + 1.0) * (nD - 1.0) * (nD - 1.0))
    )
    assert row["n_days"] == n
    assert row["rvn"] == _r6(rvn)
    assert row["z"] == _r6((rvn - 2.0) / math.sqrt(var))


def test_cusum_squares_literal_planted_break(spark):
    """Quiet half then volatile half: the max |n c_t - t C| deviation
    must land at the regime break and match the literal scan."""
    ys = [10, 11, 10, 9, 10, 11, 10, 10, 30, 2, 28, 1, 25, 4, 29, 3]
    row = RB.cusum_squares(_daily_orders(spark, ys)).collect()[0]
    n, s = len(ys), sum(ys)
    z2 = [(n * y - s) ** 2 for y in ys]
    ctot = sum(z2)
    best = None
    ct = 0
    for t, v in enumerate(z2, start=1):
        ct += v
        dev = abs(n * ct - t * ctot)
        if best is None or dev > best[0]:
            best = (dev, t)
    assert row["n_days"] == n
    want_day = (D(2024, 5, 1) + dt.timedelta(days=best[1] - 1)).strftime(
        "%Y-%m-%d"
    )
    assert row["peak_day"] == want_day
    assert row["stat"] == _r6(best[0] / (n * ctot))
    assert best[1] == 8  # deviation peaks right before the break


def test_foster_stuart_literal(spark):
    """Planted trending series; recompute records and the
    nano-quantized harmonic variance."""
    ys = [5, 3, 6, 4, 8, 2, 9, 7, 11, 10, 12, 1, 14]
    row = RB.foster_stuart(_daily_orders(spark, ys)).collect()[0]
    n = len(ys)
    s_stat = 0
    for t in range(1, n):
        if ys[t] > max(ys[:t]):
            s_stat += 1
        elif ys[t] < min(ys[:t]):
            s_stat -= 1
    var_nano = sum(
        math.floor(2e9 / float(t) + 0.5) for t in range(2, n + 1)
    )
    assert row["n_days"] == n and row["s_stat"] == s_stat == 3
    assert row["z"] == _r6(s_stat / math.sqrt(var_nano / 1e9))


def test_dixon_q_literal_and_dup_extreme(spark):
    """Distinct extremes: plain gap/range ratios. Duplicated max: the
    multiset's second-largest equals the max, so q_high = 0."""
    ys = [4, 7, 5, 9, 6, 21, 4, 8]
    row = RB.dixon_q(_daily_orders(spark, ys)).collect()[0]
    assert row["y_min"] == 4 and row["y_max"] == 21
    assert row["day_min"] == "2024-05-01"  # earliest of the tied mins
    assert row["day_max"] == "2024-05-06"
    assert row["q_high"] == _r6((21 - 9) / (21 - 4))
    # min value 4 occurs twice -> multiset y_(2) == y_(1) -> gap 0
    assert row["q_low"] == 0.0

    ys2 = [3, 10, 5, 10, 6, 7]
    row2 = RB.dixon_q(_daily_orders(spark, ys2)).collect()[0]
    assert row2["q_high"] == 0.0  # duplicated max
    assert row2["q_low"] == _r6((5 - 3) / (10 - 3))


def test_mtld_literal_fold(spark):
    """Planted docs covering every branch: factor completions, a
    partial tail, an all-distinct doc (NULL mtld), an empty doc, and
    a highly repetitive doc — each recomputed with the literal Python
    factor-reset walk (integer 100*types <= 72*len threshold)."""
    from pubsub_mapreduce_spark.operators import textops as TX

    texts = {
        1: "a b c d a a a a b b b b c c",  # completes factors
        2: "x y z w q",  # all distinct -> total 0 -> NULL
        3: "",  # empty
        4: "t t t t t t t t",  # collapses immediately
        5: "one two three one two one one two three four five one one",
    }
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in TX.mtld(df).collect()}

    def py_mtld(text):
        toks = [t for t in text.split() if t != ""][:200]
        f, seen, flen = 0, [], 0
        for x in toks:
            if x not in seen:
                seen = seen + [x]
            flen += 1
            if 100 * len(seen) <= 72 * flen:
                f, seen, flen = f + 1, [], 0
        partial = (
            (1.0 - len(seen) / flen) / (1.0 - 0.72) if flen > 0 else 0.0
        )
        total = f + partial
        m = (
            _r6(len(toks) / total) if total > 0 else None
        )
        return len(toks), f, m

    for i, text in texts.items():
        n, f, m = py_mtld(text)
        row = got[i]
        assert row["n_tokens"] == n, i
        assert row["n_factors"] == f, i
        assert row["mtld"] == m, i
    assert got[2]["mtld"] is None and got[3]["mtld"] is None
    assert got[4]["n_factors"] >= 1


def test_lttb_literal_selection(spark):
    """120 planted days with spikes; recompute bucket ids, neighbor
    average anchors, and the exact integer triangle scores; the
    selected day per bucket must match, spikes included."""
    from pubsub_mapreduce_spark.operators.robust import lttb_downsample

    g = _lcg(29)
    ys = [1000 + next(g) % 500 for _ in range(120)]
    ys[30] = 9000
    ys[77] = 8000
    rows = []
    for t, y in enumerate(ys):
        # one order per day scaled: o_totalprice = y/100 dollars so
        # cents == y exactly (2dp lattice)
        rows.append((t, D(2024, 1, 1) + dt.timedelta(days=t), y / 100.0))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    got = {r["bucket"]: r for r in lttb_downsample(df, n_out=40).collect()}

    nd, k = len(ys), 40
    buckets = {}
    for t in range(nd):
        if t == 0:
            b = 0
        elif t == nd - 1:
            b = k - 1
        else:
            b = 1 + ((t - 1) * (k - 2)) // (nd - 2)
        buckets.setdefault(b, []).append(t)
    aggs = {
        b: (len(ts), sum(ts), sum(ys[t] for t in ts))
        for b, ts in buckets.items()
    }
    for b, ts in buckets.items():
        if b - 1 in aggs and b + 1 in aggs:
            cp, sxp, syp = aggs[b - 1]
            cn, sxn, syn = aggs[b + 1]
            best = max(
                ts,
                key=lambda t: (
                    abs(
                        (sxp * cn - sxn * cp) * (ys[t] * cp - syp)
                        - (sxp - t * cp) * (syn * cp - syp * cn)
                    ),
                    -t,
                ),
            )
        else:
            best = ts[0]
        assert got[b]["t"] == best, b
        assert got[b]["y_cents"] == ys[best], b
    assert len(got) == len(buckets)
    # the planted spikes must survive the downsample
    assert any(r["y_cents"] == 9000 for r in got.values())
    assert any(r["y_cents"] == 8000 for r in got.values())


def test_hodges_lehmann_dow_literal(spark):
    """60 planted days; recompute the weekend/weekday split (Spark
    dayofweek 1=Sun/7=Sat) and the exact weighted-median of all
    pairwise differences, including the even-total two-middle
    average."""
    from pubsub_mapreduce_spark.operators.robust import hodges_lehmann_dow

    g = _lcg(37)
    ys = [5 + next(g) % 10 for _ in range(60)]
    base = D(2024, 5, 1)  # a Wednesday
    row = hodges_lehmann_dow(_daily_orders(spark, ys, base)).collect()[0]

    we, wd = [], []
    for t, y in enumerate(ys):
        day = base + dt.timedelta(days=t)
        (we if day.weekday() >= 5 else wd).append(y)
    diffs = sorted(a - b for a in we for b in wd)
    t_ = len(diffs)
    k1, k2 = (t_ + 1) // 2, t_ // 2 + 1
    hl = (diffs[k1 - 1] + diffs[k2 - 1]) / 2.0
    assert row["n_weekend"] == len(we) and row["n_weekday"] == len(wd)
    assert row["hl_shift"] == hl


def test_cucconi_literal(spark):
    """Two planted cohorts with tied prices; recompute pooled average
    ranks (2R off the value spine), the exact P and SR sums, and the
    U/V/rho/C floats in the operator's expression order."""
    import math as _m

    from pubsub_mapreduce_spark.operators.robust import cucconi_test

    g = _lcg(43)
    rows = []
    vals = {"O": [], "F": []}
    for i in range(80):
        st = "O" if i % 2 == 0 else "F"
        # cohort F shifted and widened; coarse lattice forces ties
        v = (10 + next(g) % 15) if st == "O" else (14 + 2 * (next(g) % 15))
        vals[st].append(v * 100)  # cents
        rows.append((i, D(2024, 1, 1), st, float(v)))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate timestamp, o_orderstatus string, "
        "o_totalprice double",
    )
    row = cucconi_test(df).collect()[0]

    pooled = vals["O"] + vals["F"]
    n1, n2 = len(vals["O"]), len(vals["F"])
    p = sr = 0
    for v in vals["F"]:
        below = sum(1 for x in pooled if x < v)
        cnt = sum(1 for x in pooled if x == v)
        r2 = 2 * below + cnt + 1
        p += r2 * r2
        sr += r2
    nD, n1D, n2D = float(n1 + n2), float(n1), float(n2)
    pD, srD = float(p), float(sr)
    qD = (
        4.0 * n2D * (nD + 1.0) * (nD + 1.0)
        - 4.0 * (nD + 1.0) * srD
        + pD
    )
    sd4 = 4.0 * _m.sqrt(
        n1D * n2D * (nD + 1.0) * (2.0 * nD + 1.0)
        * (8.0 * nD + 11.0) / 5.0
    )
    u = (6.0 * pD - 4.0 * n2D * (nD + 1.0) * (2.0 * nD + 1.0)) / sd4
    v_ = (6.0 * qD - 4.0 * n2D * (nD + 1.0) * (2.0 * nD + 1.0)) / sd4
    rho = 2.0 * (nD * nD - 4.0) / (
        (2.0 * nD + 1.0) * (8.0 * nD + 11.0)
    ) - 1.0
    c = (u * u + v_ * v_ - 2.0 * rho * u * v_) / (
        2.0 * (1.0 - rho * rho)
    )
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["u"] == _r6(u) and row["v"] == _r6(v_)
    assert row["rho"] == _r6(rho)
    assert row["c_stat"] == _r6(c)
    assert c > 3.0  # planted location+scale shift is visible


def test_gamma_somers_literal(spark):
    """Small planted lattice with a monotone trend + ties; literal
    O(n^2) pair classification over the raw rows must equal the
    cell-join counts and all three coefficients."""
    import math as _m

    from pubsub_mapreduce_spark.operators.robust import gamma_somers

    g = _lcg(53)
    rows = []
    qd = []
    for i in range(120):
        q = 1 + next(g) % 8
        dc = min(10, (q // 2) + next(g) % 3)  # correlated with q
        qd.append((q, dc))
        rows.append((i, q * 1.0, dc / 100.0))
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_quantity double, l_discount double"
    )
    row = gamma_somers(df).collect()[0]

    c = d = ty = tx = 0
    n = len(qd)
    for i in range(n):
        for j in range(i + 1, n):
            (q1, d1), (q2, d2) = qd[i], qd[j]
            if q1 == q2 and d1 == d2:
                continue  # both-tied pairs enter neither tie term
            if q1 == q2:
                tx += 1
            elif d1 == d2:
                ty += 1
            elif (q1 < q2) == (d1 < d2):
                c += 1
            else:
                d += 1
    cD, dD, tyD, txD = float(c), float(d), float(ty), float(tx)
    assert row["concordant"] == c and row["discordant"] == d
    assert row["gamma"] == _r6((cD - dD) / (cD + dD))
    assert row["somers_d"] == _r6((cD - dD) / (cD + dD + tyD))
    assert row["tau_b"] == _r6(
        (cD - dD) / _m.sqrt((cD + dD + txD) * (cD + dD + tyD))
    )
    assert row["gamma"] > 0.5  # the planted trend is strongly positive


def test_barnard_exact_literal(spark):
    """Full literal recomputation on a planted table: md5-ordered arm
    caps (hashlib mirrors Spark md5), pooled-Wald scores, mode-free
    binomial ratio folds in ascending-j order, and the grid max."""
    import hashlib

    from pubsub_mapreduce_spark.operators.robust import barnard_exact

    g = _lcg(61)
    cust, orders, ok = [], [], 0
    raw = []
    for ck in range(60):
        bal = 8000.0 if ck % 2 == 0 else 2000.0
        n_ord = next(g) % 20
        cust.append((ck, bal, 0))
        raw.append((ck, bal, n_ord))
        for _ in range(n_ord):
            ok += 1
            orders.append((ok, ck))
    t = {
        "customer": spark.createDataFrame(
            cust, "c_custkey long, c_acctbal double, c_nationkey long"
        ),
        "orders": spark.createDataFrame(
            orders, "o_orderkey long, o_custkey long"
        ),
    }
    row = barnard_exact(t, arm_cap=12, grid=50).collect()[0]

    arms = {1: [], 0: []}
    for ck, bal, n_ord in raw:
        arms[1 if bal >= 5000.0 else 0].append(
            (hashlib.md5(str(ck).encode()).hexdigest(), n_ord >= 10)
        )
    picks = {a: sorted(v)[:12] for a, v in arms.items()}
    n1 = len(picks[1])
    k1 = sum(1 for _, y in picks[1] if y)
    n2 = len(picks[0])
    k2 = sum(1 for _, y in picks[0] if y)

    def t_stat(a, b):
        ph = float(a + b) / float(n1 + n2)
        den = math.sqrt(ph * (1.0 - ph) * (1.0 / n1 + 1.0 / n2))
        return (float(a) / n1 - float(b) / n2) / den if den > 0 else 0.0

    t_obs = t_stat(k1, k2)

    def q_arr(n, pi):
        out = [1.0]
        for a in range(1, n + 1):
            acc = 1.0
            for jj in range(0, a):
                acc = acc * (float(n - jj) / float(jj + 1) * (pi / (1.0 - pi)))
            out.append(acc)
        return out

    best = None
    for jg in range(1, 50):
        pi = float(jg) / 50.0
        qa, qb = q_arr(n1, pi), q_arr(n2, pi)
        num = 0.0
        for a in range(n1 + 1):
            inner = 0.0
            for b in range(n2 + 1):
                if abs(t_stat(a, b)) >= abs(t_obs) * (1.0 - 1e-7):
                    inner = inner + qb[b]
            num = num + qa[a] * inner
        sa = 0.0
        for x in qa:
            sa = sa + x
        sb = 0.0
        for x in qb:
            sb = sb + x
        p = num / (sa * sb)
        if best is None or p > best[0]:
            best = (p, pi)
    assert (row["n1"], row["k1"], row["n2"], row["k2"]) == (n1, k1, n2, k2)
    assert row["t_obs"] == _r6(t_obs)
    assert row["p_barnard"] == _r6(best[0])
    assert row["pi_hat"] == _r6(best[1])


def test_betweenness_sampled_literal(spark):
    """Literal Python Brandes (bounded 3 hops, nano-quantized
    integer-division dependency terms, md5 source pick) on a planted
    barbell: two K4 cliques joined by a 2-path through a single
    broker chain — the brokers must dominate."""
    import hashlib

    from pubsub_mapreduce_spark.operators.graph import betweenness_sampled

    edges = []
    for i in range(4):
        for j in range(i + 1, 4):
            edges.append((i, j))          # clique A: 0..3
            edges.append((10 + i, 10 + j))  # clique B: 10..13
    edges += [(3, 5), (5, 6), (6, 10)]  # broker chain
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["partkey"]: r for r in betweenness_sampled(df).collect()}

    und = {}
    nodes = set()
    for a, b in edges:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
        nodes |= {a, b}
    srcs = sorted(nodes, key=lambda n: hashlib.md5(str(n).encode()).hexdigest())[:4]

    bc = {}
    for s in srcs:
        levels = [{s: 1}]
        visited = {s}
        for _ in range(3):
            nxt = {}
            for u, sig in levels[-1].items():
                for v in und[u]:
                    if v not in visited:
                        nxt[v] = nxt.get(v, 0) + sig
            for v in nxt:
                visited.add(v)
            levels.append(nxt)
        deltas = [dict() for _ in levels]
        for v in levels[3]:
            deltas[3][v] = 0
        for h in (2, 1):
            for u, sig in levels[h].items():
                t = 0
                for v in und[u]:
                    if v in levels[h + 1]:
                        cs = levels[h + 1][v]
                        dn = deltas[h + 1][v]
                        t += (2 * sig * (1_000_000_000 + dn) + cs) // (2 * cs)
                deltas[h][u] = t
        for h in (1, 2, 3):
            for v, dn in deltas[h].items():
                bc[v] = bc.get(v, 0) + dn
    want = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r, v) for r, v in want] == [
        (k, got[k]["bc_nano"]) for k, _ in want
    ]
    # the chain brokers must outrank every clique-internal node
    clique_best = max(
        v for k, v in bc.items() if k in (0, 1, 2, 11, 12, 13)
    )
    assert min(bc.get(5, 0), bc.get(6, 0)) >= clique_best


def test_quade_test_literal(spark):
    """Three planted years with different seasonal strengths;
    recompute within-year average ranks, range ranks, the 16x exact
    sums, and F literally."""
    from pubsub_mapreduce_spark.operators.robust import quade_test

    g = _lcg(67)
    counts = {}
    rows, k = [], 0
    for yi, y in enumerate((1993, 1994, 1995)):
        amp = (3, 9, 1)[yi]  # different discrimination per block
        for mth in range(1, 13):
            c = 5 + (amp if mth in (11, 12) else 0) + next(g) % 3
            counts[(y, mth)] = c
            for _ in range(c):
                k += 1
                rows.append((k, D(y, mth, 5)))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp"
    )
    row = quade_test(orders).collect()[0]

    years = (1993, 1994, 1995)
    r2 = {}
    for y in years:
        vals = [counts[(y, m)] for m in range(1, 13)]
        for m in range(1, 13):
            c = counts[(y, m)]
            below = sum(1 for v in vals if v < c)
            cnt = sum(1 for v in vals if v == c)
            r2[(y, m)] = 2 * below + cnt + 1
    rngs = {
        y: max(counts[(y, m)] for m in range(1, 13))
        - min(counts[(y, m)] for m in range(1, 13))
        for y in years
    }
    q2 = {}
    for y in years:
        below = sum(1 for v in rngs.values() if v < rngs[y])
        cnt = sum(1 for v in rngs.values() if v == rngs[y])
        q2[y] = 2 * below + cnt + 1
    s4 = {(y, m): q2[y] * (r2[(y, m)] - 13) for y in years for m in range(1, 13)}
    a16 = sum(v * v for v in s4.values())
    b16n = sum(
        sum(s4[(y, m)] for y in years) ** 2 for m in range(1, 13)
    )
    n = len(years)
    af, bf = a16 / 16.0, b16n / (16.0 * float(n))
    f = (float(n) - 1.0) * bf / (af - bf)
    assert row["n_blocks"] == 3 and row["df2"] == 22
    assert row["f_stat"] == _r6(f)
    assert f > 2.0  # the planted Nov/Dec bump is visible


def test_lepage_literal(spark):
    """Planted cohorts; recompute 2W and 2AB off the pooled multiset
    and both standardizations (odd-N branch included)."""
    from pubsub_mapreduce_spark.operators.robust import lepage_test

    g = _lcg(71)
    rows, vals = [], {"O": [], "F": []}
    for i in range(75):  # odd pooled N
        st = "O" if i % 2 == 0 else "F"
        v = (20 + next(g) % 10) if st == "O" else (22 + next(g) % 25)
        vals[st].append(v * 100)
        rows.append((i, D(2024, 1, 1), st, float(v)))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate timestamp, o_orderstatus string, "
        "o_totalprice double",
    )
    row = lepage_test(df).collect()[0]

    pooled = vals["O"] + vals["F"]
    n1, n2, nn = len(vals["O"]), len(vals["F"]), len(pooled)
    w2 = ab2 = 0
    for v in vals["F"]:
        below = sum(1 for x in pooled if x < v)
        cnt = sum(1 for x in pooled if x == v)
        r2 = 2 * below + cnt + 1
        w2 += r2
        ab2 += min(r2, 2 * (nn + 1) - r2)
    nD, n1D, n2D = float(nn), float(n1), float(n2)
    wD, abD = w2 / 2.0, ab2 / 2.0
    zw = (wD - n2D * (nD + 1.0) / 2.0) / math.sqrt(
        n1D * n2D * (nD + 1.0) / 12.0
    )
    if nn % 2 == 0:
        ea = n2D * (nD + 2.0) / 4.0
        va = n1D * n2D * (nD + 2.0) * (nD - 2.0) / (48.0 * (nD - 1.0))
    else:
        ea = n2D * (nD + 1.0) * (nD + 1.0) / (4.0 * nD)
        va = n1D * n2D * (nD + 1.0) * (3.0 + nD * nD) / (
            48.0 * nD * nD
        )
    za = (abD - ea) / math.sqrt(va)
    assert row["n1"] == n1 and row["n2"] == n2
    assert row["z_wilcoxon"] == _r6(zw)
    assert row["z_ansari"] == _r6(za)
    assert row["d_stat"] == _r6(zw * zw + za * za)
    assert row["d_stat"] > 6.0  # planted location+scale shift


def test_eccentricity_sample_literal(spark):
    """Planted path-with-branches graph: BFS distances, per-source
    eccentricities, the at_cap flag, and the diameter lower bound all
    recomputed literally (md5 source pick mirrored)."""
    import hashlib

    from pubsub_mapreduce_spark.operators.graph import eccentricity_sample

    # a 10-node path 0-1-...-9 plus a pendant 100 at node 4
    edges = [(i, i + 1) for i in range(9)] + [(4, 100)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["source"]: r for r in eccentricity_sample(df).collect()}

    und = {}
    nodes = set()
    for a, b in edges:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
        nodes |= {a, b}
    srcs = sorted(
        nodes, key=lambda n: hashlib.md5(str(n).encode()).hexdigest()
    )[:6]
    eccs = {}
    for s in srcs:
        dist = {s: 0}
        frontier = [s]
        for h in range(1, 7):
            nxt = []
            for u in frontier:
                for v in und[u]:
                    if v not in dist:
                        dist[v] = h
                        nxt.append(v)
            frontier = nxt
        eccs[s] = (len(dist), max(dist.values()), len(frontier) > 0)
    dia = max(e for _, e, _ in eccs.values())
    assert set(got) == set(srcs)
    for s, (nr, ecc, alive) in eccs.items():
        assert got[s]["n_reached"] == nr, s
        assert got[s]["ecc"] == ecc, s
        assert got[s]["at_cap"] == alive, s
        assert got[s]["diameter_lb"] == dia


def test_welch_anova_literal(spark):
    """Three planted groups with different means AND variances;
    recompute group moments, the four sequential folds (group-key
    order), and F/df2 literally."""
    from pubsub_mapreduce_spark.operators.robust import welch_anova

    g = _lcg(73)
    rows, data = [], {}
    specs = {"1-URGENT": (100, 3), "2-HIGH": (140, 25), "3-LOW": (120, 8)}
    i = 0
    for gr, (mu, spread) in specs.items():
        vals = [mu + (next(g) % (2 * spread)) - spread for _ in range(40)]
        data[gr] = [v * 100 for v in vals]  # cents
        for v in vals:
            i += 1
            rows.append((i, D(2024, 1, 1), gr, float(v)))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string, "
        "o_totalprice double",
    )
    row = welch_anova(df).collect()[0]

    ks = sorted(data)
    w = {}
    xb = {}
    for gr in ks:
        v = data[gr]
        ng, sg, qg = len(v), sum(v), sum(x * x for x in v)
        s2 = (ng * qg - sg * sg) / (float(ng) * (float(ng) - 1.0))
        w[gr] = float(ng) / s2
        xb[gr] = float(sg) / float(ng)
    wsum = 0.0
    for gr in ks:
        wsum = wsum + w[gr]
    msum = 0.0
    for gr in ks:
        msum = msum + w[gr] * xb[gr]
    mm = msum / wsum
    asum = 0.0
    for gr in ks:
        asum = asum + w[gr] * (xb[gr] - mm) * (xb[gr] - mm)
    hsum = 0.0
    for gr in ks:
        hsum = hsum + ((1.0 - w[gr] / wsum) * (1.0 - w[gr] / wsum)) / (
            len(data[gr]) - 1.0
        )
    k = 3.0
    f = (asum / (k - 1.0)) / (
        1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * hsum
    )
    assert row["k"] == 3 and row["n_total"] == 120
    assert row["f_stat"] == _r6(f)
    assert row["df2"] == _r6((k * k - 1.0) / (3.0 * hsum))
    assert f > 10.0  # the planted mean separation dominates


def test_yuen_t_literal(spark):
    """Planted cohorts with fat tails; recompute order-statistic
    trimming, winsorized variance, t and Welch-Satterthwaite df."""
    from pubsub_mapreduce_spark.operators.robust import yuen_t

    g = _lcg(79)
    rows, vals = [], {"O": [], "F": []}
    for i in range(90):
        st = "O" if i % 2 == 0 else "F"
        v = 50 + next(g) % 30
        if next(g) % 10 == 0:
            v += 500  # outliers the trim must absorb
        if st == "F":
            v += 12
        vals[st].append(v * 100)
        rows.append((i, D(2024, 1, 1), st, float(v)))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderdate timestamp, o_orderstatus string, "
        "o_totalprice double",
    )
    row = yuen_t(df).collect()[0]

    def side(v):
        v = sorted(v)
        n = len(v)
        gt = n * 10 // 100
        h = n - 2 * gt
        trimmed = v[gt: n - gt]
        tsum = sum(trimmed)
        wins = [v[gt]] * gt + trimmed + [v[n - gt - 1]] * gt
        sw, qw = sum(wins), sum(x * x for x in wins)
        xt = float(tsum) / float(h)
        s2w = (n * qw - sw * sw) / (float(n) * (float(n) - 1.0))
        dj = s2w * (float(n) - 1.0) / (float(h) * (float(h) - 1.0))
        return n, h, xt, dj

    n1, h1, xt1, d1 = side(vals["O"])
    n2, h2, xt2, d2 = side(vals["F"])
    t = (xt1 - xt2) / math.sqrt(d1 + d2)
    dfree = (d1 + d2) ** 2 / (
        d1 * d1 / (h1 - 1.0) + d2 * d2 / (h2 - 1.0)
    )
    assert (row["n1"], row["n2"], row["h1"], row["h2"]) == (n1, n2, h1, h2)
    assert row["trimmed_mean_1"] == _r6(xt1 / 100.0)
    assert row["trimmed_mean_2"] == _r6(xt2 / 100.0)
    assert row["t_stat"] == _r6(t)
    assert row["df"] == _r6(dfree)
    assert t < -2.0  # planted +12 shift on F is visible after trimming


def test_seasonal_kendall_literal(spark):
    """Planted monthly counts with a within-month cross-year trend;
    recompute per-season S, tie-corrected var18, and z."""
    from pubsub_mapreduce_spark.operators.robust import seasonal_kendall

    g = _lcg(83)
    rows, counts, k = [], {}, 0
    for yi, y in enumerate((1994, 1995, 1996, 1997)):
        for mth in range(1, 13):
            c = 3 + yi + next(g) % 2  # upward cross-year trend
            counts[(y, mth)] = c
            for _ in range(c):
                k += 1
                rows.append((k, D(y, mth, 9)))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp"
    )
    row = seasonal_kendall(orders).collect()[0]

    years = (1994, 1995, 1996, 1997)
    s = 0
    var18 = 0
    for mth in range(1, 13):
        vals = [counts[(y, mth)] for y in years]
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                s += (vals[j] > vals[i]) - (vals[j] < vals[i])
        nm = len(vals)
        tt = 0
        for c in set(vals):
            t = vals.count(c)
            tt += t * (t - 1) * (2 * t + 5)
        var18 += nm * (nm - 1) * (2 * nm + 5) - tt
    corr = float(s) - 1.0 if s > 0 else (float(s) + 1.0 if s < 0 else 0.0)
    assert row["n_years"] == 4 and row["s_stat"] == s
    assert row["var18"] == var18
    assert row["z"] == _r6(corr / math.sqrt(var18 / 18.0))
    assert row["z"] > 3.0  # the planted trend is strong


def test_partial_corr_literal(spark):
    """Planted lineitem where price = qty*110 + noise and discount
    correlates with qty; recompute all nine moments and the partial
    coefficient literally."""
    from pubsub_mapreduce_spark.operators.robust import partial_corr

    g = _lcg(89)
    rows, xyz = [], []
    for i in range(150):
        q = 1 + next(g) % 20
        dc = min(10, q // 3 + next(g) % 2)
        price_c = q * 11000 + (next(g) % 1000)
        xyz.append((q, price_c, dc))
        rows.append((i, float(q), price_c / 100.0, dc / 100.0))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double",
    )
    row = partial_corr(df).collect()[0]

    n = len(xyz)
    sx = sum(x for x, _, _ in xyz)
    sy = sum(y for _, y, _ in xyz)
    sz = sum(z for _, _, z in xyz)
    sxx = sum(x * x for x, _, _ in xyz)
    syy = sum(y * y for _, y, _ in xyz)
    szz = sum(z * z for _, _, z in xyz)
    sxy = sum(x * y for x, y, _ in xyz)
    sxz = sum(x * z for x, _, z in xyz)
    syz = sum(y * z for _, y, z in xyz)

    def r(ab, a, b, aa, bb):
        return float(n * ab - a * b) / math.sqrt(
            float(n * aa - a * a) * float(n * bb - b * b)
        )

    rxy = r(sxy, sx, sy, sxx, syy)
    rxz = r(sxz, sx, sz, sxx, szz)
    ryz = r(syz, sy, sz, syy, szz)
    part = (rxy - rxz * ryz) / math.sqrt(
        (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    )
    assert row["n"] == n
    assert row["r_qty_price"] == _r6(rxy)
    assert row["r_qty_disc"] == _r6(rxz)
    assert row["r_price_disc"] == _r6(ryz)
    assert row["r_qty_price_given_disc"] == _r6(part)
    assert rxy > 0.99 and part > 0.9  # planted near-linear relation


def test_by_fdr_literal_vs_bh(spark):
    """BY on the same planted battery as the bh_fdr pin: identical
    p-values and ranks, but the harmonic-deflated budget rejects a
    SUBSET of what BH rejects; recompute the c(m) fold and the
    step-up literally."""
    from pubsub_mapreduce_spark.operators.robust import bh_fdr, by_fdr
    from tests.test_round9_pins import _hyper_p, _lcg as _plcg

    g = _plcg(7)
    nations = ["ALPHA", "BRAVO", "CHARLIE", "DELTA", "ECHO"]
    cust_rows, order_rows, ok = [], [], 0
    raw = {}
    for ni, nname in enumerate(nations):
        raw[nname] = []
        for ci in range(24):
            ck = ni * 100 + ci
            bal = float(next(g) % 10000)
            n_orders = next(g) % 20
            cust_rows.append((ck, bal, ni))
            for _ in range(n_orders):
                ok += 1
                order_rows.append((ok, ck))
            raw[nname].append((bal, n_orders))
    t = {
        "customer": spark.createDataFrame(
            cust_rows, "c_custkey long, c_acctbal double, c_nationkey long"
        ),
        "orders": spark.createDataFrame(
            order_rows, "o_orderkey long, o_custkey long"
        ),
        "nation": spark.createDataFrame(
            [(i, n) for i, n in enumerate(nations)],
            "n_nationkey long, n_name string",
        ),
    }
    got = {r["nation"]: r for r in by_fdr(t).collect()}
    bh = {r["nation"]: r for r in bh_fdr(t).collect()}

    cells = {}
    for nname, rows in raw.items():
        n = len(rows)
        r1 = sum(1 for bal, no in rows if no >= 10)
        c1 = sum(1 for bal, no in rows if bal >= 5000.0)
        kk = sum(1 for bal, no in rows if no >= 10 and bal >= 5000.0)
        if 0 < r1 < n and 0 < c1 < n:
            cells[nname] = (n, r1, c1, kk)
    ps = {nm: _hyper_p(*c) for nm, c in cells.items()}
    m = len(ps)
    cm_nano = sum(
        math.floor(1e9 / float(i) + 0.5) for i in range(1, m + 1)
    )
    ordered = sorted(ps, key=lambda nm: (ps[nm], nm))
    rank = {nm: i + 1 for i, nm in enumerate(ordered)}
    k_max = max(
        (
            rank[nm]
            for nm in ordered
            if ps[nm] * float(m) * (cm_nano / 1e9) <= rank[nm] * 0.1
        ),
        default=None,
    )
    assert set(got) == set(cells)
    for nm in cells:
        assert got[nm]["rank"] == rank[nm]
        assert got[nm]["p_two_sided"] == bh[nm]["p_two_sided"]
        want_rej = k_max is not None and rank[nm] <= k_max
        assert got[nm]["rejected"] == want_rej, nm
    # BY is strictly more conservative than BH
    assert all(
        (not got[nm]["rejected"]) or bh[nm]["rejected"] for nm in cells
    )

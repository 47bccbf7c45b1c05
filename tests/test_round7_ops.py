"""Round-7 operator pins: classical-test tail (Bartlett, Grubbs, ANOVA,
MI/G-test), control charts (EWMA), long-memory (Hurst R/S), inequality
(Lorenz deciles, Atkinson).

Each pins the operator against a hand-computed or literal-Python
reference on planted inputs — the oracle sweep proves cross-engine
equality; these prove the VALUE is the textbook one."""

from __future__ import annotations

import datetime as dt
import math

from pubsub_mapreduce_spark.operators import robust as RB

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


def test_bartlett_hand_computed(spark):
    # group a: [1, 3] -> s2 = 2; group b: [2, 2, 8] -> s2 = 12
    # (prices in dollars -> cents: 100,300 / 200,200,800)
    rows = [
        (1, 1, "O", 1.0, D(2024, 1, 1), "a"),
        (2, 1, "O", 3.0, D(2024, 1, 1), "a"),
        (3, 1, "O", 2.0, D(2024, 1, 1), "b"),
        (4, 1, "O", 2.0, D(2024, 1, 1), "b"),
        (5, 1, "O", 8.0, D(2024, 1, 1), "b"),
    ]
    out = RB.bartlett_test(_orders(spark, rows)).collect()[0]
    s2a, s2b = 20000.0, 120000.0  # cents^2
    nn, k = 5, 2
    s2p = (1 * s2a + 2 * s2b) / (nn - k)
    ln_sum = 1 * math.log(s2a) + 2 * math.log(s2b)
    inv_sum = 1.0 / 1 + 1.0 / 2
    c = 1.0 + (inv_sum - 1.0 / (nn - k)) / (3.0 * (k - 1))
    t = (nn - k) * math.log(s2p) - ln_sum
    assert out.n == 5 and out.n_groups == 2
    assert out.pooled_var_usd2 == math.floor(s2p / 1e4 * 100 + 0.5) / 100
    assert out.c_factor == _r6(c)
    assert out.chi2 == _r6(t / c)


def test_grubbs_planted_outlier(spark):
    # type 'a' daily counts: [2, 2, 2, 10] -> worst day is the 10
    rows = []
    eid = 0
    for day, cnt in [(1, 2), (2, 2), (3, 2), (4, 10)]:
        for _ in range(cnt):
            rows.append((eid, D(2024, 1, day), 1, "a", 0.0))
            eid += 1
    out = RB.grubbs_outlier(_events(spark, rows)).collect()[0]
    xs = [2, 2, 2, 10]
    n, s = 4, 16
    mean = s / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1))
    assert out.worst_day == "2024-01-04" and out.cnt == 10
    assert out.grubbs_g == _r6((10 - mean) / sd)


def test_anova_hand_computed(spark):
    # groups (cents): a=[100, 300], b=[500, 700] -> ssb/ssw by hand
    rows = [
        (1, 1, "O", 1.0, D(2024, 1, 1), "a"),
        (2, 1, "O", 3.0, D(2024, 1, 1), "a"),
        (3, 1, "O", 5.0, D(2024, 1, 1), "b"),
        (4, 1, "O", 7.0, D(2024, 1, 1), "b"),
    ]
    out = RB.anova_oneway(_orders(spark, rows)).collect()[0]
    xs = {"a": [100, 300], "b": [500, 700]}
    allx = [x for v in xs.values() for x in v]
    gm = sum(allx) / len(allx)
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2 for v in xs.values())
    ssw = sum(
        (x - sum(v) / len(v)) ** 2 for v in xs.values() for x in v
    )
    f = (ssb / 1) / (ssw / 2)
    assert out.n == 4 and out.n_groups == 2
    assert out.ms_between_usd2 == math.floor(
        ssb / 1 / 1e4 * 100 + 0.5
    ) / 100
    assert out.ms_within_usd2 == math.floor(
        ssw / 2 / 1e4 * 100 + 0.5
    ) / 100
    assert out.f_stat == _r6(f)


def test_mi_independent_is_zero_and_g_equals_2n_mi(spark):
    # perfectly independent 2x2: each (type, dow) cell = 5 -> MI = 0
    rows = []
    eid = 0
    for t in ("a", "b"):
        for day in (1, 2):  # Mon & Tue
            for _ in range(5):
                rows.append((eid, D(2024, 1, day), 1, t, 0.0))
                eid += 1
    df = _events(spark, rows)
    mi = RB.mutual_information(df).collect()[0]
    g = RB.g_test(df).collect()[0]
    assert mi.mi == 0.0 and mi.nmi == 0.0
    assert mi.h_type == _r6(math.log(2)) and mi.h_dow == _r6(math.log(2))
    assert g.g_stat == 0.0 and g.df == 1
    # dependent table: a only Mon, b only Tue -> MI = ln 2, G = 2N ln 2
    rows2 = []
    eid = 0
    for _ in range(6):
        rows2.append((eid, D(2024, 1, 1), 1, "a", 0.0)); eid += 1
        rows2.append((eid, D(2024, 1, 2), 1, "b", 0.0)); eid += 1
    df2 = _events(spark, rows2)
    mi2 = RB.mutual_information(df2).collect()[0]
    g2 = RB.g_test(df2).collect()[0]
    assert mi2.mi == _r6(math.log(2)) and mi2.nmi == 1.0
    assert g2.g_stat == _r6(2 * 12 * math.log(2))


def test_ewma_recursion_and_breach(spark):
    # counts [10, 10, 10, 50]: z = 10, 10, 10, 22; the spike day
    # breaches the 3-sigma EWMA band
    rows = []
    eid = 0
    for day, cnt in [(1, 10), (2, 10), (3, 10), (4, 50)]:
        for _ in range(cnt):
            rows.append((eid, D(2024, 2, day), 1, "a", 0.0))
            eid += 1
    out = {
        r.day: r for r in RB.ewma_control(_events(spark, rows)).collect()
    }
    xs = [10.0, 10.0, 10.0, 50.0]
    z = xs[0]
    zs = [z]
    for x in xs[1:]:
        z = 0.3 * x + 0.7 * z
        zs.append(z)
    for i, day in enumerate(
        ["2024-02-01", "2024-02-02", "2024-02-03", "2024-02-04"]
    ):
        assert out[day].ewma == _r6(zs[i])
    mean = sum(xs) / 4
    sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / 3)
    lim = 3 * sd * math.sqrt(0.3 / 1.7)
    assert out["2024-02-04"].breach == (
        1 if abs(zs[3] - mean) > lim else 0
    )
    assert out["2024-02-01"].breach == 0


def test_hurst_literal_reference(spark):
    # 64 days of a deterministic wiggle: recompute R/S and the slope
    # with plain Python from the operator's defined arithmetic
    vals = [((i * 37) % 19) + 1 for i in range(64)]  # dollars
    rows = [
        (i, 1, "O", float(vals[i]), D(2024, 1, 1) + dt.timedelta(days=i), "1")
        for i in range(64)
    ]
    out = RB.hurst_rs(_orders(spark, rows)).collect()[0]
    cents = [v * 100 for v in vals]

    def mean_rs(w):
        qs = []
        for start in range(0, 64 - w + 1, w):
            win = cents[start : start + w]
            if len(win) < w:
                continue
            n, s = len(win), sum(win)
            q = sum(x * x for x in win)
            if n * q - s * s <= 0:
                continue
            cum, adjs = 0, []
            for t, x in enumerate(win):
                cum += x
                adjs.append(n * cum - (t + 1) * s)
            rs = (max(adjs) - min(adjs)) / math.sqrt(n * q - s * s)
            qs.append(math.floor(rs * 1e9 + 0.5))
        return sum(qs) / (len(qs) * 1e9)

    ms = {w: mean_rs(w) for w in (8, 16, 32)}
    assert out.rs8 == _r6(ms[8])
    assert out.rs16 == _r6(ms[16])
    assert out.rs32 == _r6(ms[32])
    xs = [math.log(w) for w in (8, 16, 32)]
    ys = [math.log(ms[w]) for w in (8, 16, 32)]
    n = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sx2 = sum(a * a for a in xs)
    assert out.hurst == _r6((n * sxy - sx * sy) / (n * sx2 - sx * sx))


def test_lorenz_deciles_hand(spark):
    # 10 customers spending 1..10 dollars: decile i holds customer i,
    # share i/55, cum share = tri(i)/55
    rows = [
        (i, i, "O", float(i), D(2024, 1, 1), "1") for i in range(1, 11)
    ]
    out = {
        r.decile: r
        for r in RB.lorenz_deciles(
            {"orders": _orders(spark, rows)}
        ).collect()
    }
    assert len(out) == 10
    for i in range(1, 11):
        assert out[i].n_customers == 1
        assert out[i].spend_cents == i * 100
        assert out[i].share == _r6(i / 55)
        assert out[i].cum_share == _r6(i * (i + 1) / 2 / 55)


def test_atkinson_equal_is_zero_and_two_member(spark):
    cust = spark.createDataFrame(
        [(1, "a", 0, 0.0, "S"), (2, "b", 0, 0.0, "S"),
         (3, "c", 1, 0.0, "S"), (4, "d", 1, 0.0, "S")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    rows = [
        (1, 1, "O", 5.0, D(2024, 1, 1), "1"),
        (2, 2, "O", 5.0, D(2024, 1, 1), "1"),
        (3, 3, "O", 1.0, D(2024, 1, 1), "1"),
        (4, 4, "O", 4.0, D(2024, 1, 1), "1"),
    ]
    out = {
        r.nationkey: r
        for r in RB.atkinson_index(
            {"customer": cust, "orders": _orders(spark, rows)}
        ).collect()
    }
    assert out[0].atkinson == 0.0  # equal spends -> no inequality

    def nano(x):
        return math.floor(x * 1e9 + 0.5)

    ln_sum = nano(math.log(100)) + nano(math.log(400))
    geo = math.exp(ln_sum / (2 * 1e9))
    assert out[1].geo_mean_cents == math.floor(geo * 100 + 0.5) / 100
    assert out[1].atkinson == _r6(1.0 - geo / 250.0)


# ---- batch 2: text/LM operators --------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars int"
    )


def test_good_turing_hand_computed(spark):
    # bigrams: "a b" x3, "b a" x2, "a c" x1  (from "a b a b a b" etc.)
    from pubsub_mapreduce_spark.operators.textops import good_turing

    rows = [
        (1, "a b", "en", "s", 3),
        (2, "a b", "en", "s", 3),
        (3, "a b", "en", "s", 3),
        (4, "b a", "en", "s", 3),
        (5, "b a", "en", "s", 3),
        (6, "a c", "en", "s", 3),
    ]
    out = {r.r: r for r in good_turing(_docs(spark, rows)).collect()}
    # N_1 = 1 (a c), N_2 = 1 (b a), N_3 = 1 (a b)
    assert out[1].n_r == 1 and out[2].n_r == 1 and out[3].n_r == 1
    assert out[1].r_star == 2.0  # (1+1)*N_2/N_1
    assert out[2].r_star == 3.0
    assert out[3].r_star == 0.0  # N_4 empty
    assert [out[r].band for r in (1, 2, 3)] == [1, 2, 3]


def test_kn_continuation_san_francisco(spark):
    # 'francisco' is frequent but only ever follows 'san': continuation
    # types = 1; 'the' follows many distinct words.
    from pubsub_mapreduce_spark.operators.textops import kn_continuation

    rows = [
        (1, "san francisco san francisco san francisco", "en", "s", 1),
        (2, "cat the dog the bird the fish the", "en", "s", 1),
    ]
    out = {
        r.tok: r
        for r in kn_continuation(_docs(spark, rows), top_n=10).collect()
    }
    assert out["francisco"].cont_types == 1
    assert out["the"].cont_types == 4
    # distinct bigram types: (san,francisco),(francisco,san),
    # (cat,the),(the,dog),(dog,the),(the,bird),(bird,the),(the,fish),
    # (fish,the) = 9
    assert out["the"].p_continuation == math.floor(4 / 9 * 1e6 + 0.5) / 1e6


def test_simpson_and_ttr_hand(spark):
    from pubsub_mapreduce_spark.operators.textops import (
        simpson_diversity,
        ttr_windows,
    )

    # lang en: tokens a a b -> D = 1 - (2*1)/(3*2) = 2/3
    rows = [(1, "a a b", "en", "s", 5)]
    out = simpson_diversity(_docs(spark, rows)).collect()[0]
    assert out.tokens == 3 and out.types == 2
    assert out.simpson_diversity == math.floor(2 / 3 * 1e6 + 0.5) / 1e6
    # ttr: one full 20-token window with 5 distinct -> 0.25; the
    # 3-token remainder window drops
    text = " ".join(["t%d" % (i % 5) for i in range(23)])
    out2 = ttr_windows(_docs(spark, [(1, text, "en", "s", 1)])).collect()
    assert len(out2) == 1
    assert out2[0].n_windows == 1 and out2[0].mean_ttr == 0.25


def test_readability_and_script_profile_hand(spark):
    from pubsub_mapreduce_spark.operators.textops import (
        readability_scores,
        script_profile,
    )

    # "hello world": 2 words; vowel groups: e,o / o -> 3 syllables
    rows = [(1, "hello world", "en", "s", 11)]
    out = readability_scores(_docs(spark, rows)).collect()[0]
    assert out.words == 2 and out.syllables == 3
    want = 206.835 - 1.015 * 2.0 - 84.6 * 1.5
    assert out.flesch == math.floor(want * 1e6 + 0.5) / 1e6
    # "ab 12 !": 7 chars, 2 alpha, 2 digit, 2 space, 1 other
    sp = script_profile(_docs(spark, [(1, "ab 12 !", "en", "s0", 7)]))
    r = sp.collect()[0]
    assert r.chars == 7
    assert r.alpha_ratio == math.floor(2 / 7 * 1e6 + 0.5) / 1e6
    assert r.digit_ratio == math.floor(2 / 7 * 1e6 + 0.5) / 1e6
    assert r.space_ratio == math.floor(2 / 7 * 1e6 + 0.5) / 1e6
    assert r.other_ratio == math.floor(1 / 7 * 1e6 + 0.5) / 1e6


# ---- batch 3: survival / eval / fairness ------------------------------


def test_nelson_aalen_hand(spark):
    # two users of type a: both start day 1; u1 churns day 2 (corpus
    # max day 3 via type b) -> H(day2) = 1/2
    rows = [
        (0, D(2024, 1, 1), 1, "a", 0.0),
        (1, D(2024, 1, 2), 1, "a", 0.0),
        (2, D(2024, 1, 1), 2, "a", 0.0),
        (3, D(2024, 1, 3), 2, "a", 0.0),
        (4, D(2024, 1, 3), 3, "b", 0.0),
    ]
    out = {
        (r.event_type, r.day): r
        for r in RB.nelson_aalen(_events(spark, rows)).collect()
    }
    a2 = out[("a", "2024-01-02")]
    assert a2.n_risk == 2 and a2.n_churn == 1
    assert a2.cum_hazard == 0.5 and a2.hazard_var == 0.25


def test_gehan_matches_weighted_logrank_reference(spark):
    # recompute W and VarW with plain Python from the same calendar
    # spine the operator defines
    import collections

    rows = []
    eid = 0
    spans = {"a": [(1, 2), (1, 4), (2, 5)], "b": [(1, 5), (3, 5), (1, 3)]}
    for g, us in spans.items():
        for uid, (f, l) in enumerate(us):
            u = hash((g, uid)) % 10000 + (0 if g == "a" else 50000)
            rows.append((eid, D(2024, 1, f), u, g, 0.0)); eid += 1
            rows.append((eid, D(2024, 1, l), u, g, 0.0)); eid += 1
    out = RB.gehan_wilcoxon(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    mx = 5
    days = range(1, 6)
    stats = {}
    for g, us in spans.items():
        s = collections.Counter(f for f, _ in us)
        d = collections.Counter(l for _, l in us if l < mx)
        stats[g] = (s, d)
    W = V = 0.0
    o1 = 0
    n_at = {g: 0 for g in spans}
    churned = {g: 0 for g in spans}
    for day in days:
        for g in spans:
            n_at[g] += stats[g][0].get(day, 0)
        n1 = n_at["a"] - churned["a"]
        n2 = n_at["b"] - churned["b"]
        d1 = stats["a"][1].get(day, 0)
        d2 = stats["b"][1].get(day, 0)
        n, d = n1 + n2, d1 + d2
        if d > 0 and n >= 2:
            e = d * n1 / n
            v = (d * n1 * n2 * (n - d)) / (n * n * (n - 1))
            W += n * (d1 - e)
            V += n * n * v
            o1 += d1
        churned["a"] += d1
        churned["b"] += d2
    assert r.o1 == o1
    assert r.w_stat == _r6(W) and r.v_w == _r6(V)
    assert r.chi2 == _r6(W * W / V)


def test_auc_and_ap_hand(spark):
    # scores: pos at {3, 1}, neg at {2, 0} (coordinate-sum of 1-dim
    # embeddings); AUC by hand = (2 + 1) / 4 = 0.75
    emb = spark.createDataFrame(
        [
            (1, [3.0], 1),
            (2, [1.0], 1),
            (3, [2.0], 0),
            (4, [0.0], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    auc = RB.auc_scores(emb).collect()[0]
    assert auc.n_pos == 2 and auc.n_neg == 2
    assert auc.auc == 0.75
    # AP: thresholds desc 3(P=1,R=.5), 2, 1(P=2/3,R=1), 0
    # AP = .5*1 + .5*(2/3)
    ap = RB.pr_auc(emb).collect()[0]
    assert ap.average_precision == _r6(0.5 + 0.5 * 2 / 3)


def test_equalized_odds_hand(spark):
    cust = spark.createDataFrame(
        [
            (1, "a", 0, 9000.0, "S"),  # pred 1
            (2, "b", 0, 1000.0, "S"),  # pred 0
            (3, "c", 1, 9000.0, "S"),
            (4, "d", 1, 1000.0, "S"),
        ],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    # custs 1 and 4 are heavy users (>=10 orders)
    rows = []
    k = 0
    for ck in (1, 4):
        for _ in range(10):
            rows.append((k, ck, "O", 1.0, D(2024, 1, 1), "1")); k += 1
    out = {
        r.nationkey: r
        for r in RB.equalized_odds(
            {"customer": cust, "orders": _orders(spark, rows)}
        ).collect()
    }
    # nation 0: y=(1,0), p=(1,0) -> tpr=1, fpr=0
    assert out[0].tpr == 1.0 and out[0].fpr == 0.0
    # nation 1: y=(0,1), p=(1,0) -> tpr=0, fpr=1
    assert out[1].tpr == 0.0 and out[1].fpr == 1.0
    # global tpr = 1/2, fpr = 1/2 -> gaps
    assert out[0].tpr_gap == 0.5 and out[1].tpr_gap == -0.5


def test_lang_id_f1_macro(spark):
    from pubsub_mapreduce_spark.operators.textops import lang_id_f1

    # doc1: en-labeled, stopword-heavy -> predicted en (TP for 'en');
    # doc2: de-labeled, no stopwords -> predicted other (TP for other)
    docs = spark.createDataFrame(
        [
            (1, "the of and to in is it for on a", "en", "s", 1),
            (2, "blah blub zzz qqq", "de", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars int",
    )
    out = {r["class"]: r for r in lang_id_f1(docs).collect()}
    assert out["en"].tp == 1 and out["en"].fp == 0 and out["en"].fn == 0
    assert out["en"].f1 == 1.0 and out["other"].f1 == 1.0
    assert out["macro"].f1 == 1.0


# ---- batch 4/5: graph, embedding, series ------------------------------


def test_neighbor_jaccard_hand(spark):
    # square 1-2-3-4-1: nodes 1,3 share neighbors {2,4} -> J = 1.0
    edges = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 2), (3, 4, 2), (1, 4, 2)], "a long, b long, w long"
    )
    from pubsub_mapreduce_spark.operators.graph import neighbor_jaccard

    out = {(r.u, r.v): r for r in neighbor_jaccard(edges).collect()}
    assert out[(1, 3)].jaccard == 1.0 and out[(1, 3)].n_common == 2
    assert out[(2, 4)].jaccard == 1.0


def test_degree_assortativity_star_is_negative(spark):
    # star graph: hub degree 4, leaves degree 1 -> perfectly
    # disassortative, r = -1 -> r_plus1 = 0
    edges = spark.createDataFrame(
        [(0, i, 2) for i in range(1, 5)], "a long, b long, w long"
    )
    from pubsub_mapreduce_spark.operators.graph import (
        degree_assortativity,
    )

    out = degree_assortativity(edges).collect()[0]
    assert out.n_edges == 4 and out.r_plus1 == 0.0


def test_hits_two_iteration_hand(spark):
    # orders: cust 1 -> order 10 {p1, p2}; cust 2 -> order 20 {p2}
    orders = _orders(
        spark,
        [(10, 1, "O", 1.0, D(2024, 1, 1), "1"),
         (20, 2, "O", 1.0, D(2024, 1, 1), "1")],
    )
    li = spark.createDataFrame(
        [(10, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D(2024, 1, 2)),
         (10, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", D(2024, 1, 2)),
         (20, 2, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", D(2024, 1, 2))],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    from pubsub_mapreduce_spark.operators.graph import hits_scores

    out = {r.partkey: r for r in hits_scores(orders, li).collect()}
    # a1: p1=1, p2=2; h1: u1=3, u2=2; a2: p1=3, p2=5
    assert out[1].authority == 3 and out[2].authority == 5
    assert out[2].auth_ratio == 1.0 and out[1].auth_ratio == 0.6


def test_emb_outliers_planted(spark):
    # 20 vectors at origin-ish, one far away -> it tops the list
    rows = [(i, [0.0, 0.0], 0) for i in range(20)] + [(99, [10.0, 0.0], 1)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from pubsub_mapreduce_spark.operators.similarity import emb_outliers

    out = emb_outliers(emb, top_k=3).collect()
    assert out[0].vec_id == 99
    # centroid = (10/21, 0); dist = 10 - 10/21
    want = 10.0 - 10.0 / 21.0
    assert abs(out[0].dist_to_centroid - want) < 1e-4


def test_ann_k_sweep_monotone_counts(spark):
    from pubsub_mapreduce_spark.io import load_tables
    from pubsub_mapreduce_spark.operators.similarity import ann_k_sweep

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"]
    out = {r.k: r for r in ann_k_sweep(emb).collect()}
    assert set(out) == {1, 5, 10, 20}
    nq = out[1].n_queries
    for k in (1, 5, 10, 20):
        assert out[k].n_exact == k * nq
        assert 0 <= out[k].n_matched <= out[k].n_exact


def test_downsample_and_croston_hand(spark):
    # 10 days of revenue 1..10 dollars into 5 buckets of 2 days
    rows = [
        (i, 1, "O", float(i + 1), D(2024, 1, 1) + dt.timedelta(days=i), "1")
        for i in range(10)
    ]
    out = {
        r.bucket: r
        for r in RB.ts_downsample_minmax(
            _orders(spark, rows), n_buckets=5
        ).collect()
    }
    assert len(out) == 5
    assert out[0].y_min == 100 and out[0].y_max == 200
    assert out[0].y_first == 100 and out[0].y_last == 200
    assert out[4].y_min == 900 and out[4].y_max == 1000
    # croston: type a active days 1 and 4 (of 1..4 calendar via type b),
    # z = [2, 3], gaps = [1, 3]
    ev = []
    eid = 0
    for _ in range(2):
        ev.append((eid, D(2024, 3, 1), 1, "a", 0.0)); eid += 1
    for _ in range(3):
        ev.append((eid, D(2024, 3, 4), 1, "a", 0.0)); eid += 1
    ev.append((eid, D(2024, 3, 2), 2, "b", 0.0)); eid += 1
    out2 = {
        r.event_type: r
        for r in RB.croston_forecast(_events(spark, ev)).collect()
    }
    a = out2["a"]
    lvl = 0.1 * 3 + 0.9 * 2
    itv = 0.1 * 3 + 0.9 * 1
    assert a.n_demands == 2 and a.n_days == 4
    assert a.level == _r6(lvl) and a.interval == _r6(itv)
    assert a.forecast == _r6(lvl / itv)


def test_order_reconciliation_buckets(spark):
    from pubsub_mapreduce_spark.operators.relational import (
        order_reconciliation,
    )

    orders = _orders(
        spark,
        [(1, 1, "O", 2.0, D(2024, 1, 1), "1"),   # lines sum to 2.00
         (2, 1, "O", 2.5, D(2024, 1, 1), "1"),   # lines sum to 2.00
         (3, 1, "O", 99.0, D(2024, 1, 1), "1")],  # no lines
    )
    li = spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 2.0, 0.0, 0.0, "N", "O", D(2024, 1, 2)),
         (2, 1, 1, 1, 1.0, 2.0, 0.0, 0.0, "N", "O", D(2024, 1, 2))],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )
    out = {
        r.bucket: r
        for r in order_reconciliation(
            {"orders": orders, "lineitem": li}
        ).collect()
    }
    assert out["exact"].n_orders == 1
    assert out["sub_dollar"].n_orders == 1
    assert out["sub_dollar"].max_abs_diff_cents == 50
    assert out["no_lines"].n_orders == 1


# ---- batch 6: post-hoc / structural-break / lead-lag ------------------


def test_tukey_hsd_hand(spark):
    # groups (cents): a=[100, 300], b=[500, 700]; MSW = (20000+20000)/2
    rows = [
        (1, 1, "O", 1.0, D(2024, 1, 1), "a"),
        (2, 1, "O", 3.0, D(2024, 1, 1), "a"),
        (3, 1, "O", 5.0, D(2024, 1, 1), "b"),
        (4, 1, "O", 7.0, D(2024, 1, 1), "b"),
    ]
    out = RB.tukey_hsd(_orders(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    msw = 20000.0
    se = math.sqrt(msw / 2 * (1 / 2 + 1 / 2))
    assert r.mean_diff_usd == -4.0
    assert r.q_stat == _r6(400.0 / se)


def test_chow_planted_break(spark):
    # first 16 days flat at 2/day, next 16 days ramping 2,4,6,... ->
    # the split fit beats the pooled fit, F > 0; verify against a
    # literal Python recomputation
    # noisy halves (an exactly-linear segment has RSS 0 and the
    # degenerate-fit predicate drops it)
    counts = [2 + (i % 3) for i in range(16)] + [
        2 * (i + 1) + ((i * 5) % 7) for i in range(16)
    ]
    rows = []
    k = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (k, 1, "O", 1.0, D(2024, 1, 1) + dt.timedelta(days=i), "1")
            )
            k += 1
    out = RB.chow_test(_orders(spark, rows)).collect()[0]

    def rss(pts):
        n = len(pts)
        st = sum(t for t, _ in pts); sy = sum(y for _, y in pts)
        stt = sum(t * t for t, _ in pts)
        sty = sum(t * y for t, y in pts)
        syy = sum(y * y for _, y in pts)
        ctt = n * stt - st * st
        cty = n * sty - st * sy
        cyy = n * syy - sy * sy
        return (cyy - cty * cty / ctt) / n

    pts = list(enumerate(counts))
    r_p = rss(pts); r_1 = rss(pts[:16]); r_2 = rss(pts[16:])
    f = ((r_p - r_1 - r_2) / 2) / ((r_1 + r_2) / (32 - 4))
    assert out.n_days == 32 and out.break_index == 16
    assert out.f_stat == _r6(f) and out.f_stat > 10


def test_granger_planted_lead(spark):
    # type a's count at t predicts type b's count at t+1 exactly
    # (b_t = a_{t-1}); a itself is an uninformative wiggle ->
    # a_causes_b has a large F, b_causes_a does not
    a_counts = [((i * 7) % 5) + 1 for i in range(20)]
    rows, k = [], 0
    for i, c in enumerate(a_counts):
        for _ in range(c):
            rows.append((k, D(2024, 1, 1 + i), 1, "aa", 0.0)); k += 1
    # b_t tracks a_{t-1} plus a small independent wiggle (an EXACT
    # functional dependence gives RSS_u = 0, which the degenerate-fit
    # predicate drops)
    for i in range(1, 20):
        for _ in range(a_counts[i - 1] + (i % 2)):
            rows.append((k, D(2024, 1, 1 + i), 2, "bb", 0.0)); k += 1
    ev = _events(spark, rows)
    out = {r.direction: r for r in RB.granger_lite(ev).collect()}
    # ranked: 'aa' and 'bb' are the two busiest (only) types; rk order
    # by total count. Whichever direction captures lagged-a -> b must
    # dominate the reverse.
    fwd = max(out.values(), key=lambda r: r.f_stat)
    rev = min(out.values(), key=lambda r: r.f_stat)
    assert fwd.f_stat > 10 * max(rev.f_stat, 0.001)
    assert fwd.rss_reduction > 0.8


def test_fisher_exact_tea_tasting_and_literal(spark):
    """The classic 4/4/8 tea-tasting table (k_obs = 3) has two-sided
    p = 0.4857142857...; verify the operator reproduces it AND a
    literal Python recomputation of its own mode-normalized fold on a
    second asymmetric table."""
    # 8 customers: outcome+ = custkey 1..4 (>=1 order with min_orders=1),
    # pred+ = acctbal >= 5000 for custkeys {1,2,3,5}: tp=3.
    cust = spark.createDataFrame(
        [(i, f"c{i}", 0, 9000.0 if i in (1, 2, 3, 5) else 100.0, "S")
         for i in range(1, 9)],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    orders = _orders(
        spark,
        [(i, i, "O", 1.0, D(2024, 1, 1), "1") for i in range(1, 5)],
    )
    out = RB.fisher_exact(
        {"customer": cust, "orders": orders}, min_orders=1
    ).collect()[0]
    assert (out.n, out.r1, out.c1, out.k_obs) == (8, 4, 4, 3)
    # exact: p = (16 + 16 + 1 + 1) / 70
    assert out.p_two_sided == math.floor(34 / 70 * 1e6 + 0.5) / 1e6

    def literal(n, r1, c1, k_obs):
        kmin, kmax = max(0, r1 + c1 - n), min(r1, c1)
        kmode = max(kmin, min(kmax, (r1 + 1) * (c1 + 1) // (n + 2)))

        def ratio(k):
            return ((r1 - k) * (c1 - k)) / ((k + 1) * (n - r1 - c1 + k + 1))

        rel = {kmode: 1.0}
        for k in range(kmode, kmax):
            rel[k + 1] = rel[k] * ratio(k)
        for k in range(kmode - 1, kmin - 1, -1):
            rel[k] = rel[k + 1] / ratio(k)
        thr = rel[k_obs] * (1.0 + 1e-7)
        # mirror the operator's fold order: up pass from the mode,
        # then the down pass
        s_all = s_le = 0.0
        for k in range(kmode, kmax + 1):
            s_all += rel[k]
            if rel[k] <= thr:
                s_le += rel[k]
        for k in range(kmode - 1, kmin - 1, -1):
            s_all += rel[k]
            if rel[k] <= thr:
                s_le += rel[k]
        return s_le / s_all

    # asymmetric table: outcome+ = 1..3 of 9, pred+ = {1, 4, 5, 6}
    cust2 = spark.createDataFrame(
        [(i, f"c{i}", 0, 9000.0 if i in (1, 4, 5, 6) else 100.0, "S")
         for i in range(1, 10)],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    orders2 = _orders(
        spark,
        [(i, i, "O", 1.0, D(2024, 1, 1), "1") for i in range(1, 4)],
    )
    out2 = RB.fisher_exact(
        {"customer": cust2, "orders": orders2}, min_orders=1
    ).collect()[0]
    want = literal(9, 3, 4, 1)
    assert out2.p_two_sided == math.floor(want * 1e6 + 0.5) / 1e6


def test_personalized_pagerank_seed_and_reachability(spark):
    """Chain a -> b -> c with a as the dominant out-degree seed: all
    teleport mass returns to a; c is reachable only through b; a node
    d with an edge INTO a but tiny weight never receives teleport.
    Verify against a literal Python run of the integer recursion."""
    from pubsub_mapreduce_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame(
        [("a", "b", 10), ("b", "c", 5), ("d", "a", 1)],
        "type_from string, type_to string, n_transitions long",
    )
    out = {
        r.node: r.r for r in personalized_pagerank(edges).collect()
    }
    from pubsub_mapreduce_spark.operators.graph import SCALE
    base = (15 * SCALE) // 100
    r = {"a": SCALE, "b": 0, "c": 0, "d": 0}
    outw = {"a": 10, "b": 5, "d": 1}
    E = [("a", "b", 10), ("b", "c", 5), ("d", "a", 1)]
    for _ in range(5):
        s = {k: 0 for k in r}
        for u, v, w in E:
            s[v] += (r[u] * w) // outw[u]
        r = {
            k: (base if k == "a" else 0) + (85 * s[k]) // 100
            for k in r
        }
    assert out == r
    assert out["d"] == 0  # unreachable from the seed
    assert out["a"] > 0 and out["b"] > 0 and out["c"] > 0

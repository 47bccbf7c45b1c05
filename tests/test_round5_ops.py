"""Round-5 operator pins: planted-fixture references for the new stats
ops (Kruskal–Wallis, Mantel–Haenszel, Theil–Sen), the Gopher rule gate,
Zipf slope, and hard-negative mining."""

from __future__ import annotations

import datetime
import math

import pyspark.sql.functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            (i, text, "en", src, len(text))
            for i, (text, src) in enumerate(rows)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_kruskal_wallis_matches_python_reference(spark):
    from pubsub_mapreduce_spark.operators.robust import kruskal_wallis

    # three groups with overlapping values and heavy ties
    data = {
        "s1": [10, 12, 12, 15, 20],
        "s2": [12, 18, 20, 20, 25, 30],
        "s3": [5, 10, 10, 12],
    }
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(
        [(i, "x" * v, "en", g, v) for i, (g, v) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = kruskal_wallis(df).collect()
    assert len(out) == 1
    got = out[0]

    # reference: classic tie-corrected H over average ranks
    allv = sorted(v for _, v in rows)
    n = len(allv)

    def avg_rank(v):
        less = sum(1 for x in allv if x < v)
        eq = sum(1 for x in allv if x == v)
        return less + (eq + 1) / 2

    s12 = 0.0
    for vs in data.values():
        rg = sum(avg_rank(v) for v in vs)
        s12 += rg * rg / len(vs)
    from collections import Counter

    t = sum(c**3 - c for c in Counter(allv).values())
    h = (12.0 / (n * (n + 1)) * s12 - 3 * (n + 1)) / (
        1 - t / ((n - 1) * n * (n + 1))
    )
    assert got["n"] == n and got["k"] == 3 and got["tie_t"] == t
    assert abs(got["h"] - h) < 1e-6


def test_mantel_haenszel_matches_hand_computation(spark):
    """Two planted strata (different weekdays) with a KNOWN common odds
    ratio; MH must recover it while the pooled 2x2 is confounded."""
    from pubsub_mapreduce_spark.operators.robust import mantel_haenszel
    from pubsub_mapreduce_spark.operators.sampling import hash_bucket

    # find user ids hashed to each variant
    probe = spark.createDataFrame(
        [(u,) for u in range(4000)], "user_id long"
    ).select("user_id", hash_bucket(F.col("user_id"), 2).alias("v"))
    v0 = [r["user_id"] for r in probe.collect() if r["v"] == 0]
    v1 = [r["user_id"] for r in probe.collect() if r["v"] == 1]
    # stratum 1 on a Monday, stratum 2 on a Friday; per stratum plant
    # (a, b, c, d): rows are single events per synthetic user
    strata = [
        (datetime.datetime(2024, 1, 1, 12), (30, 70, 20, 80)),  # Monday
        (datetime.datetime(2024, 1, 5, 12), (60, 40, 50, 50)),  # Friday
    ]
    rows, eid = [], 0
    for ts, (a, b, c, d) in strata:
        it0, it1 = iter(v0), iter(v1)
        for _ in range(a):
            rows.append((eid, ts, next(it0), "purchase", 1.0)); eid += 1
        for _ in range(b):
            rows.append((eid, ts, next(it0), "view", 1.0)); eid += 1
        for _ in range(c):
            rows.append((eid, ts, next(it1), "purchase", 1.0)); eid += 1
        for _ in range(d):
            rows.append((eid, ts, next(it1), "view", 1.0)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = mantel_haenszel(df).collect()
    assert len(got) == 1
    r = got[0]
    assert r["k_strata"] == 2 and r["sum_a"] == 90
    num = sum(a * d / (a + b + c + d) for _, (a, b, c, d) in strata)
    den = sum(b * c / (a + b + c + d) for _, (a, b, c, d) in strata)
    assert abs(r["or_mh"] - num / den) < 1e-6
    se = sum(
        (a + b) * (a + c) / (a + b + c + d) for _, (a, b, c, d) in strata
    )
    sv = sum(
        (a + b) * (c + d) * (a + c) * (b + d)
        / ((a + b + c + d) ** 2 * (a + b + c + d - 1))
        for _, (a, b, c, d) in strata
    )
    assert abs(r["cmh"] - (90 - se) ** 2 / sv) < 1e-6


def test_theil_sen_recovers_planted_trend(spark):
    """Daily counts = 10 + day + alternating noise + two huge spike
    days: the Theil–Sen median slope must stay ~1 (OLS would not)."""
    from pubsub_mapreduce_spark.operators.robust import theil_sen_daily

    base = datetime.date(2024, 1, 1)
    days = 40
    rows, oid = [], 0
    for i in range(days):
        cnt = 10 + i + (1 if i % 2 else 0)
        if i in (13, 29):
            cnt += 500  # outlier spikes
        for _ in range(cnt):
            rows.append((oid, base + datetime.timedelta(days=i))); oid += 1
    df = spark.createDataFrame(rows, "o_orderkey long, o_orderdate date")
    out = theil_sen_daily(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pairs"] == days * (days - 1) // 2
    # python reference median of pairwise slopes
    cnts = []
    for i in range(days):
        c = 10 + i + (1 if i % 2 else 0)
        if i in (13, 29):
            c += 500
        cnts.append(c)
    slopes = sorted(
        (cnts[j] - cnts[i]) / (j - i)
        for i in range(days)
        for j in range(i + 1, days)
    )
    m = len(slopes)
    ref = (
        slopes[(m - 1) // 2]
        if m % 2
        else (slopes[m // 2 - 1] + slopes[m // 2]) / 2
    )
    assert abs(r["slope_med"] - ref) < 1e-6
    assert 0.9 <= r["slope_med"] <= 1.1  # robust to the spikes


def test_gopher_rules_boundaries(spark):
    from pubsub_mapreduce_spark.operators.textops import gopher_rules

    good = "the be to of and " + "word " * 60  # 65 words, stopwords, alpha
    rows = [
        (good, "s"),  # passes everything
        ("word " * 49, "s"),  # 49 words -> r_wc False
        ("the be " + "zzzz " * 60, "s"),  # fine
        ("the be " + ("x" * 20 + " ") * 60, "s"),  # mean len > 10
        ("the be " + "#### " * 30 + "word " * 30, "s"),  # symbols heavy
        ("the be of " + "123 " * 60, "s"),  # digits: r_alpha False
        ("word " * 60, "s"),  # no stopwords -> r_stop False
        (
            "the be of " + "word " * 60 + "\n" + "\n".join("- b" for _ in range(20)),
            "s",
        ),  # 20/21 bullet lines -> r_bullet False
    ]
    out = {r["doc_id"]: r for r in gopher_rules(_docs(spark, rows)).collect()}
    assert out[0]["pass"] is True
    assert out[1]["r_wc"] is False
    assert out[2]["pass"] is True
    assert out[3]["r_wlen"] is False
    assert out[4]["r_symbol"] is False
    assert out[5]["r_alpha"] is False and out[5]["r_stop"] is True
    assert out[6]["r_stop"] is False
    assert out[7]["r_bullet"] is False


def test_zipf_slope_matches_python_ols(spark):
    from pubsub_mapreduce_spark.operators.textops import zipf_slope

    # plant exact token counts: token w_i appears c_i times
    counts = [64, 32, 16, 8, 4, 2, 1]
    text = " ".join(
        " ".join(f"w{i}" for _ in range(c)) for i, c in enumerate(counts)
    )
    df = _docs(spark, [(text, "s")])
    out = zipf_slope(df, top_k=10).collect()
    assert len(out) == 1
    xs = [math.log(i + 1) for i in range(len(counts))]
    ys = [math.log(c) for c in sorted(counts, reverse=True)]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sx2 = sum(x * x for x in xs)
    ref = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    assert abs(out[0]["slope"] - ref) < 1e-6
    assert out[0]["slope"] < -0.5  # steep planted power law


def test_hard_negatives_label_constraint_and_planted_neighbor(spark):
    from pubsub_mapreduce_spark.operators.similarity import hard_negatives

    # 60 random-ish vectors in 2 labels + a planted near-duplicate of
    # query 0 carrying the OTHER label
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(60):
        rows.append(
            (i, [rnd.uniform(-1, 1) for _ in range(8)], i % 2)
        )
    q0 = rows[0][1]
    planted = [x + 0.001 for x in q0]
    rows.append((60, planted, 1))  # query 0 has label 0
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negatives(
        emb, k=3, every=20, centroid_every=10, nprobe=5
    ).collect()
    assert out
    for r in out:
        assert r["neg_label"] != r["q_label"]
    mine0 = [r for r in out if r["query_id"] == 0]
    assert mine0 and mine0[0]["neighbor_id"] == 60  # planted near-dup ranks 1
    assert mine0[0]["sim"] > 0.99


def test_cvm_matches_python_reference(spark):
    from pubsub_mapreduce_spark.operators.robust import cvm_source_drift

    data = {"sA": [1, 2, 2, 3, 7, 9], "sB": [2, 4, 4, 5, 6, 8, 10, 10]}
    rows = [
        (i, "x", "en", g, v)
        for i, (g, v) in enumerate(
            (g, v) for g, vs in data.items() for v in vs
        )
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["source"]: r for r in cvm_source_drift(df).collect()}
    allv = [v for vs in data.values() for v in vs]
    n_tot = len(allv)
    for src, vs in data.items():
        n1, n2 = len(vs), n_tot - len(vs)
        rest = [v for g, g_vs in data.items() if g != src for v in g_vs]
        s = 0.0
        for x in sorted(set(allv)):
            c_all = sum(1 for v in allv if v == x)
            c1 = sum(1 for v in vs if v <= x)
            c2 = sum(1 for v in rest if v <= x)
            s += c_all * (n2 * c1 - n1 * c2) ** 2
        ref = s / (n_tot**2 * n1 * n2)
        assert abs(out[src]["cvm"] - ref) < 1e-6, src
        assert out[src]["n1"] == n1 and out[src]["n2"] == n2


def test_jonckheere_matches_bruteforce(spark):
    from pubsub_mapreduce_spark.operators.robust import jonckheere_terpstra

    # ordered groups with a planted increasing trend + ties
    data = {
        "1-HIGH": [1.00, 2.00, 2.00, 3.00],
        "2-MED": [2.00, 3.00, 4.00, 4.00, 5.00],
        "3-LOW": [4.00, 5.00, 6.00, 6.00],
    }
    rows = [
        (i, g, v)
        for i, (g, v) in enumerate(
            (g, v) for g, vs in data.items() for v in vs
        )
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    out = jonckheere_terpstra(df).collect()
    assert len(out) == 1
    r = out[0]
    gs = sorted(data)
    jt2 = 0
    for i in range(len(gs)):
        for j in range(i + 1, len(gs)):
            for x in data[gs[i]]:
                for y in data[gs[j]]:
                    jt2 += 2 * (x < y) + (x == y)
    assert r["jt2"] == jt2
    n = sum(len(v) for v in data.values())
    sn2 = sum(len(v) ** 2 for v in data.values())
    var = (n * n * (2 * n + 3) - sum(
        len(v) ** 2 * (2 * len(v) + 3) for v in data.values()
    )) / 72.0
    ref_z = (jt2 - (n * n - sn2) / 2) / (2 * var**0.5)
    assert abs(r["z"] - ref_z) < 1e-6
    assert r["z"] > 2  # planted increasing trend


def test_kappa_matches_hand_formula(spark):
    from pubsub_mapreduce_spark.operators.textops import kappa_lang_agreement

    # stopword-rich text -> pred 'en'; word-soup -> 'other'
    en_text = "the of and to in it is for on a " * 5
    soup = "zqx wvu ktr " * 10
    rows = []
    # planted confusion: actual en: 30 pred-en, 10 pred-other;
    # actual other: 5 pred-en, 55 pred-other
    for _ in range(30):
        rows.append((en_text, "en"))
    for _ in range(10):
        rows.append((soup, "en"))
    for _ in range(5):
        rows.append((en_text, "de"))
    for _ in range(55):
        rows.append((soup, "de"))
    df = spark.createDataFrame(
        [(i, t, lang, "s", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = kappa_lang_agreement(df).collect()
    assert len(out) == 1
    r = out[0]
    n, a, b, c, d = 100, 30, 10, 5, 55  # 2x2: rows actual, cols pred
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / n**2
    ref = (po - pe) / (1 - pe)
    assert r["n"] == n and r["n_agree"] == a + d
    assert abs(r["kappa"] - ref) < 1e-6
    assert r["kappa"] > 0.5  # strong planted agreement


def test_psi_matches_python_reference(spark):
    from pubsub_mapreduce_spark.operators.sketches import psi_drift

    old_vals = [1.0, 2.0, 2.5, 3.0, 10.0, 10.5]
    new_vals = [8.0, 9.0, 9.5, 10.0, 10.5, 11.0, 1.0]
    mk = lambda vals: spark.createDataFrame(  # noqa: E731
        [(i, float(v)) for i, v in enumerate(vals)], "id long, x double"
    )
    out = psi_drift(mk(old_vals), mk(new_vals), "x", n_bins=5).collect()
    assert len(out) == 1
    r = out[0]
    mn, mx = 1.0, 11.0
    span = mx - mn
    nb = 5

    def hist(vals):
        h = [0] * nb
        for v in vals:
            h[min(nb - 1, int((v - mn) / span * nb))] += 1
        return h

    ho, hn = hist(old_vals), hist(new_vals)
    no, nn = sum(ho), sum(hn)
    import math

    psi = sum(
        ((a + 1) / (no + nb) - (b + 1) / (nn + nb))
        * math.log(((a + 1) / (no + nb)) / ((b + 1) / (nn + nb)))
        for a, b in zip(ho, hn)
    )
    assert r["n_old_total"] == no and r["n_new_total"] == nn
    assert abs(r["psi"] - psi) < 1e-6
    assert r["psi"] > 0  # planted shift


def test_hill_matches_python_reference(spark):
    from pubsub_mapreduce_spark.operators.robust import hill_tail_index

    # planted Pareto(alpha=2)-ish: x_i = 100 / sqrt(u_i)
    import math
    import random

    rnd = random.Random(11)
    vals = [round(100.0 / math.sqrt(rnd.uniform(0.001, 1.0)), 2) for _ in range(400)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)],
        "o_orderkey long, o_totalprice double",
    )
    k = 50
    out = hill_tail_index(df, k=k).collect()
    assert len(out) == 1
    r = out[0]
    cents = sorted((round(v * 100) for v in vals), reverse=True)
    xk1 = cents[k]
    ref = sum(math.log(c / xk1) for c in cents[:k]) / k
    assert r["xk1_cents"] == xk1
    assert abs(r["hill"] - ref) < 1e-6
    # alpha should land near the planted tail index 2
    assert 1.2 < r["alpha"] < 3.0


def test_quantile_normalize_semantics(spark):
    from pubsub_mapreduce_spark.operators.robust import quantile_normalize

    # two sources with shifted distributions; pooled set is their union
    data = {"sA": [10, 20, 30, 40], "sB": [110, 120, 130, 140]}
    rows = [
        (i, "x", "en", g, v)
        for i, (g, v) in enumerate(
            (g, v) for g, vs in data.items() for v in vs
        )
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = quantile_normalize(df).collect()
    assert len(out) == len(rows)
    pooled = sorted(v for vs in data.values() for v in vs)
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["v"], r["v_norm"]))
        assert r["v_norm"] in pooled  # normalized values come from the pool
    for src, pairs in by_src.items():
        pairs.sort()
        norms = [vn for _, vn in pairs]
        assert norms == sorted(norms)  # monotone mapping
    # both sources map onto the SAME pooled quantile values: untied
    # rank r has doubled midrank u = 2r, so idx = (2r*N + n_s)//(2*n_s)
    a = dict(by_src["sA"])
    b = dict(by_src["sB"])
    want = [pooled[(2 * r * 8 + 4) // 8 - 1] for r in (1, 2, 3, 4)]
    assert list(a.values()) == list(b.values()) == want == [20, 40, 120, 140]


def test_t_closeness_matches_python_reference(spark):
    from pubsub_mapreduce_spark.operators.relational import t_closeness

    # two groups: one mirroring the global distribution (t-close), one
    # concentrated in the top band (skewness attack)
    fixture = {
        # mirrors the global shape -> small EMD (t-close)
        "CLOSE": [
            500.0, 600.0, 700.0, 1500.0, 1600.0, 1700.0,
            2500.0, 2600.0, 2700.0, 3500.0, 3600.0, 3700.0,
        ],
        # concentrated in the top band -> skewness attack
        "SKEW": [3500.0, 3550.0, 3650.0, 3800.0],
    }
    rows = []
    cid = 0
    for seg, bals in fixture.items():
        for b in bals:
            rows.append((cid, 1, seg, b)); cid += 1
    df = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string, c_acctbal double"
    )
    out = {r["segment"]: r for r in t_closeness({"customer": df}).collect()}
    bands = {seg: [int(b // 1000) for b in bals] for seg, bals in fixture.items()}
    allb = [b for bs in bands.values() for b in bs]
    from collections import Counter

    gc = Counter(allb)
    for seg, bals in bands.items():
        sc = Counter(bals)
        n_g, N = len(bals), len(allb)
        emd_num, cg, ca = 0, 0, 0
        for b in sorted(gc):
            cg += sc.get(b, 0)
            ca += gc[b]
            emd_num += abs(N * cg - n_g * ca)
        ref = emd_num / (n_g * N * (len(gc) - 1))
        assert out[seg]["emd_num"] == emd_num, seg
        assert abs(out[seg]["emd"] - ref) < 1e-6
    assert not out["CLOSE"]["at_risk"]
    assert out["SKEW"]["at_risk"]


def test_matryoshka_planted_prefix_structure(spark):
    """Vectors whose energy lives in the FIRST 8 dims: truncated search
    at dim 8 must recover (nearly) the full-dim neighbors, while on
    isotropic noise it cannot — the eval must expose that contrast."""
    import random

    rnd = random.Random(3)
    rows = []
    for i in range(120):
        head = [rnd.uniform(-1, 1) for _ in range(8)]
        tail = [rnd.uniform(-0.01, 0.01) for _ in range(56)]
        rows.append((i, [float(x) for x in head + tail], i % 3))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {
        r["dim"]: r
        for r in __import__(
            "pubsub_mapreduce_spark.operators.similarity",
            fromlist=["matryoshka_eval"],
        ).matryoshka_eval(emb, dims=(2, 8), k=5, every=20).collect()
    }
    assert out[8]["recall"] >= 0.9  # head carries the geometry
    assert out[2]["recall"] < out[8]["recall"]  # 2 dims lose neighbors
    assert out[8]["n_queries"] == 6

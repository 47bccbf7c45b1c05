"""Value-level checks for operators/robust.py against plain-Python
references on a hand-built frame (the DuckDB twin covers fixture-scale
parity; this pins the semantics on a case small enough to eyeball)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators import robust as RB


def _events(spark, vals):
    rows = [(i, "t", float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "event_id long, event_type string, value double")


def test_value_outliers_matches_sigma_rule(spark):
    # 20 values near 10.00 plus one wild point: only the wild one flags
    vals = [10.0 + 0.01 * i for i in range(20)] + [500.0]
    out = RB.value_outliers(_events(spark, vals), k=3).collect()
    assert [(r.event_id, r.side) for r in out] == [(20, "high")]
    # cross-check the integer predicate against the float z-score
    cents = [round(v * 100) for v in vals]
    n = len(cents)
    mean = sum(cents) / n
    sd = math.sqrt(sum(c * c for c in cents) / n - mean**2)
    assert abs(cents[20] - mean) > 3 * sd
    assert all(abs(c - mean) <= 3 * sd for c in cents[:20])


def test_value_outliers_low_side(spark):
    vals = [100.0 + 0.01 * i for i in range(30)] + [-900.0]
    out = RB.value_outliers(_events(spark, vals), k=3).collect()
    assert [(r.event_id, r.side) for r in out] == [(30, "low")]


def test_winsorized_cutpoints_and_mean(spark):
    # 1..100 cents=100..10000; p=0.05 -> lo at rank 5 (=500), hi at rank 95
    vals = [float(i) for i in range(1, 101)]
    row = RB.winsorized_stats(_events(spark, vals), p=0.05).collect()[0]
    assert (row.n, row.lo_cents, row.hi_cents) == (100, 500, 9500)
    cents = [round(v * 100) for v in vals]
    clamped = [min(max(c, 500), 9500) for c in cents]
    exp = math.floor(sum(clamped) / 100 * 1e4 + 0.5) / 1e4
    assert row.win_mean_cents == exp
    assert row.mean_cents == math.floor(sum(cents) / 100 * 1e4 + 0.5) / 1e4


def test_winsorize_noop_at_p0(spark):
    vals = [1.0, 2.0, 3.0, 4.0]
    row = RB.winsorized_stats(_events(spark, vals), p=0.0).collect()[0]
    # p=0: lo = rank-1 value (the min), hi = rank-n value (the max)
    assert (row.lo_cents, row.hi_cents) == (100, 400)
    assert row.win_mean_cents == row.mean_cents


def test_rare_token_profile_counts(spark):
    from pubsub_mapreduce_spark.operators import textops as TX

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a zz"), (2, "b b qq zz")],
        "doc_id long, text string",
    )
    # corpus freqs: a=3, b=3, zz=2, qq=1; min_df=3 -> rare: zz, qq
    out = {r.doc_id: r for r in TX.rare_token_profile(docs, min_df=3).collect()}
    assert (out[0].n_tokens, out[0].rare_tokens) == (3, 0)
    assert (out[1].n_tokens, out[1].rare_tokens) == (2, 1)
    assert (out[2].n_tokens, out[2].rare_tokens) == (4, 2)
    assert out[2].rare_frac == 0.5


def test_mad_outliers_zero_mad_edge(spark):
    # 20 identical values -> MAD = 0: any deviating row flags, the
    # identical ones never do (0 > 0 is false)
    vals = [10.0] * 20 + [100.0]
    out = RB.mad_outliers(_events(spark, vals), k=5).collect()
    assert [(r.event_id, r.med, r.mad, r.dev) for r in out] == [(20, 1000, 0, 9000)]


def test_mad_outliers_matches_reference(spark):
    vals = [float(v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 300]]
    cents = [round(v * 100) for v in vals]
    med = sorted(cents)[(len(cents) + 1) // 2 - 1]  # type-1: ceil(n/2)
    devs = sorted(abs(c - med) for c in cents)
    mad = devs[(len(devs) + 1) // 2 - 1]
    exp = {i for i, c in enumerate(cents) if abs(c - med) > 5 * mad}
    out = RB.mad_outliers(_events(spark, vals), k=5).collect()
    assert {r.event_id for r in out} == exp and exp


def test_association_rules_values(spark):
    from pubsub_mapreduce_spark.operators import relational as R

    rows = [
        (0, 1, "a"), (1, 1, "b"), (2, 2, "a"), (3, 2, "b"), (4, 3, "a"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    )
    out = {(r.antecedent, r.consequent): r
           for r in R.association_rules({"events": ev}).collect()}
    ab, ba = out[("a", "b")], out[("b", "a")]
    assert ab.n_both == 2 and ba.n_both == 2
    assert ab.support == ba.support == 0.666667
    assert ab.confidence == 0.666667  # 2 of 3 a-users
    assert ba.confidence == 1.0       # 2 of 2 b-users
    assert ab.lift == ba.lift == 1.0  # 2*3/(3*2)


def test_forecast_backtest_known_series(spark):
    """Constructed series: a perfectly linear ramp makes naive error
    exactly 1/day and the MA-7 forecast lag behind by (w+1)/2 = 4/day;
    a constant series (zero naive error) is dropped by the integer
    guard."""
    from datetime import datetime, timedelta

    from pubsub_mapreduce_spark.operators.robust import forecast_backtest

    base = datetime(2024, 1, 1)
    rows = []
    for day in range(20):
        # type "ramp": count = day+1 events that day; type "flat": always 3
        for i in range(day + 1):
            rows.append((base + timedelta(days=day), "ramp"))
        for i in range(3):
            rows.append((base + timedelta(days=day), "flat"))
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = {r["event_type"]: r for r in forecast_backtest(ev).collect()}
    assert "flat" not in out  # zero naive error -> integer-guard drop
    r = out["ramp"]
    assert r["n_evals"] == 13  # 20 days - 7 warmup
    assert r["mae_naive"] == 1.0
    assert r["mae_ma"] == 4.0  # trailing-7 mean lags a ramp by 4
    assert r["skill_ma_vs_naive"] == 4.0


def test_survival_km_constructed_cohort(spark):
    """4 users, known churn days: KM steps must match the hand-computed
    product, and the user surviving to the final day must be censored
    (never a churn event)."""
    from datetime import datetime, timedelta

    from pubsub_mapreduce_spark.operators.robust import survival_km

    b = datetime(2024, 1, 1)
    rows = []
    # u1 active days 0-1 (churn d1), u2 days 0-3 (churn d3),
    # u3 days 0-3 (churn d3), u4 days 0-5 (censored at corpus end)
    spans = {1: 1, 2: 3, 3: 3, 4: 5}
    for u, last in spans.items():
        for day in range(last + 1):
            rows.append((b + timedelta(days=day), u, "t"))
    ev = spark.createDataFrame(rows, "ts timestamp, user_id long, event_type string")
    out = {r["day"]: r for r in survival_km(ev).collect()}
    assert set(out) == {"2024-01-02", "2024-01-04"}
    d1 = out["2024-01-02"]  # n=4 at risk, 1 churn -> S = 3/4
    assert d1["n_risk"] == 4 and d1["churned"] == 1 and d1["surv"] == 0.75
    d3 = out["2024-01-04"]  # n=3, 2 churn -> S = 0.75 * (1/3) = 0.25
    assert d3["n_risk"] == 3 and d3["churned"] == 2 and d3["surv"] == 0.25


def _src_docs(spark, rows):
    return spark.createDataFrame(
        [(i, "t", "en", s, n) for i, (s, n) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_ks_source_drift_disjoint_and_identical(spark):
    """Disjoint supports give KS = 1 (d_num = n1*n2); an identically
    distributed source gives KS = 0 against its mirror."""
    from pubsub_mapreduce_spark.operators.robust import ks_source_drift

    rows = [("a", v) for v in (1, 2, 3, 4)] + [("b", v) for v in (5, 6, 7, 8)]
    got = {r["source"]: r for r in ks_source_drift(_src_docs(spark, rows)).collect()}
    assert got["a"]["d_num"] == 16 and got["a"]["ks"] == 1.0
    assert got["b"]["ks"] == 1.0

    same = [("a", v) for v in (1, 2)] + [("b", v) for v in (1, 2)]
    got = {r["source"]: r for r in ks_source_drift(_src_docs(spark, same)).collect()}
    assert got["a"]["d_num"] == 0 and got["a"]["ks"] == 0.0


def test_ks_source_drift_hand_value(spark):
    """Hand case: a = {1, 2}, rest = {2, 3}. Cumulatives at v = 1:
    (1, 0); v = 2: (2, 1); v = 3: (2, 2) -> max |2*c1 - 2*c2| = 2,
    KS = 2/4 = 0.5. Single-source corpora produce no rows (n2 = 0)."""
    from pubsub_mapreduce_spark.operators.robust import ks_source_drift

    rows = [("a", 1), ("a", 2), ("b", 2), ("b", 3)]
    got = {r["source"]: r for r in ks_source_drift(_src_docs(spark, rows)).collect()}
    assert got["a"]["d_num"] == 2 and got["a"]["ks"] == 0.5

    solo = [("only", v) for v in (1, 2, 3)]
    assert ks_source_drift(_src_docs(spark, solo)).count() == 0


def test_pettitt_changepoint_planted_step(spark):
    """Daily counts [1,1,1,1,9,9,9,9]: U_t = -4t for t <= 4 then
    rebounds, so K = 16 at the 4th day — the exact Pettitt argmax —
    and a single-day type emits nothing (no interior split)."""
    import datetime as dt

    from pubsub_mapreduce_spark.operators.robust import pettitt_changepoint

    rows = []
    for day in range(8):
        n = 1 if day < 4 else 9
        for i in range(n):
            rows.append(
                ("step", dt.datetime(2024, 1, 1 + day, 12, 0, i))
            )
    rows.append(("lonely", dt.datetime(2024, 1, 1, 0, 0, 0)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: r for r in pettitt_changepoint(ev).collect()}
    assert "lonely" not in got
    r = got["step"]
    assert (r["n_days"], r["cp_day"], r["k_stat"]) == (8, "2024-01-04", 16)


def test_pettitt_changepoint_tie_breaks_earliest(spark):
    """A symmetric two-level series makes |U_t| tie across the
    plateau: the earliest tied day must win on both engines."""
    import datetime as dt

    from pubsub_mapreduce_spark.operators.robust import pettitt_changepoint

    rows = []
    for day, n in enumerate([1, 5, 1, 5]):
        for i in range(n):
            rows.append(("z", dt.datetime(2024, 2, 1 + day, 8, 0, i)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    (r,) = pettitt_changepoint(ev).collect()
    assert r["k_stat"] >= 1 and r["cp_day"] == "2024-02-01"


def test_isotonic_calibration_pools_violators(spark):
    """Classic PAVA case: bucket rates [0.2 (1/5), 0.8 (4/5),
    0.5 (5/10)] violate monotonicity at the last step; the isotonic
    fit pools buckets 2-3 to 9/15 = 0.6 leaving [0.2, 0.6, 0.6] —
    matches the minimax closed form by hand. A monotone curve must
    come back unchanged."""
    from pubsub_mapreduce_spark.operators.robust import isotonic_calibration

    def ev(bucket, n, pos):
        return [
            ("purchase" if i < pos else "click", float(bucket) + 0.25)
            for i in range(n)
        ]

    rows = ev(0, 5, 1) + ev(1, 5, 4) + ev(2, 10, 5)
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {
        r["bucket"]: r for r in isotonic_calibration(df).collect()
    }
    assert [got[b]["iso_rate"] for b in (0, 1, 2)] == [0.2, 0.6, 0.6]
    assert [got[b]["raw_rate"] for b in (0, 1, 2)] == [0.2, 0.8, 0.5]

    mono = ev(0, 4, 0) + ev(1, 4, 2) + ev(2, 4, 4)
    got2 = {
        r["bucket"]: r
        for r in isotonic_calibration(
            spark.createDataFrame(mono, "event_type string, value double")
        ).collect()
    }
    assert [got2[b]["iso_rate"] for b in (0, 1, 2)] == [0.0, 0.5, 1.0]


def test_logrank_identical_groups_not_significant(spark):
    """Two groups with identical churn patterns: O1 = E1 exactly, so
    chi2 = 0 and no significance — the null case by construction."""
    import datetime as dt

    from pubsub_mapreduce_spark.operators.robust import logrank_test

    rows = []
    for g in ("a", "b"):
        for u in range(10):
            churn_day = 3 if u < 5 else 6
            rows.append((g, f"{g}{u}", dt.datetime(2024, 1, 1)))
            rows.append((g, f"{g}{u}", dt.datetime(2024, 1, churn_day)))
        rows.append((g, f"{g}_last", dt.datetime(2024, 1, 1)))
        rows.append((g, f"{g}_last", dt.datetime(2024, 1, 8)))
    ev = spark.createDataFrame(
        rows, "event_type string, user_id string, ts timestamp"
    )
    (r,) = logrank_test(ev).collect()
    assert (r["g1"], r["g2"]) == ("a", "b")
    assert r["o1"] == r["o2"] == 10
    assert r["chi2"] == 0.0 and not r["significant"]


def test_logrank_detects_divergent_churn(spark):
    """Group a churns everyone on day 1, group b survives to day 9:
    the test must flag the difference as significant, and the censored
    day-10 user must not count as a churn."""
    import datetime as dt

    from pubsub_mapreduce_spark.operators.robust import logrank_test

    rows = [("a", f"a{u}", dt.datetime(2024, 2, 1)) for u in range(10)]
    for u in range(10):
        rows.append(("b", f"b{u}", dt.datetime(2024, 2, 1)))
        rows.append(("b", f"b{u}", dt.datetime(2024, 2, 9)))
    rows.append(("b", "b_censored", dt.datetime(2024, 2, 1)))
    rows.append(("b", "b_censored", dt.datetime(2024, 2, 10)))
    ev = spark.createDataFrame(
        rows, "event_type string, user_id string, ts timestamp"
    )
    (r,) = logrank_test(ev).collect()
    assert r["o1"] == 10 and r["o2"] == 10  # censored user excluded
    assert r["significant"] and r["chi2"] > 10


def test_mwu_source_shift_hand_values(spark):
    """Source a = {1, 2}, rest = {3, 4}: every rest value beats every
    a value, so 2*U1 = 0, rb_plus1 = 0 (maximally smaller) and z < 0;
    flipping to a = {3, 4} gives 2*U1 = 2*n1*n2 = 8, rb_plus1 = 2.
    A tie-only corpus (all values equal) emits nothing (var_num = 0)."""
    from pubsub_mapreduce_spark.operators.robust import mwu_source_shift

    def docs(rows):
        return spark.createDataFrame(
            [(i, "t", "en", s, n) for i, (s, n) in enumerate(rows)],
            "doc_id long, text string, lang string, source string,"
            " n_chars int",
        )

    low = [("a", 1), ("a", 2), ("b", 3), ("b", 4)]
    got = {r["source"]: r for r in mwu_source_shift(docs(low)).collect()}
    assert got["a"]["u1_x2"] == 0 and got["a"]["rb_plus1"] == 0.0
    assert got["a"]["z"] < 0 and got["b"]["rb_plus1"] == 2.0

    tied = [("a", 7), ("a", 7), ("b", 7), ("b", 7)]
    assert mwu_source_shift(docs(tied)).count() == 0


def test_mwu_source_shift_tie_half_credit(spark):
    """A tie between a and rest contributes exactly half a pair:
    a = {1, 2}, rest = {2, 3} -> 2*U1 = 2*#(a>rest) + #ties = 0 + 1,
    rb_plus1 = 1/4."""
    from pubsub_mapreduce_spark.operators.robust import mwu_source_shift

    rows = [("a", 1), ("a", 2), ("b", 2), ("b", 3)]
    df = spark.createDataFrame(
        [(i, "t", "en", s, n) for i, (s, n) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    got = {r["source"]: r for r in mwu_source_shift(df).collect()}
    assert got["a"]["u1_x2"] == 1 and got["a"]["rb_plus1"] == 0.25


def test_ols_slope_hand_line(spark):
    """Points on an exact line y = 2x + 3 (x = unit price in whole
    dollars) recover slope 2 and intercept 3 exactly; a constant-price
    brand is dropped by the integer variance guard."""
    from pubsub_mapreduce_spark.operators.robust import ols_slope_by_group

    rows = []
    for i, x in enumerate((1, 2, 3, 4)):
        y = 2 * x + 3
        # unit price x dollars: extendedprice = x * qty
        rows.append((100 + i, float(y), float(x * y), "L"))
    for i in range(3):
        rows.append((200 + i, float(i + 1), float(5 * (i + 1)), "C"))
    li = spark.createDataFrame(
        rows, "l_partkey long, l_quantity double, l_extendedprice double"
        ", tag string"
    ).drop("tag")
    part = spark.createDataFrame(
        [(100 + i, "BrandL") for i in range(4)]
        + [(200 + i, "BrandC") for i in range(3)],
        "p_partkey long, p_brand string",
    )
    got = {r["p_brand"]: r for r in ols_slope_by_group(li, part).collect()}
    assert "BrandC" not in got  # constant price -> zero variance
    r = got["BrandL"]
    assert r["n"] == 4
    assert r["slope_x1k_p1k"] == 2 * 1000 + 1000.0
    assert r["intercept_qty"] == 3.0


def test_type_burstiness_poisson_vs_bursty(spark):
    """Constant daily counts give Fano 0 (no variance); a one-day
    burst drives Fano above 1 and flips the integer overdispersion
    verdict. Hand case: counts [1,1,1,9] -> mean 3, pop var 12,
    F = 12/3 = 4."""
    import datetime as dt

    from pubsub_mapreduce_spark.operators.robust import type_burstiness

    rows = []
    for day, n in enumerate([1, 1, 1, 9]):
        for i in range(n):
            rows.append(("bursty", dt.datetime(2024, 6, 1 + day, 8, 0, i)))
    for day in range(4):
        for i in range(3):
            rows.append(("flat", dt.datetime(2024, 6, 1 + day, 8, 0, i)))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: r for r in type_burstiness(ev).collect()}
    b, f = got["bursty"], got["flat"]
    assert (b["n_days"], b["sx"], b["fano"], b["overdispersed"]) == (
        4, 12, 4.0, True,
    )
    assert (f["fano"], f["overdispersed"]) == (0.0, False)


def test_dow_uniformity_flat_vs_weekend_spike(spark):
    """Perfectly flat week: chi2 = 0, no pattern. All mass on one dow
    across many events: chi2 = 6n (maximal), flagged. Hand case: 7
    events one per dow -> chi_num = 0; 14 events all on the same dow
    -> chi_num = (7*14-14)^2 + 6*14^2 = 84^2 + 1176 = 8232,
    chi2 = 8232/98 = 84 = 6n."""
    import datetime as dt

    from pubsub_mapreduce_spark.operators.robust import dow_uniformity

    rows = []
    for day in range(7):  # 2024-07-01 is a Monday; 7 consecutive days
        rows.append(("flat", dt.datetime(2024, 7, 1 + day, 9)))
    for i in range(14):
        rows.append(("spike", dt.datetime(2024, 7, 7, 9, 0, i)))  # Sunday
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: r for r in dow_uniformity(ev).collect()}
    f, s = got["flat"], got["spike"]
    assert (f["chi_num"], f["chi2"], f["weekly_pattern"]) == (0, 0.0, False)
    assert (s["n"], s["chi_num"], s["chi2"], s["weekly_pattern"]) == (
        14, 8232, 84.0, True,
    )

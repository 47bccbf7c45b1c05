"""Round-9 property tests: hypothesis-generated inputs against
literal Python mirrors for the newest exactness-critical machinery —
the two-pass rank path, the closed-form NTILE beyond double range,
and the MTLD factor-reset fold. Examples are few (one Spark job
each); shrinking is the value, not volume.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators import rank as RK

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@PROP
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
)
def test_global_row_number_two_pass_equals_window(spark, vals):
    """The forced two-pass range-partitioned path must equal the
    single-partition window on ANY multiset (ties broken by the
    unique id column)."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(4)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r["id"]: r["rn"]
        for r in RK.global_row_number(
            df, order, "rn", small_threshold=0
        ).collect()
    }
    want = {
        i: rnk + 1
        for rnk, (v, i) in enumerate(
            sorted((v, i) for i, v in enumerate(vals))
        )
    }
    assert got == want


@PROP
@given(
    n=st.integers(1, (1 << 62)),
    k=st.integers(1, 16),
    data=st.data(),
)
def test_ntile_from_rn_closed_form_property(spark, n, k, data):
    """ntile_from_rn must equal the literal Python closed form at ANY
    row count — including far beyond double's exact-integer range
    (the ADVICE r8 fix)."""
    probes = sorted(
        {
            data.draw(st.integers(1, n))
            for _ in range(6)
        }
        | {1, n}
    )
    q, r = divmod(n, k)
    head = r * (q + 1)

    def py_ntile(rn):
        if rn <= head:
            return (rn - 1) // (q + 1) + 1
        return (rn - head - 1) // q + r + 1

    rows = spark.createDataFrame(
        [(p,) for p in probes], "rn long"
    ).select(
        "rn",
        RK.ntile_from_rn(
            F.col("rn"), F.lit(n).cast("long"), k
        ).alias("b"),
    )
    for row in rows.collect():
        assert row["b"] == py_ntile(row["rn"]), (n, k, row["rn"])


@PROP
@given(
    toks=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        min_size=0,
        max_size=60,
    ),
)
def test_mtld_fold_equals_literal_walk(spark, toks):
    """The Spark HOF factor-reset fold must equal the literal Python
    MTLD walk on any token stream over a small alphabet (which forces
    frequent threshold crossings)."""
    from pubsub_mapreduce_spark.operators import textops as TX

    text = " ".join(toks)
    df = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    row = TX.mtld(df).collect()[0]

    f, seen, flen = 0, [], 0
    for x in toks[:200]:
        if x not in seen:
            seen = seen + [x]
        flen += 1
        if 100 * len(seen) <= 72 * flen:
            f, seen, flen = f + 1, [], 0
    partial = (
        (1.0 - len(seen) / flen) / (1.0 - 0.72) if flen > 0 else 0.0
    )
    total = f + partial
    want = (
        math.floor(len(toks) / total * 1e6 + 0.5) / 1e6
        if total > 0
        else None
    )
    assert row["n_tokens"] == len(toks)
    assert row["n_factors"] == f
    assert row["mtld"] == want


@PROP
@given(
    vals=st.lists(st.integers(0, 30), min_size=2, max_size=30),
)
def test_global_prefix_min_two_pass_equals_window(spark, vals):
    """Forced two-pass strict-prefix min == the window form on any
    multiset (NULL on the global first row)."""
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(3)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = RK.global_prefix_min(
        df, order, "v", "pm", small_threshold=0
    )
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = df.select(
        "id", F.min("v").over(w).alias("pm")
    )
    diff = (
        got.select("id", "pm")
        .exceptAll(want)
        .union(want.exceptAll(got.select("id", "pm")))
    )
    assert diff.count() == 0

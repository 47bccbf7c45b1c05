"""Round-6 fix pins: the entity_match wildcard-block rewrite (VERDICT
r5 #2) and the user_similarity_sparse day-width guard (VERDICT r5 #3).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.io import load_tables
from pubsub_mapreduce_spark.operators import relational as R

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def _pairs(df):
    return sorted(
        (r["a"], r["b"], r["edit_distance"]) for r in df.collect()
    )


def test_entity_match_wildcard_equals_halfblock_on_fixture(spark):
    """The registered wildcard-key blocking finds exactly the pairs the
    retained half-block test oracle finds on the customer fixture
    (equal-length fixed-format names: both schemes are complete for
    one-substitution edits)."""
    cust = load_tables(spark, SF_MED)["customer"]
    new = _pairs(R.entity_match_pairs(cust))
    old = _pairs(R.entity_match_pairs_halfblock(cust))
    assert new == old and len(new) > 0


def test_entity_match_wildcard_semantics_planted(spark):
    """Planted cases: substitution pair found, equal-name pair found
    once (edit 0), insertion pair NOT claimed (documented contract:
    substitution edits only), cross-extra-key pair blocked."""
    rows = [
        (1, "Customer#001", 0),
        (2, "Customer#002", 0),   # 1 sub from #001
        (3, "Customer#001", 0),   # equal to #001
        (4, "Customer#0001", 0),  # 1 insertion from #001 -> not claimed
        (5, "Customer#002", 1),   # equal to #002 but other nation
        (6, "Xustomer#001", 0),   # 1 sub from #001 (first char)
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string, c_nationkey int")
    got = _pairs(R.entity_match_pairs(df))
    assert (1, 2, 1) in got and (1, 3, 0) in got and (1, 6, 1) in got
    assert (2, 3, 1) in got and (3, 6, 1) in got and (2, 6, 2) not in got
    assert not any(a == 4 or b == 4 for a, b, _ in got)
    assert not any(a == 5 or b == 5 for a, b, _ in got)


def test_entity_match_max_block_cap_drops_mass_duplicates(spark):
    """The max_block cap: a mass-duplicate cluster larger than the cap
    contributes NO pairs (exact dedup owns it), pairs outside the
    cluster survive, and the candidate volume stays bounded by
    sum C(block_size, 2) over post-cap blocks — the 10x-scale shape
    assertion (wildcard blocks never go quadratic in table size)."""
    n_dup = 60
    rows = [(i, "AAAA", 0) for i in range(n_dup)]
    rows += [(1000, "BCDE", 0), (1001, "BCDF", 0)]  # one substitution
    df = spark.createDataFrame(rows, "c_custkey long, c_name string, c_nationkey int")
    got = _pairs(R.entity_match_pairs(df, max_block=50))
    assert got == [(1000, 1001, 1)]
    # uncapped, the duplicate cluster IS returned (C(60,2) pairs)
    full = _pairs(R.entity_match_pairs(df, max_block=10_000))
    assert len(full) == n_dup * (n_dup - 1) // 2 + 1
    # structural ceiling: candidate pairs <= sum C(bsz, 2) with every
    # post-cap bsz <= max_block (replicates the operator's blocking)
    wk = df.select(
        F.col("c_custkey").alias("k"),
        "c_nationkey",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(c_name)), p -> "
                "concat(substring(c_name, 1, p - 1), chr(1), "
                "substring(c_name, p + 1, length(c_name))))"
            )
        ).alias("p", "wkey"),
    )
    sizes = wk.groupBy("p", "wkey", "c_nationkey").count().where(
        F.col("count") <= 50
    )
    bound = sizes.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2)
    ).first()[0]
    assert len(got) <= bound
    assert sizes.agg(F.max("count")).first()[0] <= 50


def test_sparse_similarity_day_width_cap(spark):
    """max_day_width guard: a 'stopword day' on which every user is
    active (width > cap) is dropped from profiles — norms AND dots —
    so the output is the exact cosine of the capped profiles; a narrow
    day's pairs survive untouched."""
    import datetime

    from pubsub_mapreduce_spark.operators.similarity import (
        behavioral_similarity_sparse,
    )

    base = datetime.datetime(2024, 3, 1)
    day = datetime.timedelta(days=1)
    rows, eid = [], 0
    # day 0: users 1..5 all active (width 5 > cap 3) -> dropped
    for u in range(1, 6):
        rows.append((eid, u, base, "purchase")); eid += 1
    # day 1: users 1,2 active twice / once -> the only surviving signal
    rows += [(eid, 1, base + day, "purchase"), (eid + 1, 1, base + day, "purchase"),
             (eid + 2, 2, base + day, "purchase")]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["user_id"], r["similar_user"]): r["sim"]
        for r in behavioral_similarity_sparse(
            df, k=5, event_type="purchase", max_day_width=3
        ).collect()
    }
    # only users 1 and 2 have surviving profiles; single shared day ->
    # cosine 1.0 both directions
    assert set(got) == {(1, 2), (2, 1)} and all(v == 1.0 for v in got.values())
    # uncapped: day 0 makes all 5 users mutually similar
    full = behavioral_similarity_sparse(
        df, k=5, event_type="purchase", max_day_width=None
    )
    assert full.select("user_id").distinct().count() == 5


def test_entity_match_candidate_volume_at_scale(spark):
    """10x-scale pin (VERDICT r5 #2): at 15k synthetic fixed-format
    names, post-cap wildcard block sizes stay tiny (max block size =
    max multiplicity of a one-substitution neighborhood, NOT table
    size), so candidate volume tracks answer volume."""
    n = 15_000
    df = spark.range(n).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        (F.col("id") % 25).cast("int").alias("c_nationkey"),
    )
    wk = df.select(
        "c_nationkey",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(c_name)), p -> "
                "concat(substring(c_name, 1, p - 1), chr(1), "
                "substring(c_name, p + 1, length(c_name))))"
            )
        ).alias("p", "wkey"),
    )
    mx = wk.groupBy("p", "wkey", "c_nationkey").count().agg(F.max("count")).first()[0]
    # one-substitution neighborhoods of distinct %09d ids: <= 10 names
    # share a wildcard key (the ten digits at one position)
    assert mx <= 10
    out = R.entity_match_pairs(df)
    # every pair differs in exactly one digit of the id suffix AND
    # shares a nation: ids 25 apart differing in one digit position
    assert out.count() > 0

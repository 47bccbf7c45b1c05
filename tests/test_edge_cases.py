"""Edge-case behavior pinned: poison-sized fan-out counts, empty inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from pubsub_mapreduce_spark.operators.pipeline import densify_to_vector, fan_out
from pubsub_mapreduce_spark.streaming.pipeline import fan_out_stream


def test_fan_out_clamps_poison_counts(spark):
    """A parseable-but-huge n is clamped (C2 flow control), not exploded
    into an executor-killing sequence array."""
    df = spark.createDataFrame(
        [(0, 3_000_000_000), (1, 3), (2, -5)], "user_id long, n long"
    )
    out = fan_out(df, n="n", max_n=1000)
    got = {
        r["user_id"]: r["c"]
        for r in out.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == {0: 1000, 1: 3}  # clamped, exact, suppressed


def test_fan_out_stream_default_clamp_matches_reference_cap(spark, tmp_path):
    """The streaming form clamps at 1e6 by default (mapper.go:48-51)."""
    src = str(tmp_path / "poison")
    spark.createDataFrame(
        [(0, 2_000_000, "2024-01-01 00:00:00")], "id long, quota long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)
    stream = spark.readStream.schema("id long, quota long, ts timestamp").parquet(src)
    q = (
        fan_out_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("poison_fan")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("select count(*) c from poison_fan").first()["c"] == 1_000_000


def test_densify_empty_input(spark):
    """Empty long-format input densifies to an empty vector, not a crash."""
    df = spark.createDataFrame([], "user_id long, cnt long")
    out = densify_to_vector(df).collect()
    assert len(out) == 1 and out[0]["vector"] == []


def test_clean_text_scrubs_urls_emails_whitespace(spark):
    from pubsub_mapreduce_spark.operators.textops import clean_text

    docs = spark.createDataFrame(
        [
            (1, "Visit https://example.com/a?b=1 NOW", "en", "s"),
            (2, "mail me: bob@example.com\t thanks", "en", "s"),
            (3, "  Plain   TEXT \n with   runs  ", "en", "s"),
            (4, "http://a.b c@d.e tail", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["doc_id"]: r["clean_text"] for r in clean_text(docs).collect()}
    assert got[1] == "visit now"
    assert got[2] == "mail me: thanks"
    assert got[3] == "plain text with runs"
    assert got[4] == "tail"


def test_char_bigram_score_ranks_junk_low(spark):
    """The familiarity score must rank a document made of corpus-typical
    bigrams above one made of rare character junk, and every score must
    lie in (0, 1]."""
    from pubsub_mapreduce_spark.operators.textops import char_bigram_score

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog sat too"),
            (2, "the cat and the dog sat on that mat"),
            (3, "zq#x!7@kv%9j^w&3p*"),  # junk: rare bigrams
            (4, "a"),  # < 2 chars after norm: no bigrams, excluded
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in char_bigram_score(docs).collect()}
    assert 4 not in rows
    assert all(0.0 < r["familiarity"] <= 1.0 for r in rows.values())
    assert rows[3]["familiarity"] < rows[1]["familiarity"]
    assert rows[3]["familiarity"] < rows[2]["familiarity"]


def test_char_bigram_score_plan(spark, tables):
    """Plan contract: the bigram frequency table and the corpus total
    ride as broadcasts (both bounded by |charset|^2 regardless of corpus
    size); the only keyed shuffles are the two aggregates; no cartesian
    row blowup beyond the 1-row total join."""
    from pubsub_mapreduce_spark.operators.textops import char_bigram_score
    from pubsub_mapreduce_spark.plans.explain import (
        assert_broadcast_join,
        assert_no_cartesian,
        keyed_shuffle_count,
    )

    df = char_bigram_score(tables["documents"])
    assert_broadcast_join(df, min_count=2)
    assert_no_cartesian(df)
    # freq agg (x2: broadcast branch + total branch — both collapse to
    # |charset|^2 rows map-side, so the duplication is bytes), the
    # 1-row total exchange, and the per-doc agg
    assert keyed_shuffle_count(df) <= 4


def test_repetition_stats_planted(spark):
    """Planted repetition patterns: an all-one-token doc maxes every
    signal, an all-unique doc zeroes them, and the alternating doc has
    every bigram duplicated but only 40% unique tokens."""
    from pubsub_mapreduce_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),
            (2, "a b c d e"),
            (3, "x"),
            (4, "   "),  # no tokens: excluded
            (5, "a b a b a"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert 4 not in rows
    assert rows[1]["n_tokens"] == 5
    assert rows[1]["top_unigram_frac"] == 1.0
    assert rows[1]["unique_ratio"] == 0.2
    assert rows[1]["dup_bigram_frac"] == 1.0
    assert rows[2]["top_unigram_frac"] == 0.2
    assert rows[2]["unique_ratio"] == 1.0
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[3]["n_tokens"] == 1
    assert rows[3]["dup_bigram_frac"] == 0.0  # no bigrams
    assert rows[5]["top_unigram_frac"] == 0.6
    assert rows[5]["unique_ratio"] == 0.4
    assert rows[5]["dup_bigram_frac"] == 1.0  # "a b"x2, "b a"x2


def test_repetition_stats_zero_shuffle_plan(spark, tables):
    """The whole stat computation is map-only HOF folds — no keyed
    shuffle touches the corpus (the round-robin widen is the only
    exchange)."""
    from pubsub_mapreduce_spark.operators.textops import repetition_stats
    from pubsub_mapreduce_spark.plans.explain import keyed_shuffle_count

    assert keyed_shuffle_count(repetition_stats(tables["documents"])) == 0


def test_ngram_decontaminate_planted(spark):
    from pubsub_mapreduce_spark.operators.textops import ngram_decontaminate

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    bench = mk([(100, "alpha beta gamma delta")])
    train = mk(
        [
            (1, "x y alpha beta gamma z"),  # one shared 3-gram
            (2, "p q r s t"),  # clean: no output row
            (3, "alpha beta gamma alpha beta gamma"),  # distinct grams: 3, 1 hit
            (4, "al pha be ta"),  # near-miss tokens: clean
        ],
    )
    rows = {r["doc_id"]: r for r in ngram_decontaminate(train, bench, n=3).collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["n_grams"] == 4 and rows[1]["n_hits"] == 1
    assert rows[3]["n_grams"] == 3 and rows[3]["n_hits"] == 1
    assert rows[3]["contamination"] == 0.333333


def test_quality_quantile_gate_drops_bottom_quartile_per_lang(spark, tables):
    from pyspark.sql import functions as F

    from pubsub_mapreduce_spark.operators.textops import quality_quantile_gate

    docs = tables["documents"]
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in quality_quantile_gate(docs).groupBy(
        "lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept == {
        lang: n - int(n * 0.25) for lang, n in totals.items()
    }


def test_funnel_conversion_planted_paths(spark):
    """Planted funnel paths: ordering and the horizon both gate each
    transition; out-of-order or late steps don't convert."""
    from pubsub_mapreduce_spark.operators.relational import funnel_conversion

    def ev(eid, ts_s, uid, typ):
        return (eid, ts_s, uid, typ, 1.0, "{}")

    rows = [
        # u1: full path within horizon
        ev(1, "2024-01-01 10:00:00", 1, "view"),
        ev(2, "2024-01-01 10:10:00", 1, "click"),
        ev(3, "2024-01-01 10:20:00", 1, "purchase"),
        # u2: click BEFORE view -> no step2
        ev(4, "2024-01-01 10:00:00", 2, "click"),
        ev(5, "2024-01-01 10:10:00", 2, "view"),
        # u3: click too late (2h after view)
        ev(6, "2024-01-01 10:00:00", 3, "view"),
        ev(7, "2024-01-01 12:30:00", 3, "click"),
        # u4: purchase without click -> step3 not reached
        ev(8, "2024-01-01 10:00:00", 4, "view"),
        ev(9, "2024-01-01 10:05:00", 4, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = funnel_conversion({"events": events}).first()
    assert got["n_step1"] == 4  # u1..u4 all viewed
    assert got["n_step2"] == 1  # only u1 clicked after viewing in time
    assert got["n_step3"] == 1
    assert got["conv_step2"] == 0.25


def test_merge_upsert_markers_handle_null_values(spark):
    """Presence markers (not null-sniffing) classify rows: an update
    whose new value IS NULL must still count as matched and null out the
    target column; null-keyed rows never fabricate matches."""
    from pubsub_mapreduce_spark.operators.relational import merge_upsert

    target = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c")],
        "k long, bal double, name string",
    )
    updates = spark.createDataFrame(
        [(2, None), (4, 40.0)], "k long, new_bal double"
    )
    got = {
        r["k"]: r
        for r in merge_upsert(
            target, updates, key="k", set_cols={"bal": "new_bal"}
        ).collect()
    }
    assert got[1]["action"] == "keep" and got[1]["bal"] == 10.0
    # matched but new value null: action=update, coalesce falls back
    assert got[2]["action"] == "update" and got[2]["bal"] == 20.0
    assert got[3]["action"] == "keep" and got[3]["bal"] is None
    assert got[4]["action"] == "insert" and got[4]["bal"] == 40.0
    assert got[4]["name"] is None  # insert: non-set target cols null


def test_dq_check_null_semantics_and_rates(spark):
    """SQL three-valued logic: a NULL rule result is neither pass nor
    violation (matching WHERE NOT(cond) in the oracle) — nulls must be
    targeted explicitly with an isNotNull rule."""
    from pubsub_mapreduce_spark.operators.relational import dq_check

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 0.0)], "id long, v double"
    )
    got = {
        r["rule"]: r
        for r in dq_check(
            df, {"v_positive": F.col("v") > 0, "v_present": F.col("v").isNotNull()}
        ).collect()
    }
    # -5 and 0 violate v_positive; the NULL row does NOT (three-valued)
    assert got["v_positive"]["n_violations"] == 2
    assert got["v_present"]["n_violations"] == 1
    assert got["v_positive"]["violation_rate"] == 0.5


def test_event_cooccurrence_single_type_user_guard(spark):
    """A user with only one event type must not blow up the pair
    expansion (Spark's sequence(1, 0) runs DESCENDING -> element_at 0
    throws under ANSI) and must still count in the support denominator."""
    from pubsub_mapreduce_spark.operators.relational import event_cooccurrence

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-01-01 10:01:00", 1, "click", 1.0, "{}"),
            (3, "2024-01-01 10:02:00", 2, "view", 1.0, "{}"),  # single-type
            (4, "2024-01-01 10:03:00", 3, "click", 1.0, "{}"),
            (5, "2024-01-01 10:04:00", 3, "view", 1.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = event_cooccurrence({"events": events}).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["type_a"], r["type_b"], r["n_users"]) == ("click", "view", 2)
    assert r["support"] == 0.666667  # 2 of 3 users (single-type counted)


def test_lateness_profile_detects_planted_disorder(spark):
    from pubsub_mapreduce_spark.operators.pipeline import lateness_profile

    rows = [
        # arrival order = event_id; u1's third arrival is 40s late
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (2, "2024-01-01 10:01:00", 1, "view", 1.0, "{}"),
        (3, "2024-01-01 10:00:20", 1, "view", 1.0, "{}"),  # late by 40s
        (4, "2024-01-01 10:02:00", 2, "click", 1.0, "{}"),  # in order
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, "
        "value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["event_type"]: r for r in lateness_profile(events).collect()}
    assert got["view"]["n_late"] == 1
    assert got["view"]["max_late_s"] == 40.0
    assert got["click"]["n_late"] == 0


def test_pii_audit_and_scrub_planted(spark):
    """Planted-PII behavior: the audit counts each class; the scrub
    replaces every instance with its tag, counts all redactions, and
    leaves clean text byte-identical. (The fixtures are PII-free, so
    the oracle-parity test only proves the zero case — this pins the
    positive one.)"""
    from pubsub_mapreduce_spark.operators.textops import pii_audit, pii_scrub

    rows = [
        (1, "contact bob@example.com or https://x.io/a?b=1 now", "en", "s1", 0),
        (2, "call 555-123-4567 from 10.0.0.1 card 1234567812345678", "en", "s1", 0),
        (3, "perfectly clean text", "en", "s2", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    audit = {r["source"]: r for r in pii_audit(docs).collect()}
    a = audit["s1"]
    assert (a["n_email"], a["n_url"], a["n_phone"], a["n_ipv4"], a["n_id16"]) == (
        1, 1, 1, 1, 1,
    )
    assert a["docs_email"] == 1 and a["n_docs"] == 2
    z = audit["s2"]
    assert z["n_email"] == z["n_url"] == z["n_phone"] == z["n_ipv4"] == z["n_id16"] == 0
    s = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert s[1]["text_scrubbed"] == "contact <EMAIL> or <URL> now"
    assert s[2]["text_scrubbed"] == "call <PHONE> from <IPV4> card <ID16>"
    assert s[3]["text_scrubbed"] == "perfectly clean text"
    assert (s[1]["n_redacted"], s[2]["n_redacted"], s[3]["n_redacted"]) == (2, 3, 0)


def test_aggregate_upsert_identity_and_disjoint(spark):
    """IVM edge semantics: an empty delta is the identity; disjoint key
    sets union with each side's stats intact (nulls from the outer join
    must not poison count/sum/min/max)."""
    from pubsub_mapreduce_spark.operators.relational import (
        aggregate_upsert,
        user_value_summary,
    )

    ev = spark.createDataFrame(
        [(1, 10, 1.5), (2, 10, -2.0), (3, 20, 0.25)],
        "event_id long, user_id long, value double",
    )
    full = user_value_summary(ev)
    empty = user_value_summary(ev.where(F.lit(False)))
    merged = {r["user_id"]: r for r in aggregate_upsert(full, empty).collect()}
    base = {r["user_id"]: r for r in full.collect()}
    assert merged == base
    a = user_value_summary(ev.where(F.col("user_id") == 10))
    b = user_value_summary(ev.where(F.col("user_id") == 20))
    m = {r["user_id"]: r for r in aggregate_upsert(a, b).collect()}
    assert m[10]["cnt"] == 2 and m[10]["min_v"] == -2.0 and m[10]["max_v"] == 1.5
    assert m[20]["cnt"] == 1 and m[20]["sum_micro"] == 250000


def test_substring_spans_short_and_empty_docs(spark):
    """Docs shorter than k produce no grams (hence no spans) rather
    than erroring; two identical long docs produce full-length spans
    on both."""
    from pubsub_mapreduce_spark.operators.dedup import (
        duplicate_substring_spans,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "tiny"), (4, "")],
        "doc_id long, text string",
    )
    spans = duplicate_substring_spans(docs, k=20, min_span=40).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    for d in (1, 2):
        (s,) = by_doc[d]
        assert s["span_start"] == 0 and s["span_len"] == len(text)
        assert s["span_text"] == text
    assert not any(r["doc_id"] in (3, 4) for r in spans)


def test_snapshot_diff_partitions_ops(spark):
    """insert/delete/update classification on a hand-built pair of
    snapshots, including a NULL -> value transition counting as an
    update (null-safe comparison)."""
    from pubsub_mapreduce_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, "k", ["s", "v"]).collect()}
    assert got == {2: "update", 3: "delete", 4: "insert"}


def test_scrub_spans_empty_and_null_text(spark):
    """Empty/short/null-text docs pass through the scrub untouched
    (zero counters) rather than erroring or vanishing; a doc that is
    entirely one duplicated span scrubs to the empty string."""
    from pubsub_mapreduce_spark.operators.dedup import scrub_duplicate_spans

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "tiny"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_duplicate_spans(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for d in (1, 2):
        assert out[d]["clean_text"] == ""
        assert out[d]["chars_removed"] == len(text)
    assert out[3]["clean_text"] == "tiny" and out[3]["n_spans"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_spans"] == 0
    assert out[5]["clean_text"] is None and out[5]["n_spans"] == 0


def test_winnow_empty_and_null_text(spark):
    """Empty and null texts yield no fingerprints and no pairs, without
    erroring under ANSI mode."""
    from pubsub_mapreduce_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "short")],
        "doc_id long, text string",
    )
    assert winnow_fingerprints(docs, k=8, w=16).count() == 0
    assert winnow_pairs(docs, k=8, w=16, min_shared=1).count() == 0

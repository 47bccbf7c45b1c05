"""Behavioral pins for the round-3 additions: DSIR importance,
tokenizer fertility, the image gate, and the quantile-sketch check
(cross-engine parity is covered by test_oracle_parity; these pin the
operator semantics on constructed inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, "s", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_dsir_importance_ranks_target_like_docs_higher(spark):
    """Docs made of tokens that only occur in the target slice must
    outscore docs made of tokens that only occur outside it."""
    from pubsub_mapreduce_spark.operators.sampling import dsir_importance

    rows = (
        [("alpha beta gamma", "en")] * 8
        + [("uno dos tres", "es")] * 8
        + [("alpha beta gamma", "xx"), ("uno dos tres", "yy")]
    )
    out = {
        r["doc_id"]: r["importance"]
        for r in dsir_importance(_docs(spark, rows)).collect()
    }
    # The round-4 dense-total Laplace smoothing (ADVICE fix: unseen
    # buckets carry the +1 prior on BOTH sides) shifts every score by
    # the same nr/nt factor, so the absolute >1.0 anchor moved; the
    # DSIR contract is the RANKING: target-like text must outscore
    # raw-only text, and the target slice itself scores above the
    # non-target slice.
    assert out[16] > out[17]
    assert min(out[i] for i in range(8)) > max(out[i] for i in range(8, 16))


def test_dsir_importance_is_partitioning_invariant(spark):
    from pubsub_mapreduce_spark.operators.sampling import dsir_importance

    rows = [(f"tok{i % 7} tok{i % 3} filler", "en" if i % 2 else "de")
            for i in range(40)]
    d = _docs(spark, rows)
    a = sorted(map(tuple, dsir_importance(d).collect()))
    b = sorted(map(tuple, dsir_importance(d.repartition(7)).collect()))
    assert a == b


def test_tokenizer_fertility_counts_subword_pieces(spark):
    from pubsub_mapreduce_spark.operators.textops import tokenizer_fertility

    # "ab1cd!" -> pieces [ab, 1, cd, !] = 4 over 1 word; "plain words" -> 2/2
    rows = [("ab1cd!", "hi"), ("plain words", "en")]
    out = {r["lang"]: r for r in tokenizer_fertility(_docs(spark, rows)).collect()}
    assert out["hi"]["n_words"] == 1 and out["hi"]["n_subwords"] == 4
    assert out["hi"]["fertility"] == 4.0
    assert out["en"]["fertility"] == 1.0


def test_image_gate_aspect_and_min_dim(spark):
    """Gate math on the fake decoder: width = (len % 640) + 1, height =
    (sum of first 16 bytes % 480) + 1 — construct a payload failing the
    min-dim check and one passing everything."""
    from pubsub_mapreduce_spark.operators.multimodal import image_gate

    small = "x" * 10  # width 11; height = (sum of 10 'x' bytes) % 480 + 1
    ok = "A" * 100  # width 101, height = (16*65) % 480 + 1 = 81 -> pass
    rows = [(small, "en"), (ok, "en")]
    out = image_gate(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_images"] == 2 and r["n_pass"] == 1
    assert r["pass_ppm"] == 500000


def test_approx_quantile_check_bound_holds_and_median_exact(spark):
    from pubsub_mapreduce_spark.operators.sketches import approx_quantile_check

    rows = [(i, "t", float(v)) for i, v in enumerate(range(1, 102))]
    ev = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = approx_quantile_check(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 101
    assert r["exact_p50_cents"] == 5100  # lower median of 1..101 = 51
    assert r["within_bound"] is True


def test_quality_keeper_prefers_high_quality_copy(spark):
    """Two exact-content copies (same normalized text): the keeper must
    be chosen per-group; identical quality -> lowest doc_id wins, and
    n_copies audits the group size."""
    from pubsub_mapreduce_spark.operators.dedup import quality_keeper

    good = "This is a perfectly reasonable document about the spark engine and the data it processes for training runs."
    rows = [(good, "en"), (good.upper(), "en"), ("zz", "xx")]
    out = {r["doc_id"]: r for r in quality_keeper(_docs(spark, rows)).collect()}
    # normalized content hash lowercases: docs 0 and 1 form one group
    assert set(out) == {0, 2}
    assert out[0]["n_copies"] == 2 and out[2]["n_copies"] == 1


def test_cross_source_dups_only_cross_source_pairs(spark):
    from pubsub_mapreduce_spark.operators.dedup import cross_source_dups

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    df = spark.createDataFrame(
        [
            (0, base, "en", "sA", len(base)),
            (1, base + " tail", "en", "sB", len(base) + 5),
            (2, base + " tail2", "en", "sA", len(base) + 6),
            (3, "completely different words entirely here now", "en", "sC", 44),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    pairs = {(r["a"], r["b"]): (r["source_a"], r["source_b"])
             for r in cross_source_dups(df).collect()}
    assert (0, 1) in pairs and (1, 2) in pairs
    assert (0, 2) not in pairs  # same source -> excluded
    assert all(sa != sb for sa, sb in pairs.values())


def test_contamination_report_counts_and_clean_sources(spark):
    from pubsub_mapreduce_spark.operators.textops import contamination_report

    bench = _docs(spark, [("the quick brown fox jumps", "en")])
    train = spark.createDataFrame(
        [
            (10, "the quick brown fox sleeps", "en", "sA", 26),
            (11, "nothing shared here at all", "en", "sA", 26),
            (12, "unrelated text entirely again", "en", "sB", 29),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = {r["source"]: r for r in contamination_report(train, bench).collect()}
    assert out["sA"]["n_docs"] == 2 and out["sA"]["n_contaminated"] == 1
    assert out["sA"]["contam_ppm"] == 500000
    assert out["sB"]["n_contaminated"] == 0 and out["sB"]["contam_ppm"] == 0


def test_scrub_duplicate_spans_removes_shared_boilerplate(spark):
    """Two docs sharing a long template paragraph: the template is cut
    from both, unique prose survives, clean docs pass through."""
    from pubsub_mapreduce_spark.operators.dedup import scrub_duplicate_spans

    boiler = "subscribe to our newsletter for updates and offers today"
    rows = [
        (f"unique first story text here {boiler} and a distinct tail one",
         "en"),
        (f"another unrelated opening {boiler} with its own closing words",
         "en"),
        ("a completely unique document with no repeated content at all",
         "en"),
    ]
    out = {r["doc_id"]: r for r in
           scrub_duplicate_spans(_docs(spark, rows), k=20, min_span=40)
           .collect()}
    assert out[0]["n_spans"] >= 1 and out[1]["n_spans"] >= 1
    assert boiler not in out[0]["clean_text"]
    assert boiler not in out[1]["clean_text"]
    assert out[0]["clean_text"].startswith("unique first story")
    assert out[1]["clean_text"].endswith("closing words")
    assert out[2]["n_spans"] == 0 and out[2]["chars_removed"] == 0
    assert out[2]["clean_text"] == rows[2][0]


def test_scrub_duplicate_spans_overlapping_runs_merge(spark):
    """A doc that is ENTIRELY boilerplate (exact copy of another) must
    come back empty with one merged span covering the whole text."""
    from pubsub_mapreduce_spark.operators.dedup import scrub_duplicate_spans

    text = "the exact same document body repeated verbatim in two rows"
    out = {r["doc_id"]: r for r in
           scrub_duplicate_spans(_docs(spark, [(text, "en"), (text, "en")]),
                                 k=20, min_span=40).collect()}
    for i in (0, 1):
        assert out[i]["clean_text"] == ""
        assert out[i]["n_spans"] == 1
        assert out[i]["chars_removed"] == len(text)


def test_winnow_guarantee_shared_run_yields_shared_fingerprint(spark):
    """The winnowing contract (Schleimer et al.): any shared substring
    of length >= w + k - 1 produces at least one shared selected
    fingerprint; disjoint-content docs share none."""
    from pubsub_mapreduce_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_pairs,
    )

    run = "the quick brown fox jumps over the lazy dog again"  # 49 > w+k-1
    rows = [
        ("prefix one " + run + " suffix alpha", "en"),
        ("different opening " + run + " other ending", "en"),
        ("zq wv kj xc bn md pl rt yu io as df gh jk lz", "en"),
    ]
    docs = _docs(spark, rows)
    fp = winnow_fingerprints(docs, k=8, w=16).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp_hash"])
    assert by_doc[0] & by_doc[1], "shared 49-char run must share a fingerprint"
    assert not (by_doc.get(2, set()) & by_doc[0])
    pairs = winnow_pairs(docs, k=8, w=16, min_shared=1, max_df=50).collect()
    assert {(r["a"], r["b"]) for r in pairs} == {(0, 1)}


def test_winnow_short_doc_no_fingerprints(spark):
    """Docs shorter than w + k - 1 normalized chars yield no complete
    window and therefore no fingerprints (documented contract)."""
    from pubsub_mapreduce_spark.operators.dedup import winnow_fingerprints

    docs = _docs(spark, [("tiny doc", "en"), ("also very small", "en")])
    assert winnow_fingerprints(docs, k=8, w=16).count() == 0


def test_retrieval_label_eval_by_hand(spark):
    """One query (vec_id 0, label 1) against four 2-D candidates with a
    hand-known cosine order 1 > 2 > 3 > 4: relevant hits at ranks 1 and
    3 give P@10 = 0.2, AP2520 = 2520*1 + (2520//3)*2 = 4200 so
    MAP@10 = 4200/25200 = 1/6, and MRR = 1.0 (first hit at rank 1)."""
    from pubsub_mapreduce_spark.operators.similarity import (
        retrieval_label_eval,
    )

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [1.0, 0.01], 1),
        (2, [1.0, 0.2], 0),
        (3, [1.0, 0.5], 1),
        (4, [0.0, 1.0], 0),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = retrieval_label_eval(emb, k=10, every=50).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["label"], r["n_queries"], r["n_rel_at_k"], r["n_covered"]) == (
        1, 1, 2, 1,
    )
    assert r["precision_at_k"] == 0.2
    assert r["map_at_k"] == 0.166667
    assert r["mrr_at_k"] == 1.0


def test_retrieval_label_eval_no_relevant(spark):
    """A query whose label never recurs: zero hits everywhere, metrics
    all 0 — the coverage column distinguishes it from an absent label."""
    from pubsub_mapreduce_spark.operators.similarity import (
        retrieval_label_eval,
    )

    rows = [
        (0, [1.0, 0.0], 9),
        (1, [1.0, 0.1], 2),
        (2, [0.5, 1.0], 2),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = retrieval_label_eval(emb, k=10, every=50).collect()[0]
    assert (r["label"], r["n_rel_at_k"], r["n_covered"]) == (9, 0, 0)
    assert r["precision_at_k"] == 0.0 and r["map_at_k"] == 0.0
    assert r["mrr_at_k"] == 0.0


def test_edit_verify_exact_copy_and_accent_fold(spark):
    """A copy differing only in case, punctuation and non-ASCII chars
    must verify at edit_dist 0 / rel_edit 0 / is_dup true: the
    comparison string is ASCII-normalized (non-[a-z0-9 ] REMOVED, so
    'Café;' and 'café,' both become 'caf') — the normalization that
    keeps Spark code-point and DuckDB byte Levenshtein in agreement."""
    from pubsub_mapreduce_spark.operators.dedup import edit_verify_pairs

    base = (
        "the quick brown fox jumps over the lazy dog while the small "
        "cat watches from the old wooden fence near the river bank "
        "and the birds sing in the tall green trees every morning"
    )
    docs = _docs(spark, [(base + " café, naïve!", "en"),
                         (base + " Café; NAÏVE?", "en")])
    rows = edit_verify_pairs(docs, threshold=0.3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["a"], r["b"], r["edit_dist"], r["rel_edit"], r["is_dup"]) == (
        0, 1, 0, 0.0, True,
    )


def test_edit_verify_flags_reshuffled_paragraphs(spark):
    """Two docs with the same sentences in swapped order share most
    shingles (high Jaccard -> LSH candidate) but need many edits to
    align: rel_edit exceeds the 0.4 duplicate bar, so is_dup = false —
    the false-duplicate class edit verification exists to catch."""
    from pubsub_mapreduce_spark.operators.dedup import edit_verify_pairs

    s1 = ("alpha bravo charlie delta echo foxtrot golf hotel india "
          "juliet kilo lima mike november oscar papa quebec romeo")
    s2 = ("sierra tango uniform victor whiskey xray yankee zulu one "
          "two three four five six seven eight nine ten eleven twelve")
    docs = _docs(spark, [(s1 + " " + s2, "en"), (s2 + " " + s1, "en")])
    rows = edit_verify_pairs(docs, threshold=0.3, max_rel_edit=0.4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["edit_dist"] > 0 and r["rel_edit"] > 0.4 and not r["is_dup"]


def test_distinctive_tokens_surfaces_exclusive_vocab(spark):
    """A token appearing only in one source must top that source's
    distinctive list, with the hand-computed smoothed odds; shared
    uniform vocabulary ranks below it, and sub-min_df tokens never
    appear."""
    from pubsub_mapreduce_spark.operators.textops import distinctive_tokens

    common = "alpha beta gamma delta epsilon"
    rows = []
    for i in range(5):
        rows.append((common + " zebra zebra", "en"))   # source s (set below)
    for i in range(5):
        rows.append((common + " quux quux", "en"))
    docs = spark.createDataFrame(
        [(i, t, lang, "sa" if i < 5 else "sb", len(t))
         for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    got = distinctive_tokens(docs, k=3, min_df=5).collect()
    top = {r["source"]: r for r in got if r["rnk"] == 1}
    assert top["sa"]["term"] == "zebra" and top["sb"]["term"] == "quux"
    # hand-check sa/zebra: a=10, b=0, a_tot=35, rest_tot=35
    # odds = (11 * (35 - 0 + 1)) / ((0 + 1) * (35 - 10 + 1)) = 396/26
    assert top["sa"]["a"] == 10 and top["sa"]["b"] == 0
    assert top["sa"]["odds_r"] == round(396 / 26, 6)
    # rare token (df < 5) is ineligible even though exclusive
    assert all(r["term"] not in {"rare"} for r in got)


def test_rolling_wau_hand_case(spark):
    """u1 active day 1, u2 active days 1 and 3: DAU = [2, 0, 1]; WAU
    at day 3 counts both users once (u2's two active days collapse),
    and trailing windows extend coverage to day 7 (clamped at the
    corpus max = day 3 here, so report days stop at day 3)."""
    import datetime as dt

    from pubsub_mapreduce_spark.operators.relational import rolling_wau

    rows = [
        (1, dt.datetime(2024, 5, 1, 9)),
        (2, dt.datetime(2024, 5, 1, 10)),
        (2, dt.datetime(2024, 5, 3, 11)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["day"]: (r["dau"], r["wau"])
           for r in rolling_wau({"events": ev}).collect()}
    assert got == {
        "2024-05-01": (2, 2),
        "2024-05-02": (0, 2),
        "2024-05-03": (1, 2),
    }

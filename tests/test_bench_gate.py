"""bench.py's per-query regression gate: parsing of the runner's
tail-wrapped BENCH_r*.json and the >factor flagging rule."""

from __future__ import annotations

import json
import sys


def _diff(tmp_path, monkeypatch, prior_doc, timings):
    sys.path.insert(0, "/root/repo")
    import bench

    (tmp_path / "BENCH_r07.json").write_text(json.dumps(prior_doc))
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    return bench.regression_diff(timings)


def test_regression_diff_clean_format(tmp_path, monkeypatch):
    out = _diff(
        tmp_path,
        monkeypatch,
        {"queries": {"q1": 1.0, "q2": 2.0}},
        {"q1": 1.2, "q2": 3.5, "q_new": 9.9},  # q2 regressed 1.75x
    )
    assert out["baseline_file"] == "BENCH_r07.json"
    assert list(out["regressions"]) == ["q2"]
    assert out["regressions"]["q2"]["ratio"] == 1.75


def test_regression_diff_tail_wrapped_format(tmp_path, monkeypatch):
    tail = 'blah {"metric": "x", "queries": {"q1": 1.0, "q2": 0.5}, "sf": 0.1}'
    out = _diff(
        tmp_path,
        monkeypatch,
        {"n": 1, "rc": 0, "tail": tail, "parsed": None},
        {"q1": 0.9, "q2": 1.1},
    )
    assert list(out["regressions"]) == ["q2"]


def test_compact_stdout_line_fits_driver_tail_buffer():
    """Root cause of BENCH_r03/r04 ``parsed: null``: the driver keeps
    only the LAST 2000 chars of bench stdout and the full per-query
    line was ~6.7KB, so the captured tail started mid-line. The stdout
    line must therefore survive ``line[-2000:]`` intact — i.e. be
    <= 1999 chars INCLUDING under a pathological regressions map."""
    sys.path.insert(0, "/root/repo")
    import bench

    doc = {
        "metric": "total_query_wall_sec",
        "value": 123.456,
        "unit": "sec",
        "sf": 0.1,
        "reps": 3,
        "stream_mps": 188476,
        "stream_mps_baseline_local": 10000,
        "queries": {f"query_name_{i:03d}": round(0.05 + i * 0.017, 3) for i in range(300)},
        "variants": {"x": "note " * 50},
        "variants_ab": {f"v{i}": 1.0 for i in range(40)},
        "vs_prev_round": {
            "baseline_file": "BENCH_r04.json",
            "flag_factor": 1.5,
            "regressions": {
                f"query_name_{i:03d}": {
                    "prev": 1.0,
                    "now": 2.0,
                    "ratio": 2.0,
                    "solo": 1.1,
                    "solo_reps": 5,
                    "solo_clears": False,
                }
                for i in range(40)
            },
        },
    }
    line = bench.compact_stdout_line(doc)
    assert len(line) <= 1999
    # the simulated driver capture must contain the WHOLE line
    captured_tail = ("junk-before\n" + line)[-2000:]
    parsed = json.loads(captured_tail[captured_tail.index("{"):])
    assert parsed["metric"] == "total_query_wall_sec"
    assert parsed["value"] == 123.456
    assert parsed["n_queries"] == 300  # trim is flagged, not silent
    assert parsed["queries_full"] == "BENCH_LOCAL.json"
    # the SLOWEST queries are the ones retained
    kept = parsed["queries"]
    assert kept
    slowest = max(doc["queries"], key=doc["queries"].get)
    assert slowest in kept
    assert min(kept.values()) >= max(
        v for k, v in doc["queries"].items() if k not in kept
    )


def test_compact_stdout_line_small_doc_keeps_everything():
    sys.path.insert(0, "/root/repo")
    import bench

    doc = {
        "metric": "total_query_wall_sec",
        "value": 1.0,
        "unit": "sec",
        "sf": 0.01,
        "reps": 1,
        "queries": {"q1": 0.5, "q2": 0.5},
        "vs_prev_round": {},
    }
    parsed = json.loads(bench.compact_stdout_line(doc))
    assert parsed["queries"] == {"q1": 0.5, "q2": 0.5}
    assert parsed["n_queries"] == 2


def test_bench_covers_every_registered_query():
    """VERDICT r4 #4: a registered query outside the bench lists is a
    silent regression blind spot. Every queries() key must be in
    BENCH_QUERIES (3-rep warm-min) or BENCH_QUERIES_SLOW (1-rep heavy
    composites) — new registrations must be appended to one of them."""
    sys.path.insert(0, "/root/repo")
    import bench
    import __spark_entry__ as entrymod

    registered = set(entrymod.queries())
    benched = set(bench.BENCH_QUERIES) | set(bench.BENCH_QUERIES_SLOW)
    excluded = set(bench.BENCH_EXCLUDED)
    assert registered - benched - excluded == set(), sorted(
        registered - benched - excluded
    )
    assert benched - registered == set(), sorted(benched - registered)
    # exclusions must be justified, registered, and not double-listed
    for name, reason in bench.BENCH_EXCLUDED.items():
        assert name in registered and len(reason) > 40, name
    assert excluded & benched == set()
    # no double-listing: a slow query must not also run at 3 reps
    assert set(bench.BENCH_QUERIES) & set(bench.BENCH_QUERIES_SLOW) == set()
    assert len(bench.BENCH_QUERIES) == len(set(bench.BENCH_QUERIES))


def test_regression_diff_no_prior(tmp_path, monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    assert bench.regression_diff({"q1": 1.0}) == {}


def test_noise_canary_fields_survive_compact_line():
    """VERDICT r8 #5: the noise canary's verdict and per-canary ratios
    must reach the stdout JSON (the driver tail) so a noisy window is
    adjudicable from the artifact alone."""
    sys.path.insert(0, "/root/repo")
    import bench

    doc = {
        "metric": "total_query_wall_sec",
        "value": 250.0,
        "unit": "sec",
        "sf": 0.1,
        "reps": 3,
        "queries": {f"q{i}": 0.5 for i in range(300)},
        "canary_start": {
            n: {"sec": 1.0, "pinned_clean": b, "ratio": round(1.0 / b, 2)}
            for n, b in bench.CANARY_BASELINE.items()
        },
        "canary": {
            n: {"sec": 2.0, "pinned_clean": b, "ratio": round(2.0 / b, 2)}
            for n, b in bench.CANARY_BASELINE.items()
        },
        "noise_suspect": True,
        "vs_prev_round": {},
    }
    line = bench.compact_stdout_line(doc)
    assert len(line) <= 1999
    parsed = json.loads(line)
    assert parsed["noise_suspect"] is True
    assert set(parsed["canary"]) == set(bench.CANARY_BASELINE)
    assert set(parsed["canary_start"]) == set(bench.CANARY_BASELINE)
    # VERDICT r9 #2: canary DETAIL is sheddable (compacted to the
    # headline ratio) but the per-canary ratios themselves must survive
    # — they are what adjudicates a noisy window from the artifact alone
    for c in list(parsed["canary"].values()) + list(
        parsed["canary_start"].values()
    ):
        ratio = c["ratio"] if isinstance(c, dict) else c
        assert isinstance(ratio, (int, float))


def test_compact_line_keeps_20_queries_when_noisy():
    """VERDICT r9 #2: a noisy window's canary + solo-remeasure payload
    must be shed BEFORE query timings — the driver's PERF diff needs
    >= 20 per-query entries even under the pathological diagnostics
    load that starved the r9 artifact down to 10."""
    sys.path.insert(0, "/root/repo")
    import bench

    doc = {
        "metric": "total_query_wall_sec",
        "value": 305.8,
        "unit": "sec",
        "sf": 0.1,
        "reps": 3,
        "stream_mps": 242107,
        "stream_mps_baseline_local": 10000,
        "one_rep": [f"heavy_query_name_{i}" for i in range(5)],
        "queries": {
            f"query_name_{i:03d}": round(0.05 + i * 0.017, 3)
            for i in range(405)
        },
        "canary_start": {
            n: {"sec": 1.0, "pinned_clean": b, "ratio": round(1.0 / b, 2)}
            for n, b in bench.CANARY_BASELINE.items()
        },
        "canary": {
            n: {"sec": 2.0, "pinned_clean": b, "ratio": round(2.0 / b, 2)}
            for n, b in bench.CANARY_BASELINE.items()
        },
        "noise_suspect": True,
        "vs_prev_round": {
            "baseline_file": "BENCH_LOCAL_r9.json",
            "n_regressions": 37,
            "regressions": {
                f"query_name_{i:03d}": {
                    "prev": 1.0,
                    "now": 2.5,
                    "ratio": 2.5,
                    "solo": 1.2,
                    "solo_reps": 5,
                    "solo_clears": False,
                }
                for i in range(37)
            },
        },
    }
    line = bench.compact_stdout_line(doc)
    assert len(line) <= 1999
    parsed = json.loads(line)
    assert len(parsed["queries"]) >= 20
    assert parsed["noise_suspect"] is True
    # the slowest queries are the ones retained
    kept = parsed["queries"]
    assert min(kept.values()) >= max(
        v for k, v in doc["queries"].items() if k not in kept
    )


def test_noise_canary_live_run_structure(spark):
    """run_canaries executes the three pinned queries end-to-end and
    returns (per-canary dict, bool). At sf0.001 the warm mins are far
    under the sf0.1 clean pins, so the quorum must NOT trip."""
    sys.path.insert(0, "/root/repo")
    import bench
    import __spark_entry__ as entrymod

    canary, suspect = bench.run_canaries(
        spark, "/root/testdata/sf0.001", entrymod.queries()
    )
    assert set(canary) == set(bench.CANARY_BASELINE)
    assert all(c["sec"] > 0 for c in canary.values())
    assert isinstance(suspect, bool)

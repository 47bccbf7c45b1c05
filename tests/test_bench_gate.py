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


def test_regression_diff_no_prior(tmp_path, monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path), raising=True
    )
    assert bench.regression_diff({"q1": 1.0}) == {}

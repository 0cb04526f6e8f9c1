"""Unit tests for scripts/bench_regress.py (the reference's rolling
perf-regression comparison, artifact_processor.py:118-156, re-expressed
over this repo's BENCH_r{N}.json artifacts)."""

import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from bench_regress import PER_ROW_TOLERANCE_PCT, compare, load


def _doc(queries, build=None):
    d = {"queries": queries}
    if build:
        d["index_build"] = build
    return d


def test_within_tolerance_passes():
    old = _doc({"q1": 1.0, "q2": 2.0})
    new = _doc({"q1": 1.5, "q2": 2.0})  # +50% < default 75%
    assert compare(old, new, 75.0) == []


def test_slower_row_flagged():
    old = _doc({"q1": 1.0})
    new = _doc({"q1": 2.0})  # +100%
    probs = compare(old, new, 75.0)
    assert len(probs) == 1 and "q1" in probs[0] and "SLOWER" in probs[0]


def test_missing_row_flagged_new_rows_ignored():
    old = _doc({"q1": 1.0, "gone": 1.0})
    new = _doc({"q1": 1.0, "brand_new": 9.0})
    probs = compare(old, new, 75.0)
    assert len(probs) == 1 and "gone" in probs[0] and "MISSING" in probs[0]


def test_per_row_override_applies():
    name = "ir_bm25_topk"
    assert PER_ROW_TOLERANCE_PCT[name] == 150.0
    old = _doc({name: 1.0})
    assert compare(old, _doc({name: 2.4}), 75.0) == []  # +140% < 150%
    probs = compare(old, _doc({name: 2.6}), 75.0)  # +160% > 150%
    assert len(probs) == 1


def test_throughput_compares_downward():
    old = _doc({}, build={"docs_per_sec": 10000.0})
    ok = _doc({}, build={"docs_per_sec": 6000.0})  # 10000/1.75 ≈ 5714 floor
    bad = _doc({}, build={"docs_per_sec": 5000.0})
    assert compare(old, ok, 75.0) == []
    probs = compare(old, bad, 75.0)
    assert len(probs) == 1 and "index_build" in probs[0]


def test_load_accepts_driver_wrapper(tmp_path):
    raw = {"queries": {"q1": 1.0}}
    wrapped = {"n": 3, "parsed": raw}
    p1, p2 = tmp_path / "a.json", tmp_path / "b.json"
    p1.write_text(json.dumps(raw))
    p2.write_text(json.dumps(wrapped))
    assert load(str(p1))["queries"] == load(str(p2))["queries"]


def test_committed_artifacts_comparable():
    """The real r3 -> r4 artifacts must compare clean with the
    documented overrides in place (the one >75% row, dedup_exact_docs,
    is triaged in its override comment)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old = load(os.path.join(repo, "BENCH_r03.json"))
    new = load(os.path.join(repo, "BENCH", "BENCH_QUIET_r04.json"))
    assert compare(old, new, 75.0) == []

"""Round-over-round bench regression check.

Reference analog: the reference compares every Google-Benchmark run
against a rolling Jenkins history with per-benchmark tolerance
percentages (script/testing/microbench/artifact_processor.py:118-156,
benchmarks.py:4-21, constants.py:33 LAX_TOLERANCE=50).  This is the
same idea over this repo's committed bench artifacts: diff two
BENCH_r{N}.json (or bench.py output) files row by row and flag rows
that got slower by more than the tolerance.

The host is a shared, overcommitted VM (see BENCH/BASELINE.md §1), so
the default tolerance is deliberately LAX (75%) — the check catches
plan regressions (2-10x), not scheduler noise.  Per-row overrides
tighten rows known to be stable.

Usage:
  python scripts/bench_regress.py OLD.json NEW.json [--tolerance PCT]

Exit 0 = no regressions; exit 1 = at least one row regressed.
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_TOLERANCE_PCT = 75.0

# Rows with a tighter (or looser) allowance than the default, in
# percent-slower-than-old.  Mirrors the per-benchmark map the reference
# keeps in benchmarks.py.
PER_ROW_TOLERANCE_PCT: dict[str, float] = {
    # cold build+query rows include JVM warm-up; extra slack
    "ir_bm25_topk": 150.0,
    "ir_index_build_20k": 150.0,
    "ir_index_build_pos_20k": 150.0,
    # sub-second row dominated by first-call codegen compilation, and
    # the r4 bench runs it with LESS prior warm-up than r3 did (the
    # wasted eager postings materialization was removed): r3 0.44s ->
    # r4 first-call 0.9-1.4s, warm 0.48s, plan unchanged (triaged in
    # round 4 — map-side partial agg, one hash exchange, range sort).
    "dedup_exact_docs": 300.0,
}


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    # accept either a raw bench.py line or the driver's BENCH_r{N}.json
    # wrapper ({"parsed": {...}})
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    if "queries" not in doc:
        raise SystemExit(f"{path}: no 'queries' key — not a bench artifact")
    return doc


def compare(old: dict, new: dict, tolerance_pct: float) -> list[str]:
    problems = []
    oq, nq = old["queries"], new["queries"]
    for name, old_s in sorted(oq.items()):
        if name not in nq:
            problems.append(f"MISSING  {name}: present in old, absent in new")
            continue
        new_s = nq[name]
        tol = PER_ROW_TOLERANCE_PCT.get(name, tolerance_pct)
        limit = old_s * (1.0 + tol / 100.0)
        if new_s > limit:
            problems.append(
                f"SLOWER   {name}: {old_s:.3f}s -> {new_s:.3f}s "
                f"(+{100.0 * (new_s - old_s) / old_s:.0f}%, tolerance {tol:.0f}%)"
            )
    # throughput rows compare the other way (higher is better)
    ob, nb = old.get("index_build"), new.get("index_build")
    if ob and nb and "docs_per_sec" in ob and "docs_per_sec" in nb:
        tol = PER_ROW_TOLERANCE_PCT.get("index_build", tolerance_pct)
        floor = ob["docs_per_sec"] / (1.0 + tol / 100.0)
        if nb["docs_per_sec"] < floor:
            problems.append(
                f"SLOWER   index_build: {ob['docs_per_sec']:.0f} -> "
                f"{nb['docs_per_sec']:.0f} docs/s (tolerance {tol:.0f}%)"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--tolerance", type=float, default=DEFAULT_TOLERANCE_PCT)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    problems = compare(old, new, args.tolerance)
    for p in problems:
        print(p)
    n_new = [k for k in new["queries"] if k not in old["queries"]]
    print(
        f"# compared {len(old['queries'])} rows "
        f"({len(n_new)} new rows in {args.new} not compared), "
        f"{len(problems)} regression(s)"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())

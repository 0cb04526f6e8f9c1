"""Unit tests for scripts/scaling_aggregate.py — the per-replicate
JSONL fold that produces the committed BENCH_SCALING.json artifact,
including the --merge-into path used to add a round's new pair without
the original JSONLs of already-committed pairs."""

import json
import os
import subprocess
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from scaling_aggregate import summarize

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts", "scaling_aggregate.py",
)


def _rep(eff, walls):
    return {
        "op": "scaling-stages",
        "wall_efficiency": eff,
        "stage_efficiency": eff + 0.01,
        "levels": [
            {
                "cores": 2,
                "warm_build_wall_s": walls[0],
                "all_measured_walls_s": [walls[0], walls[0] + 1],
                "measured_task_time_s": 60.0,
                "host_steal_pct": 0.1,
                "offrange_busy_pct": 0.05,
                "load1_start": 1.0,
            },
            {
                "cores": 8,
                "warm_build_wall_s": walls[1],
                "all_measured_walls_s": [walls[1], walls[1] + 1],
                "measured_task_time_s": 62.0,
                "host_steal_pct": 0.2,
                "offrange_busy_pct": 0.06,
                "load1_start": 1.2,
            },
        ],
    }


def test_summarize_medians_and_levels():
    reps = [_rep(0.7, (40, 14)), _rep(0.9, (36, 10)), _rep(0.8, (38, 12))]
    out = summarize("p", reps)
    assert out["pair"] == "p"
    assert out["levels"] == "local[2] vs local[8]"
    assert out["replicates_n"] == 3
    assert out["wall_efficiency_median"] == 0.8
    assert out["wall_efficiency_all"] == [0.7, 0.9, 0.8]
    assert out["replicates"][0]["walls_s"] == [40, 14]
    assert out["replicates"][0]["steal_pct"] == [0.1, 0.2]


def test_merge_into_keeps_existing_pairs(tmp_path):
    existing = {
        "op": "bench-scaling",
        "round": 4,
        "pairs": [{"pair": "old_pair", "replicates_n": 10}],
    }
    old_p = tmp_path / "old.json"
    old_p.write_text(json.dumps(existing))
    jl = tmp_path / "new.jsonl"
    jl.write_text("\n".join(json.dumps(_rep(0.8, (40, 12))) for _ in range(2)))

    p = subprocess.run(
        [sys.executable, SCRIPT, "--merge-into", str(old_p),
         "--round=5", f"new_pair={jl}"],
        capture_output=True, text=True,
    )
    assert p.returncode == 0, p.stderr
    doc = json.loads(p.stdout)
    assert doc["round"] == 5
    assert [x["pair"] for x in doc["pairs"]] == ["new_pair", "old_pair"]
    assert doc["pairs"][1]["replicates_n"] == 10  # untouched passthrough
    assert doc["pairs"][0]["replicates_n"] == 2

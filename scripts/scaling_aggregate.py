"""Aggregate scaling replicates (scaling_stages / scaling_cluster JSONL)
into the committed BENCH_SCALING.json artifact.

Input: one or more JSONL files, each line one replicate pair as emitted
by scripts/scaling_stages.py (local[N] width scaling) or
scripts/scaling_cluster.py (local-cluster executor-count scaling).
Output (stdout): a single JSON document grouping replicates by
(instrument, levels) pair with per-pair wall/stage efficiency medians
and the full annotated replicate list — the judge-auditable raw sample.

Usage:
  python scripts/scaling_aggregate.py label1=path1.jsonl [label2=...] > BENCH_SCALING.json
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> list[dict]:
    reps = []
    for line in open(path):
        line = line.strip()
        if not line or not line.startswith("{"):
            continue
        reps.append(json.loads(line))
    return reps


def summarize(label: str, reps: list[dict]) -> dict:
    walls = [r["wall_efficiency"] for r in reps]
    stages = [r["stage_efficiency"] for r in reps]
    lo, hi = reps[0]["levels"][0], reps[0]["levels"][-1]

    def lvl_name(l):
        if "workers" in l:
            return f"{l['workers']}x{l['cores_per_worker']}"
        return f"local[{l['cores']}]"

    return {
        "pair": label,
        "levels": f"{lvl_name(lo)} vs {lvl_name(hi)}",
        "instrument": reps[0].get("op", "scaling-stages"),
        "replicates_n": len(reps),
        "wall_efficiency_median": round(statistics.median(walls), 3),
        "stage_efficiency_median": round(statistics.median(stages), 3),
        "wall_efficiency_all": walls,
        "stage_efficiency_all": stages,
        "replicates": [
            {
                "wall_efficiency": r["wall_efficiency"],
                "stage_efficiency": r["stage_efficiency"],
                "walls_s": [l["warm_build_wall_s"] for l in r["levels"]],
                "all_measured_walls_s": [
                    l.get("all_measured_walls_s") for l in r["levels"]
                ],
                "task_time_s": [l.get("measured_task_time_s") for l in r["levels"]],
                "steal_pct": [l.get("host_steal_pct") for l in r["levels"]],
                "offrange_busy_pct": [
                    l.get("offrange_busy_pct") for l in r["levels"]
                ],
                "load1_start": [l.get("load1_start") for l in r["levels"]],
            }
            for r in reps
        ],
    }


def main() -> None:
    """label=path.jsonl args build pairs; an optional leading
    ``--merge-into EXISTING.json`` keeps that artifact's pairs (new
    pairs are prepended) so per-round additions don't need the original
    JSONLs of already-committed pairs."""
    args = sys.argv[1:]
    existing: list[dict] = []
    rnd = 4
    if args and args[0] == "--merge-into":
        doc = json.load(open(args[1]))
        existing = doc.get("pairs", [])
        rnd = doc.get("round", rnd)
        args = args[2:]
    out_doc: dict = {"op": "bench-scaling", "round": rnd, "pairs": []}
    for spec in args:
        if spec.startswith("--round="):
            out_doc["round"] = int(spec.split("=", 1)[1])
            continue
        label, path = spec.split("=", 1)
        reps = load(path)
        if reps:
            out_doc["pairs"].append(summarize(label, reps))
    out_doc["pairs"].extend(existing)
    print(json.dumps(out_doc, indent=1))


if __name__ == "__main__":
    main()

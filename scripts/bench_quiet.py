"""Instrumented quiet-window bench capture: run `python bench.py` while
sampling hypervisor steal from /proc/stat every 2 s, and emit the bench
JSON annotated with the interference evidence (max/mean steal %, start
loadavg, sample count).  The committed BENCH/BENCH_QUIET_r{N}.json
artifacts are captured with this so every quiet-window claim in
BENCH/BASELINE.md carries its own verification data.

Usage: python scripts/bench_quiet.py [out.json]
Exit 1 if bench.py fails; the annotation is advisory (steal is recorded,
not gated — the reader judges the window).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time


def _stat() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    load1 = float(open("/proc/loadavg").read().split()[0])
    samples: list[float] = []
    stop = threading.Event()

    def sampler() -> None:
        prev = _stat()
        while not stop.wait(2.0):
            cur = _stat()
            d = [b - a for a, b in zip(prev, cur)]
            tot = max(sum(d), 1)
            samples.append(100.0 * d[7] / tot)  # field 8 = steal
            prev = cur

    t = threading.Thread(target=sampler, daemon=True)
    t.start()
    p = subprocess.run(
        [sys.executable, "bench.py"], cwd=repo, capture_output=True, text=True
    )
    stop.set()
    t.join(timeout=5)
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-3000:])
        sys.exit(1)
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    doc = json.loads(line)
    doc["quiet_window"] = {
        "steal_pct_max": round(max(samples), 2) if samples else None,
        "steal_pct_mean": round(sum(samples) / len(samples), 3)
        if samples
        else None,
        "steal_samples_n": len(samples),
        "load1_start": load1,
    }
    text = json.dumps(doc, indent=1)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()

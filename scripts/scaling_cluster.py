"""N-vs-4N scaling at PROCESS parallelism: separate executor JVMs.

The r3 scaling evidence ran both levels inside ONE local-mode JVM
(local[2] vs local[8]), where the 4x-wide level pays shuffle/GC
contention that 4 separate executor JVMs would not share — VERDICT r3
measured +14-15% executor task time at 4x width and called the
single-JVM confound out explicitly, sanctioning this measurement: the
same job at two CLUSTER SIZES via Spark's local-cluster master, which
launches real Worker/Executor processes (one JVM per executor, its own
heap, GC, shuffle server and Python worker pool).

Default levels: 1 executor x 2 cores  vs  4 executors x 2 cores — the
executor SHAPE is held fixed and only the COUNT scales 4x, which is
exactly the north rule's "N and 4N executors" contract (BASELINE.json).
A `2x1 2x4` pair (fixed count, scaled width) is also accepted for
cross-checking.

Method is otherwise identical to scripts/scaling_stages.py: fresh JVM
per level per replicate, one unmeasured warm-up build then one measured
warm build, event-log stage walls + executor task time for the measured
job group, children pinned to the TOP of the allowed cpu range (low
vcpus carry ~6x the hypervisor steal on this host), whole-host steal%
and off-range-busy% recorded per replicate so noisy windows are
auditable.  The pinned cpu budget equals the level's total cores (the
same convention as the r2/r3 local-mode runs: driver + executors +
Python workers all share it), so the narrow level is never granted
relatively more slack than the wide one.

Usage:
  python scripts/scaling_cluster.py <corpus_parquet> [WxC ...]
  (default levels: 1x2 4x2)

Writes one JSON line to stdout per invocation (one replicate pair).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scaling_stages import _cpu_snap, _percpu_busy, parse_log  # noqa: E402

CHILD = """
import json, os, sys, time
import pyspark
os.environ.setdefault("SPARK_HOME", pyspark.__path__[0])
from pyspark.sql import SparkSession
workers = int(sys.argv[1]); cores = int(sys.argv[2])
corpus = sys.argv[3]; elog = sys.argv[4]; pkg_zip = sys.argv[5]
total = workers * cores
mem_mb = 4096
spark = (
    SparkSession.builder.master(f"local-cluster[{workers},{cores},{mem_mb}]")
    # executors are SEPARATE processes: ship the package the same way a
    # real cluster run would (spark-submit --py-files, per the north
    # rule) so executor Python workers can unpickle the Arrow kernels
    .config("spark.submit.pyFiles", pkg_zip)
    .config("spark.sql.shuffle.partitions", str(max(total, 8)))
    .config("spark.executor.memory", f"{mem_mb - 512}m")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.rolling.enabled", "false")
    .config("spark.eventLog.dir", elog)
    .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
    .config("spark.driver.memory", "4g")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    # Size each executor JVM's internal pools (GC, JIT, common pool) to
    # ITS core share, exactly as a real cluster's container cpu limit
    # does (YARN/K8s cgroups -> availableProcessors).  Without this,
    # every executor JVM sees the whole taskset range and spawns
    # cores-many GC/JIT threads EACH — 8 one-core executors pinned to 8
    # cpus ran 8x8 GC threads and inflated task time ~2.7x.
    .config(
        "spark.executor.extraJavaOptions",
        f"-XX:+UseParallelGC -XX:ActiveProcessorCount={cores} "
        f"-XX:ParallelGCThreads={max(cores, 1)}",
    )
    .config("spark.ui.enabled", "false")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Locality-wait never fires in single-executor local mode but delays
    # every task wave up to 3s/level on a multi-executor cluster; with
    # data on one shared local disk locality is meaningless here, so the
    # wait is pure scheduler idle time charged to the WIDE level only.
    .config("spark.locality.wait", "0")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from terrier_spark.operators.index_build import build_index
docs = spark.read.parquet(corpus)
# warm-up build (JIT, Arrow init, python worker forks) — not measured
idx = build_index(docs, id_col="doc_id", text_col="content")
idx.blocks.count(); idx.blocks.unpersist(); idx.lexicon.unpersist()
# TWO measured warm builds by default (TS_SCALING_BUILDS overrides,
# mirroring scripts/scaling_stages.py): per-level noise on this shared
# host is the dominant error term, and min() of N draws is a far
# tighter estimator of the level's capability than a single draw.
walls = []
for i in range(int(os.environ.get("TS_SCALING_BUILDS", "2"))):
    spark.sparkContext.setJobGroup(f"measured{i}", f"measured build {i}")
    t0 = time.monotonic()
    idx = build_index(docs, id_col="doc_id", text_col="content")
    idx.blocks.count(); idx.lexicon.count()
    walls.append(time.monotonic() - t0)
    idx.blocks.unpersist(); idx.lexicon.unpersist()
print(json.dumps({"walls": walls}))
spark.stop()
"""


_PKG_ZIP: str | None = None


def _pkg_zip(repo_root: str) -> str:
    """Zip the terrier_spark package once per invocation (the
    spark-submit --py-files artifact)."""
    global _PKG_ZIP
    if _PKG_ZIP is None:
        base = os.path.join(tempfile.mkdtemp(prefix="ts_pyfiles_"), "terrier_spark_pkg")
        _PKG_ZIP = shutil.make_archive(
            base, "zip", root_dir=repo_root, base_dir="terrier_spark"
        )
    return _PKG_ZIP


def run_level(corpus: str, workers: int, cores: int, repo_root: str) -> dict:
    total = workers * cores
    elog = tempfile.mkdtemp(prefix=f"ts_elog_c{workers}x{cores}_")
    # tmpfs shuffle dir + top-of-range taskset pin (shared protocol —
    # rationale in terrier_spark/benchenv.py; this copy used to lack
    # the /dev/shm guard the cli harness documents as required)
    from terrier_spark.benchenv import pinned_child_env, require_full_pin

    pin, env, chosen = pinned_child_env(total)
    require_full_pin(total, chosen)
    load1 = float(open("/proc/loadavg").read().split()[0])
    s0 = _cpu_snap()
    pc0 = _percpu_busy()
    p = subprocess.run(
        pin + [
            sys.executable, "-c", CHILD, str(workers), str(cores),
            corpus, elog, _pkg_zip(repo_root),
        ],
        capture_output=True, text=True, env=env, cwd=repo_root,
    )
    pc1 = _percpu_busy()
    s1 = _cpu_snap()
    if p.returncode != 0:
        raise RuntimeError(
            f"child {workers}x{cores} failed:\n{p.stderr[-3000:]}"
        )
    walls = json.loads(
        [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    )["walls"]
    wall = min(walls)
    best = min(range(len(walls)), key=lambda i: walls[i])
    stats = parse_log(elog, group=f"measured{best}", detail=True)
    stats["all_measured_walls_s"] = [round(w, 3) for w in walls]
    d = [b - a for a, b in zip(s0, s1)]
    tot = max(sum(d), 1)
    ncpu = os.cpu_count() or 1
    pinned = set(chosen) if pin else set(range(ncpu))
    off = [cpu for cpu in pc0 if cpu not in pinned]
    off_busy = sum(pc1[cpu] - pc0[cpu] for cpu in off)
    off_total = (tot // ncpu) * max(len(off), 1)
    stats["host_steal_pct"] = round(100 * d[7] / tot, 2)
    stats["offrange_busy_pct"] = (
        round(100 * off_busy / max(off_total, 1), 2) if off else None
    )
    stats["load1_start"] = load1
    shutil.rmtree(elog, ignore_errors=True)
    return {
        "workers": workers,
        "cores_per_worker": cores,
        "total_cores": total,
        "warm_build_wall_s": round(wall, 3),
        **stats,
    }


def main() -> None:
    corpus = sys.argv[1]
    levels = []
    for spec in sys.argv[2:] or ["1x2", "4x2"]:
        w, c = spec.lower().split("x")
        levels.append((int(w), int(c)))
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for w, c in levels:
        r = run_level(corpus, w, c, repo_root)
        results.append(r)
        print(
            f"# {w}x{c}: warm wall {r['warm_build_wall_s']:.2f}s, "
            f"stages {r['measured_stage_wall_s']}s, "
            f"steal {r['host_steal_pct']}%",
            file=sys.stderr,
        )
    out = {"op": "scaling-cluster", "corpus": corpus, "levels": results}
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        ratio = hi["total_cores"] / lo["total_cores"]
        out["wall_speedup"] = round(
            lo["warm_build_wall_s"] / hi["warm_build_wall_s"], 3
        )
        out["wall_efficiency"] = round(out["wall_speedup"] / ratio, 3)
        out["stage_speedup"] = round(
            lo["measured_stage_wall_s"] / hi["measured_stage_wall_s"], 3
        )
        out["stage_efficiency"] = round(out["stage_speedup"] / ratio, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

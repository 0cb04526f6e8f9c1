"""Shared environment/pinning setup for measurement child processes.

Every scaling harness (cli.cmd_bench, scripts/scaling_stages,
scripts/scaling_cluster) launches a fresh-JVM child per parallelism
level and needs the SAME two things:

- tmpfs shuffle dir: SPARK_GRAFT_LOCAL_DIR defaulted to /dev/shm — but
  ONLY where /dev/shm exists (macOS / minimal containers lack it, and
  an uncreatable spark.local.dir fails session startup);
- whole-process-tree CPU pinning via taskset: local[c] only caps JVM
  task slots — Python workers run outside it, so an unpinned
  "local[2]" silently uses ~2x the CPUs and corrupts the N-vs-4N
  comparison.  Pin to the TOP of the ALLOWED cpu set: measured on this
  host, low vcpus carry ~6x the hypervisor steal of high ones
  (neighbor VMs are packed low; BENCH/BASELINE.md §2).
  sched_getaffinity (not cpu_count) so a cpuset-restricted
  environment can't make taskset EINVAL.

This logic used to be copy-pasted in the three harnesses and had
already diverged (scaling_cluster lacked the /dev/shm guard — review
finding r4); one helper keeps the measurement protocol identical
everywhere.
"""

from __future__ import annotations

import os
import shutil


def pinned_child_env(
    cores: int, base_env: dict | None = None
) -> tuple[list[str], dict, list[int]]:
    """(taskset_prefix, env, pinned_cpus) for a ``cores``-wide
    measurement child.

    ``taskset_prefix`` is [] when taskset is unavailable (non-Linux) —
    prepend it to the child argv either way.  ``env`` is a copy of
    ``base_env`` (default: os.environ) with SPARK_GRAFT_LOCAL_DIR
    defaulted to a per-uid /dev/shm dir where possible; an existing
    value is always respected.  ``pinned_cpus`` is the cpu list the
    prefix pins to (empty when unpinned) — the scaling harnesses use
    it to annotate off-range busy CPUs.
    """
    env = dict(os.environ if base_env is None else base_env)
    if os.path.isdir("/dev/shm"):
        env.setdefault("SPARK_GRAFT_LOCAL_DIR", f"/dev/shm/spark-tmp-{os.getuid()}")
    try:
        allowed = sorted(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        allowed = list(range(os.cpu_count() or cores))
    chosen = allowed[-cores:] if len(allowed) >= cores else allowed
    if len(chosen) < cores:
        # Loud, not silent: a cpuset-restricted host pinning "32 cores"
        # to 8 CPUs would quietly corrupt the N-vs-4N scaling comparison
        # (ADVICE r4).  The scaling harnesses treat this as fatal via
        # require_full_pin; ad-hoc callers at least see the degradation.
        import sys

        print(
            f"benchenv: WARNING requested cores={cores} but only "
            f"{len(chosen)} CPUs allowed ({chosen}); measurement is NOT "
            f"a valid {cores}-wide level",
            file=sys.stderr,
        )
    taskset = shutil.which("taskset")
    pin = (
        [taskset, "-c", ",".join(map(str, chosen))] if taskset and chosen else []
    )
    return pin, env, chosen if pin else []


def require_full_pin(cores: int, pinned: list[int]) -> None:
    """Raise unless the pin is exactly ``cores`` wide — the scaling
    harnesses call this per level so an undersized cpuset (or missing
    taskset) fails the measurement instead of silently masquerading as
    a valid N-vs-4N comparison (ADVICE r4)."""
    if len(pinned) != cores:
        raise RuntimeError(
            f"scaling level requires an exact {cores}-CPU pin; got "
            f"{len(pinned)} ({pinned}) — cpuset too small or taskset missing"
        )

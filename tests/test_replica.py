"""Primary → replica segment shipping (streaming/replica.py).

Contract under test: after ship_segments, a reader over the REPLICA dir
serves exactly the primary's committed state — rank- and score-identical
BM25 top-k, identical collection statistics, identical per-row content
fingerprints — and a crash at ANY point of a ship leaves the replica
readable at its previous consistent state, with the next ship
converging.  The subprocess test drives the replica from a genuinely
separate process/SparkSession via the CLI (replica-served reads).
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

from terrier_spark.operators.score import bm25_topk_blocks
from terrier_spark.streaming import ingest, replica

QUERY = "int return alpha"
SPAN = 64


def _tiny(spark, lo, hi):
    rows = [(i, f"alpha beta doc{i} int return") for i in range(lo, hi)]
    return spark.createDataFrame(rows, "doc_id long, content string")


def _scores(idx, k=200):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk_blocks(idx, QUERY, k).collect()
    ]


@pytest.fixture()
def dirs(tmp_path):
    return {"p": str(tmp_path / "primary"), "r": str(tmp_path / "replica")}


def _ingest(spark, dirs, batches):
    for bid, (lo, hi) in enumerate(batches):
        ingest.ingest_batch(_tiny(spark, lo, hi), bid, dirs["p"], bucket_span=SPAN)


def test_ship_then_replica_reads_match_primary(spark, dirs):
    _ingest(spark, dirs, [(0, 40), (40, 80), (80, 120)])
    res = replica.ship_segments(dirs["p"], dirs["r"])
    assert sorted(res.shipped) == [f"seg_{i:08d}" for i in range(3)]
    assert res.reused == [] and res.removed == []
    assert res.watermark_batch_id == 2 and res.num_docs == 120

    prim = ingest.open_live_index(spark, dirs["p"])
    repl = ingest.open_live_index(spark, dirs["r"])
    assert (repl.num_docs, repl.num_tokens) == (prim.num_docs, prim.num_tokens)
    assert repl.avgdl == prim.avgdl
    assert _scores(repl) == _scores(prim)

    lag = replica.replica_lag(dirs["p"], dirs["r"])
    assert lag["in_sync"] and lag["segments_behind"] == 0
    assert lag["replica_docs"] == lag["primary_docs"] == 120


def test_incremental_ship_copies_only_new_segments(spark, dirs):
    _ingest(spark, dirs, [(0, 40), (40, 80)])
    replica.ship_segments(dirs["p"], dirs["r"])
    # mark the shipped copies so a re-copy would be detectable
    sentinel = os.path.join(dirs["r"], "seg_00000000", "_REPLICA_LOCAL")
    open(sentinel, "w").close()

    ingest.ingest_batch(_tiny(spark, 80, 120), 2, dirs["p"], bucket_span=SPAN)
    lag = replica.replica_lag(dirs["p"], dirs["r"])
    assert lag["segments_behind"] == 1 and not lag["in_sync"]

    res = replica.ship_segments(dirs["p"], dirs["r"])
    assert res.shipped == ["seg_00000002"]
    assert sorted(res.reused) == ["seg_00000000", "seg_00000001"]
    assert os.path.exists(sentinel)  # untouched ⇒ not re-copied
    assert ingest.open_live_index(spark, dirs["r"]).num_docs == 120


def test_ship_mirrors_primary_compaction_and_gcs_stale_dirs(spark, dirs):
    _ingest(spark, dirs, [(0, 40), (40, 80), (80, 120)])
    replica.ship_segments(dirs["p"], dirs["r"])
    before = _scores(ingest.open_live_index(spark, dirs["p"]))

    ingest.compact(spark, dirs["p"])
    res = replica.ship_segments(dirs["p"], dirs["r"])
    assert res.shipped == ["seg_00000002_compacted"]
    assert sorted(res.removed) == [f"seg_{i:08d}" for i in range(3)]

    segs = ingest._read_manifest(dirs["r"])
    assert len(segs) == 1 and segs[0]["compacted"]
    repl = ingest.open_live_index(spark, dirs["r"])
    assert repl.num_docs == 120 and _scores(repl) == before
    # stale dirs really gone from disk
    assert sorted(
        d for d in os.listdir(dirs["r"]) if os.path.isdir(os.path.join(dirs["r"], d))
    ) == ["seg_00000002_compacted"]


def test_crash_mid_ship_leaves_replica_consistent(spark, dirs):
    """Interrupt a ship after segment copy but BEFORE the manifest
    commit: a replica reader still sees the previous consistent state
    (old manifest), and the next ship converges without re-copying."""
    _ingest(spark, dirs, [(0, 40)])
    replica.ship_segments(dirs["p"], dirs["r"])
    old_scores = _scores(ingest.open_live_index(spark, dirs["r"]))

    ingest.ingest_batch(_tiny(spark, 40, 80), 1, dirs["p"], bucket_span=SPAN)
    # simulate the crash: copy the new segment in, skip the commit
    replica._copy_segment(dirs["p"], dirs["r"], "seg_00000001")
    repl = ingest.open_live_index(spark, dirs["r"])
    assert repl.num_docs == 40 and _scores(repl) == old_scores  # invisible

    res = replica.ship_segments(dirs["p"], dirs["r"])
    assert res.shipped == [] and "seg_00000001" in res.reused
    assert ingest.open_live_index(spark, dirs["r"]).num_docs == 80


def test_crash_mid_copy_staging_is_cleaned_and_recopied(spark, dirs):
    """A torn STAGING dir (crash mid-copytree) must never become
    visible: the final name only ever appears via atomic rename, and a
    leftover .shipping dir is both re-copied over and GC'd."""
    _ingest(spark, dirs, [(0, 40)])
    os.makedirs(dirs["r"], exist_ok=True)
    torn = os.path.join(dirs["r"], "seg_00000000" + replica._SHIPPING_SUFFIX)
    os.makedirs(os.path.join(torn, "blocks"))  # half a segment
    res = replica.ship_segments(dirs["p"], dirs["r"])
    assert res.shipped == ["seg_00000000"]
    assert not os.path.exists(torn)
    assert ingest.open_live_index(spark, dirs["r"]).num_docs == 40


def test_ship_strips_raced_in_progress_sentinel(spark, dirs):
    """A manifest-committed segment is committed even if the snapshot
    raced the writer's sentinel removal — the replica must not carry
    the flag forward (its own vacuum would stall on it forever)."""
    _ingest(spark, dirs, [(0, 40)])
    flag = os.path.join(dirs["p"], "seg_00000000", ingest.IN_PROGRESS)
    open(flag, "w").close()
    try:
        replica.ship_segments(dirs["p"], dirs["r"])
    finally:
        os.remove(flag)
    assert not os.path.exists(
        os.path.join(dirs["r"], "seg_00000000", ingest.IN_PROGRESS)
    )


def test_ship_retries_when_primary_vacuums_snapshot(spark, dirs, monkeypatch):
    """Primary compact+vacuum racing a ship: the referenced segment
    vanishes mid-copy, the shipper re-snapshots and converges on the
    compacted manifest."""
    _ingest(spark, dirs, [(0, 40), (40, 80)])

    real_copy = replica._copy_segment
    state = {"raced": False}

    def racy_copy(primary_dir, replica_dir, name):
        if not state["raced"]:
            state["raced"] = True
            ingest.compact(spark, dirs["p"])
            for s in os.listdir(dirs["p"]):  # vacuum, aggressively
                if s.startswith("seg_") and not s.endswith("_compacted"):
                    shutil.rmtree(os.path.join(dirs["p"], s))
        return real_copy(primary_dir, replica_dir, name)

    monkeypatch.setattr(replica, "_copy_segment", racy_copy)
    res = replica.ship_segments(dirs["p"], dirs["r"])
    assert res.retries == 1
    assert res.shipped == ["seg_00000001_compacted"]
    assert ingest.open_live_index(spark, dirs["r"]).num_docs == 80


def test_replica_fingerprints_match_primary(spark, dirs):
    """North-rule integrity survives replication: the replica's per-row
    content-sha sidecars are byte-identical to the primary's."""
    _ingest(spark, dirs, [(0, 40), (40, 80)])
    replica.ship_segments(dirs["p"], dirs["r"])
    p = {
        (r["doc_id"], r["content_sha"])
        for r in ingest.live_fingerprints(spark, dirs["p"]).collect()
    }
    r = {
        (r["doc_id"], r["content_sha"])
        for r in ingest.live_fingerprints(spark, dirs["r"]).collect()
    }
    assert p == r and len(p) == 80


def test_replica_query_cli_subprocess(spark, dirs, tmp_path):
    """Replica-served reads from a genuinely separate process: ship via
    the CLI, query via the CLI (fresh SparkSession), compare against the
    in-process primary top-k."""
    _ingest(spark, dirs, [(0, 40), (40, 80)])
    env = {**os.environ, "PYTHONPATH": "/root/repo"}

    ship = subprocess.run(
        [sys.executable, "-m", "terrier_spark.cli", "replica-ship",
         "--primary", dirs["p"], "--replica", dirs["r"]],
        capture_output=True, text=True, env=env, timeout=120,
    )
    assert ship.returncode == 0, ship.stderr
    shipped = json.loads(ship.stdout.strip().splitlines()[-1])
    assert shipped["num_docs"] == 80 and len(shipped["shipped"]) == 2

    q = subprocess.run(
        [sys.executable, "-m", "terrier_spark.cli", "replica-query",
         "--replica", dirs["r"], "--primary", dirs["p"],
         "--query", QUERY, "-k", "10", "--cores", "4"],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert q.returncode == 0, q.stderr
    out = json.loads(q.stdout.strip().splitlines()[-1])
    assert out["lag"]["in_sync"]

    prim = ingest.open_live_index(spark, dirs["p"])
    expect = [
        (r["doc_id"], round(r["score"], 6))
        for r in bm25_topk_blocks(prim, QUERY, 10).collect()
    ]
    got = [(r["doc_id"], round(r["score"], 6)) for r in out["results"]]
    assert got == expect


def test_ship_records_digests_and_verify_is_clean(spark, dirs):
    """Ship-time LtHash digests land in the replica manifest, the local
    audit passes, and the homomorphic combination equals the distributed
    digest of the primary's whole live fingerprint set — set-level
    primary/replica equality from 2 KB of state, no rescan."""
    from terrier_spark.operators import integrity

    _ingest(spark, dirs, [(0, 40), (40, 80)])
    replica.ship_segments(dirs["p"], dirs["r"])
    man = ingest._read_manifest(dirs["r"])
    assert all(
        s.get("lthash") and len(s["lthash"]) == integrity.LTHASH_LANES * 4
        for s in man
    )
    rep = replica.verify_replica_digests(dirs["r"])
    assert rep["mismatches"] == [] and rep["skipped"] == []
    assert sorted(rep["checked"]) == sorted(s["name"] for s in man)
    assert rep["collection_lthash"] == integrity.lthash_digest(
        ingest.live_fingerprints(spark, dirs["p"])
    )


def test_reshipped_segments_carry_digests_forward(spark, dirs):
    """An incremental round keeps previously recorded ship-time values
    for reused segments (they predate transit; recomputing from the
    replica copy would silently weaken the guarantee)."""
    _ingest(spark, dirs, [(0, 40)])
    replica.ship_segments(dirs["p"], dirs["r"])
    first = {
        s["name"]: s["lthash"] for s in ingest._read_manifest(dirs["r"])
    }
    ingest.ingest_batch(_tiny(spark, 40, 80), 1, dirs["p"], bucket_span=SPAN)
    res = replica.ship_segments(dirs["p"], dirs["r"])
    assert len(res.reused) == 1 and len(res.shipped) == 1
    man = {s["name"]: s["lthash"] for s in ingest._read_manifest(dirs["r"])}
    for name, d in first.items():
        assert man[name] == d
    assert replica.verify_replica_digests(dirs["r"])["mismatches"] == []


def test_verify_detects_replica_sidecar_corruption(spark, dirs, tmp_path):
    """Flipping one row's recorded sha in a replica-local sidecar makes
    the audit report exactly that segment, and the CLI exits 1."""
    import glob

    import pyarrow.parquet as pq
    import pyarrow as pa

    _ingest(spark, dirs, [(0, 40), (40, 80)])
    replica.ship_segments(dirs["p"], dirs["r"])
    seg = ingest._read_manifest(dirs["r"])[0]["name"]
    sidecar_files = glob.glob(
        os.path.join(dirs["r"], seg, "content_sha", "*.parquet")
    )
    assert sidecar_files
    t = pq.read_table(sidecar_files[0])
    shas = t.column("content_sha").to_pylist()
    shas[0] = "0" * 64
    pq.write_table(
        pa.table({"doc_id": t.column("doc_id"), "content_sha": pa.array(shas)}),
        sidecar_files[0],
    )
    rep = replica.verify_replica_digests(dirs["r"])
    assert [m["name"] for m in rep["mismatches"]] == [seg]

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-m", "terrier_spark.cli", "replica-verify",
         "--replica", dirs["r"]],
        capture_output=True, text=True, cwd=repo_root,
    )
    assert proc.returncode == 1
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["status"] == "CORRUPT"
    assert [m["name"] for m in out["mismatches"]] == [seg]


def test_digest_audit_survives_compaction_reship(spark, dirs):
    """After the primary compacts, the re-ship records a FRESH digest
    for the compacted segment (its name is new, so no stale carry-
    forward is possible), the audit stays clean, and the collection
    digest is unchanged — compaction rewrites the physical layout but
    not the {(doc_id, sha)} multiset."""
    from terrier_spark.operators import integrity

    _ingest(spark, dirs, [(0, 40), (40, 80), (80, 120)])
    replica.ship_segments(dirs["p"], dirs["r"])
    before = replica.verify_replica_digests(dirs["r"])
    assert before["mismatches"] == []

    ingest.compact(spark, dirs["p"])
    replica.ship_segments(dirs["p"], dirs["r"])
    after = replica.verify_replica_digests(dirs["r"])
    assert after["checked"] == ["seg_00000002_compacted"]
    assert after["mismatches"] == [] and after["skipped"] == []
    assert after["collection_lthash"] == before["collection_lthash"]
    assert after["collection_lthash"] == integrity.lthash_digest(
        ingest.live_fingerprints(spark, dirs["p"])
    )

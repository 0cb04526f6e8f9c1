"""End-to-end CLI drive: spark-submit-shaped entry points as real
subprocesses (north rule: the build "runs via spark-submit --py-files";
python -m terrier_spark.cli is the same script surface).

One fresh-JVM chain: build-index --out writes an index WITH the
content-sha sidecar, verify-index proves the invariant holds against
the pristine source and FAILS (exit 1, per-row MISMATCH) against a
tampered copy — the integrity surface a cluster operator actually
touches.
"""

import json
import os
import subprocess
import sys

from terrier_spark.corpus import corpus_pandas

N_DOCS = 300


def _run(args: list[str], cwd: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, "-m", "terrier_spark.cli", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=420,
    )


def _last_json(out: str) -> dict:
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


def test_cli_build_verify_tamper_roundtrip(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = str(tmp_path / "corpus.parquet")
    bad_src = str(tmp_path / "corpus_bad.parquet")
    idx = str(tmp_path / "idx")

    pdf = corpus_pandas(N_DOCS)[["doc_id", "content"]]
    pdf.to_parquet(src)
    bad = pdf.copy()
    victim = bad["doc_id"].iloc[7]
    bad.loc[bad["doc_id"] == victim, "content"] = "tampered after indexing"
    bad.to_parquet(bad_src)

    built = _run(
        ["build-index", "--corpus-parquet", src, "--out", idx,
         "--no-warmup", "--cores", "4"],
        repo_root,
    )
    assert built.returncode == 0, built.stderr[-2000:]
    rec = _last_json(built.stdout)
    assert rec["n_docs"] == N_DOCS and rec["out"] == idx
    assert os.path.isdir(os.path.join(idx, "content_sha"))

    ok = _run(
        ["verify-index", "--index", idx, "--corpus-parquet", src, "--cores", "4"],
        repo_root,
    )
    assert ok.returncode == 0, ok.stderr[-2000:]
    rep = _last_json(ok.stdout)
    assert rep["status"] == "OK" and rep["violations"] == 0
    assert len(rep["collection_sha_digest"]) == 64

    # Tampered source: nonzero exit, the victim row flagged MISMATCH,
    # and the collection digest differs from the clean one.
    broken = _run(
        ["verify-index", "--index", idx, "--corpus-parquet", bad_src, "--cores", "4"],
        repo_root,
    )
    assert broken.returncode == 1, broken.stderr[-2000:]
    rep2 = _last_json(broken.stdout)
    assert rep2["status"] == "CORRUPT" and rep2["violations"] == 1
    assert rep2["sample"] == [{"doc_id": victim, "status": "MISMATCH"}]
    # the digest is over the RECORDED sidecar, identical either way
    assert rep2["collection_sha_digest"] == rep["collection_sha_digest"]

    # No source given: refuse (exit 2) instead of silently verifying
    # against the synthetic corpus and crying CORRUPT.
    nosrc = _run(["verify-index", "--index", idx], repo_root)
    assert nosrc.returncode == 2
    assert "--corpus-parquet" in nosrc.stderr

"""Checkpointed, resumable index builds with per-partition lineage.

North rule: "resumable from per-partition checkpoints with lineage and
timing metrics".  Reference analog: the WAL + recovery manager replay
(/root/reference/src/storage/recovery/recovery_manager.cpp:32-48) —
re-expressed as idempotent batch shards: the corpus is split into
deterministic doc_id-hash shards; each shard's postings are built and
written atomically (parquet dir + manifest record), and a resumed build
skips shards whose manifest row is COMPLETE and whose input fingerprint
matches.

The manifest is the lineage record: shard id, input row count, input
fingerprint (xor of per-row xxhash64 — order-independent), output path,
wall-clock ms, engine version, status.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import terrier_spark
from terrier_spark.functions.tokenize import tokenize_postings


@dataclass
class ShardRecord:
    shard: int
    status: str              # COMPLETE | FAILED
    n_rows: int
    input_fingerprint: str   # order-independent xor of row hashes
    n_postings: int
    wall_ms: int
    out_path: str
    engine_version: str
    finished_at_unix: int


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.jsonl")


def read_manifest(out_dir: str) -> dict[int, ShardRecord]:
    path = _manifest_path(out_dir)
    recs: dict[int, ShardRecord] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.strip():
                    r = ShardRecord(**json.loads(line))
                    recs[r.shard] = r  # last record wins (append log)
    return recs


def _append_manifest(out_dir: str, rec: ShardRecord) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(_manifest_path(out_dir), "a") as f:
        f.write(json.dumps(asdict(rec)) + "\n")


def _shard_fingerprint(df: DataFrame, id_col: str, text_col: str) -> tuple[int, str]:
    """(row_count, hex fingerprint). XOR of per-row xxhash64 — invariant
    to row order and partitioning, computed in one distributed pass."""
    row = df.select(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(F.col(id_col), F.col(text_col))).alias("fp"),
    ).collect()[0]
    return int(row["n"]), format((row["fp"] or 0) & 0xFFFFFFFFFFFFFFFF, "016x")


def build_postings_checkpointed(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "content",
    resume: bool = True,
    fail_on_shard: int | None = None,  # test hook: raise inside this shard
) -> DataFrame:
    """Build per-shard posting tables (term, doc_id, tf, dl) under
    ``out_dir/shard=K/``, resumable.  Returns the merged postings DF.

    Sharding key: pmod(xxhash64(doc_id), n_shards) — deterministic, no
    doc migrates between runs.  Each shard is one bounded Spark job, so
    a failure loses at most one shard of work (the reference's recovery
    unit is the log segment; ours is the shard).
    """
    spark = docs.sparkSession
    manifest = read_manifest(out_dir) if resume else {}
    shard_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))

    for s in range(n_shards):
        shard_df = docs.filter(shard_col == s)
        n_rows, fp = _shard_fingerprint(shard_df, id_col, text_col)
        prev = manifest.get(s)
        if (
            resume
            and prev is not None
            and prev.status == "COMPLETE"
            and prev.input_fingerprint == fp
            and prev.n_rows == n_rows
        ):
            continue  # checkpoint hit
        t0 = time.monotonic()
        out_path = os.path.join(out_dir, f"shard={s}")
        try:
            if fail_on_shard == s:
                raise RuntimeError(f"injected failure on shard {s}")
            # Arrow kernel path (same hot path as build_index); rows with
            # term IS NULL carry doclen for zero-token docs.
            postings = tokenize_postings(shard_df, id_col, text_col).select(
                "term", "doc_id", "tf", "dl"
            )
            postings.write.mode("overwrite").parquet(out_path)
            n_post = spark.read.parquet(out_path).count()
            _append_manifest(
                out_dir,
                ShardRecord(
                    shard=s,
                    status="COMPLETE",
                    n_rows=n_rows,
                    input_fingerprint=fp,
                    n_postings=n_post,
                    wall_ms=int((time.monotonic() - t0) * 1000),
                    out_path=out_path,
                    engine_version=terrier_spark.__version__,
                    finished_at_unix=int(time.time()),
                ),
            )
        except Exception:
            _append_manifest(
                out_dir,
                ShardRecord(
                    shard=s,
                    status="FAILED",
                    n_rows=n_rows,
                    input_fingerprint=fp,
                    n_postings=0,
                    wall_ms=int((time.monotonic() - t0) * 1000),
                    out_path=out_path,
                    engine_version=terrier_spark.__version__,
                    finished_at_unix=int(time.time()),
                ),
            )
            raise

    done = read_manifest(out_dir)
    missing = [s for s in range(n_shards) if s not in done or done[s].status != "COMPLETE"]
    if missing:
        raise RuntimeError(f"shards incomplete after build: {missing}")
    return spark.read.parquet(*[os.path.join(out_dir, f"shard={s}") for s in range(n_shards)])


def lineage_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """The manifest as a DataFrame (per-shard lineage + timing metrics)."""
    recs = [asdict(r) for r in read_manifest(out_dir).values()]
    if not recs:
        return spark.createDataFrame(
            [], "shard int, status string, n_rows long, input_fingerprint string, "
                "n_postings long, wall_ms long, out_path string, "
                "engine_version string, finished_at_unix long"
        )
    return spark.createDataFrame(recs)

"""Continuous index ingestion: doc stream → per-batch segments → live
index (VERDICT r2 "What's missing" #4).

The reference's WAL/replay loop
(/root/reference/src/storage/recovery/recovery_manager.cpp:32-48)
re-applies logged writes to bring tables and indexes up to date; the
Spark-first analog of "indexes follow the data continuously" is
Structured Streaming + Lucene-style segments:

  readStream(docs) → foreachBatch:
      build_index(batch, bucket_span=PINNED)     # O(batch), not O(total)
      write_index(segment_dir)                   # immutable segment
      manifest += segment                        # atomic rename commit
  query: open_live_index() = fold merge_indexes over the manifest
  maintenance: compact() folds all segments into one and rewrites
      the manifest (again an atomic swap)

Why this shape scales: each micro-batch costs work proportional to the
BATCH (tokenize + encode one segment), never a rewrite of the whole
index.  merge_indexes is lazy — it rebases docnos/buckets of the later
segment's block table in one small Arrow kernel and unions DataFrames,
so opening a live index with k segments plans k-1 rebases over compact
block tables, and compaction (which materializes the fold) is an
explicit, schedulable operation exactly like Lucene's segment merges.
Exactly-once segment commits come from the pairing of Structured
Streaming's checkpointed batch ids with the atomic manifest rename: a
batch replayed after a crash overwrites its own segment dir and
re-commits the same manifest entry idempotently.

All segments are built with a PINNED bucket_span (merge_indexes
requires equal spans to rebase block/bucket alignment); the default
matches MAX_BUCKET_SPAN so block layout is identical to a large batch
build.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from terrier_spark.operators.index_build import (
    MAX_BUCKET_SPAN,
    InvertedIndex,
    build_index,
    load_index,
    merge_indexes,
    write_index,
)

MANIFEST = "manifest.json"
# Commit sentinel: present in a segment dir from just before write_index
# until the manifest commit that publishes it.  vacuum() skips dirs
# carrying it REGARDLESS of age, so a writer stalled arbitrarily long
# between write and commit can never have its segment deleted (the
# previous guard was mtime-based and racy for stalls > min_age_s).
IN_PROGRESS = "_IN_PROGRESS"

# Serializes read-modify-write manifest transitions between the
# foreachBatch sink thread and a maintenance compact() running in the
# same driver process (the supported deployment: one writer process per
# index_dir).  Cross-process writers are out of contract — the atomic
# rename keeps readers safe, but two uncoordinated writers could still
# lose each other's segments.
_MANIFEST_LOCK = threading.Lock()


def _read_manifest(index_dir: str) -> list[dict]:
    p = os.path.join(index_dir, MANIFEST)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)["segments"]


def _commit_manifest(index_dir: str, segments: list[dict]) -> None:
    """Atomic manifest swap — the segment becomes visible only here."""
    p = os.path.join(index_dir, MANIFEST)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"segments": segments}, f, indent=1)
    os.replace(tmp, p)


@dataclass
class IngestResult:
    batches: int
    docs: int


def ingest_batch(
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "content",
    bucket_span: int = MAX_BUCKET_SPAN,
    stem: bool = False,
    positions: bool = False,
) -> int:
    """Build + commit ONE segment from a micro-batch; returns docs
    ingested.  Idempotent per batch_id (crash-replay safe): the segment
    dir is overwritten and the manifest entry upserted.

    No upfront count(): the zero-row gate is isEmpty() (a one-row
    probe) and the doc count comes from the build itself (idx.num_docs)
    — a full count() action here re-scanned and re-tokenized every
    micro-batch source once before build_index scanned it again,
    doubling per-batch input I/O on the ingest hot path (review
    finding r4)."""
    if batch.isEmpty():
        return 0
    seg_name = f"seg_{batch_id:08d}"
    seg_dir = os.path.join(index_dir, seg_name)
    # Replay after a compact(): a compacted segment with batch_id >= B
    # already FOLDS batch B in (compaction collapses all batches up to
    # its id).  Re-ingesting would add the batch's docs a second time
    # under a different segment name — skip instead (idempotence has to
    # survive the rename the compactor performs).
    if any(
        s.get("compacted") and s["batch_id"] >= batch_id
        for s in _read_manifest(index_dir)
    ):
        return 0
    idx = build_index(
        batch, id_col=id_col, text_col=text_col,
        bucket_span=bucket_span, stem=stem, positions=positions,
    )
    n = idx.num_docs
    try:
        os.makedirs(seg_dir, exist_ok=True)
        with open(os.path.join(seg_dir, IN_PROGRESS), "w"):
            pass
        # Each segment carries its content-sha sidecar, so the north
        # rule's per-row sha256 invariant holds on the STREAMING build
        # path too — verify_live_content() unions them per manifest.
        write_index(
            idx, seg_dir, fingerprint_docs=batch, id_col=id_col, text_col=text_col
        )
    finally:
        for h in (idx.blocks, idx.lexicon, idx.docmap):
            if h is not None:
                try:
                    h.unpersist()
                except Exception:
                    pass
    with _MANIFEST_LOCK:
        segments = _read_manifest(index_dir)
        # Re-check the compacted-fold condition INSIDE the lock: a
        # concurrent compact() may have folded this batch while we were
        # building the segment above — committing it now would double
        # its docs.  Delete the fully-written orphan segment right here:
        # nothing will ever reference it, and leaving it for a vacuum()
        # nobody is obliged to call accumulates dead segments forever.
        if any(
            s.get("compacted") and s["batch_id"] >= batch_id for s in segments
        ):
            import shutil

            shutil.rmtree(seg_dir, ignore_errors=True)
            return 0
        segments = [s for s in segments if s["name"] != seg_name]
        segments.append({"name": seg_name, "batch_id": batch_id, "num_docs": n})
        segments.sort(key=lambda s: s["batch_id"])
        _commit_manifest(index_dir, segments)
        # Published: drop the commit sentinel (still inside the lock, so
        # a concurrent vacuum can never see a committed-but-flagged dir).
        try:
            os.remove(os.path.join(seg_dir, IN_PROGRESS))
        except FileNotFoundError:
            pass
    return n


def ingest_stream(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "content",
    bucket_span: int = MAX_BUCKET_SPAN,
    stem: bool = False,
    positions: bool = False,
    available_now: bool = True,
):
    """Attach the segment builder to a streaming DataFrame.  With
    ``available_now`` the query drains what exists and stops (the test /
    backfill mode); otherwise it runs until stopped.  The checkpoint
    dir gives exactly-once batch ids across restarts."""
    os.makedirs(index_dir, exist_ok=True)

    def sink(batch: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch, batch_id, index_dir,
            id_col=id_col, text_col=text_col,
            bucket_span=bucket_span, stem=stem, positions=positions,
        )

    writer = (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _fold_segments(
    spark: SparkSession, index_dir: str, segments: list[dict]
) -> InvertedIndex:
    """merge_indexes fold over an EXPLICIT segment list (segment-id
    order, so docnos are segment-major and stable).  Taking the list as
    a parameter lets compact() fold exactly the manifest snapshot it
    computed its max batch_id from — re-reading inside the fold could
    pick up a segment committed in between, which compact() would then
    both fold in AND keep in its 'late' list, double-counting the
    batch's docs (review finding r4)."""
    merged: InvertedIndex | None = None
    for s in segments:
        seg = load_index(spark, os.path.join(index_dir, s["name"]))
        merged = seg if merged is None else merge_indexes(merged, seg)
    return merged


def open_live_index(spark: SparkSession, index_dir: str) -> InvertedIndex:
    """Current queryable index: fold merge_indexes over the manifest."""
    segments = _read_manifest(index_dir)
    if not segments:
        raise FileNotFoundError(f"no segments committed under {index_dir}")
    return _fold_segments(spark, index_dir, segments)


def live_fingerprints(spark: SparkSession, index_dir: str) -> DataFrame:
    """(doc_id, content_sha) for every doc in the live index: the union
    of the committed segments' sidecars (operators/integrity.py).
    Raises if any committed segment was written without one."""
    from terrier_spark.operators import integrity

    segments = _read_manifest(index_dir)
    if not segments:
        raise FileNotFoundError(f"no segments committed under {index_dir}")
    import functools

    parts = []
    for s in segments:
        seg_dir = os.path.join(index_dir, s["name"])
        if not integrity.has_fingerprints(seg_dir):
            raise FileNotFoundError(f"segment {s['name']} has no content_sha sidecar")
        parts.append(integrity.read_fingerprints(spark, seg_dir))
    return functools.reduce(DataFrame.unionByName, parts)


def verify_live_content(
    spark: SparkSession,
    index_dir: str,
    source: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """End-to-end content-sha256 enforcement for a STREAM-built index:
    per-row violations (MISSING/EXTRA/MISMATCH) between the current
    source rows and the fingerprints captured at ingest time.  Empty
    result = the invariant holds across every committed segment."""
    from terrier_spark.operators import integrity

    return integrity.verify_content(
        source, live_fingerprints(spark, index_dir), id_col, text_col
    )


def compact(spark: SparkSession, index_dir: str) -> InvertedIndex:
    """Fold all segments into one materialized segment and swap the
    manifest — Lucene-style segment merge as an explicit maintenance
    op.  Readers opening the index concurrently see either the old
    segment list or the single compacted one (atomic rename), never a
    mix."""
    segments = _read_manifest(index_dir)
    if len(segments) <= 1:
        return open_live_index(spark, index_dir)
    # Fold EXACTLY this snapshot: max_bid below is computed from it, so
    # a segment the sink commits while we write the fold must stay OUT
    # of `merged` (it survives via the 'late' list at commit instead).
    merged = _fold_segments(spark, index_dir, segments)
    max_bid = max(s["batch_id"] for s in segments)
    name = f"seg_{max_bid:08d}_compacted"
    comp_dir = os.path.join(index_dir, name)
    os.makedirs(comp_dir, exist_ok=True)
    with open(os.path.join(comp_dir, IN_PROGRESS), "w"):
        pass
    write_index(merged, comp_dir)
    # Fold the per-segment content-sha sidecars with the postings: the
    # compacted segment's sidecar is the union of its inputs', so the
    # end-to-end invariant survives compaction without re-reading any
    # source content (the shas were computed once, at ingest).  Union
    # whatever sidecars EXIST — dropping the fold because one pre-
    # sidecar segment is in the mix would let the subsequent vacuum
    # destroy every fingerprint that DID exist; partial coverage
    # instead surfaces honestly as MISSING rows in verify_live_content.
    import functools

    from terrier_spark.operators import integrity

    fp_parts = [
        integrity.read_fingerprints(spark, os.path.join(index_dir, s["name"]))
        for s in segments
        if integrity.has_fingerprints(os.path.join(index_dir, s["name"]))
    ]
    if fp_parts:
        integrity.write_fingerprints(
            functools.reduce(DataFrame.unionByName, fp_parts), comp_dir
        )
    with _MANIFEST_LOCK:
        # Re-read at commit time: segments the ingest sink committed
        # WHILE we were writing the compacted fold (batch_id > max_bid)
        # must survive — replacing the whole list from the stale read
        # would silently drop them (and streaming never replays a batch
        # its checkpoint recorded as done).
        current = _read_manifest(index_dir)
        late = [s for s in current if s["batch_id"] > max_bid]
        _commit_manifest(
            index_dir,
            [
                {
                    "name": name,
                    "batch_id": max_bid,
                    "num_docs": merged.num_docs,
                    "compacted": True,
                }
            ]
            + late,
        )
        try:
            os.remove(os.path.join(comp_dir, IN_PROGRESS))
        except FileNotFoundError:
            pass
    return load_index(spark, comp_dir)


def maybe_compact(
    spark: SparkSession,
    index_dir: str,
    max_segments: int = 8,
    vacuum_min_age_s: float = 3600.0,
) -> InvertedIndex | None:
    """Tiered maintenance policy: compact only when the manifest has
    grown past ``max_segments`` (each live-index open plans k-1 block
    rebases, so k is a read-amplification knob exactly like Lucene's
    segment count).  Returns the compacted index, or None if below the
    threshold.  Schedulable from the ingest loop: call it after every
    batch; it's a manifest read when there's nothing to do.

    After a successful compaction the now-unreferenced segment dirs are
    vacuumed (aged by ``vacuum_min_age_s`` so concurrent readers holding
    the previous manifest keep working; in-progress writers are protected
    by the commit sentinel regardless of age) — without this, a streaming
    loop that only ever calls maybe_compact accumulates dead segment
    dirs indefinitely."""
    if len(_read_manifest(index_dir)) <= max_segments:
        return None
    idx = compact(spark, index_dir)
    vacuum(index_dir, min_age_s=vacuum_min_age_s)
    return idx


def vacuum(index_dir: str, min_age_s: float = 3600.0) -> list[str]:
    """Delete segment DIRECTORIES no longer referenced by the manifest
    (compaction leaves the old segment dirs in place so concurrent
    readers holding the previous manifest keep working — the same
    deferred-deletion contract as Lucene/Iceberg snapshot expiry).
    Call it once in-flight readers are done.  Returns removed paths.

    IN-PROGRESS protection is the commit sentinel: writers create
    ``_IN_PROGRESS`` inside the segment dir before write_index and
    remove it under the manifest lock at commit, and vacuum skips any
    dir carrying it REGARDLESS of age — so a writer stalled arbitrarily
    long between write and commit is safe even at ``min_age_s=0``.
    ``min_age_s`` additionally age-gates sentinel-less dirs: it keeps
    just-dereferenced segments readable for in-flight readers holding
    the previous manifest, and covers segments written by pre-sentinel
    builds.  (A writer that CRASHES mid-write leaves its sentinel
    behind; such a dir is never auto-deleted — remove it manually once
    the crash is confirmed.)"""
    import shutil
    import time

    with _MANIFEST_LOCK:
        live = {s["name"] for s in _read_manifest(index_dir)}
    now = time.time()
    removed = []
    for entry in sorted(os.listdir(index_dir)):
        p = os.path.join(index_dir, entry)
        if not (entry.startswith("seg_") and entry not in live and os.path.isdir(p)):
            continue
        if os.path.exists(os.path.join(p, IN_PROGRESS)):
            continue  # uncommitted writer, however old — never delete
        try:
            newest = max(
                os.path.getmtime(os.path.join(root, f))
                for root, _, files in os.walk(p)
                for f in files
            )
        except ValueError:  # empty dir
            newest = os.path.getmtime(p)
        if now - newest < min_age_s:
            continue
        # Re-check liveness + sentinel under the lock IMMEDIATELY before
        # deletion: a writer can commit (manifest publish + sentinel
        # removal, both inside _MANIFEST_LOCK in ingest_batch) after the
        # snapshot above, making a dir that was dead-and-sentinel-less at
        # scan time manifest-live by rmtree time.  Commit is atomic under
        # the same lock, so this locked re-read is authoritative.
        with _MANIFEST_LOCK:
            live_now = {s["name"] for s in _read_manifest(index_dir)}
            if entry in live_now or os.path.exists(os.path.join(p, IN_PROGRESS)):
                continue
            shutil.rmtree(p, ignore_errors=True)
        removed.append(p)
    return removed

"""Continuous index ingestion: stream → segments → live index.

The incrementally built index must be statistically and score-wise
identical to a from-scratch batch build over the same docs; restarts
must process only new files (checkpointed batch ids); compaction must
preserve results while collapsing the manifest to one segment.
"""

import glob
import os
import shutil

import pytest

from pyspark.sql import functions as F

from terrier_spark.operators.index_build import build_index
from terrier_spark.operators.score import bm25_topk_blocks
from terrier_spark.streaming import ingest

QUERY = "int return foo_bar"
SPAN = 64  # small pinned span so 120 docs spread over several buckets


def _drop_slice(df, dest_dir: str, name: str, tmp: str) -> None:
    """Write one parquet FILE (not directory) into the stream source."""
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    os.makedirs(dest_dir, exist_ok=True)
    shutil.copy(part, os.path.join(dest_dir, name))


def _scores(idx, k=200):
    return {
        (r["doc_id"], round(r["score"], 6))
        for r in bm25_topk_blocks(idx, QUERY, k).collect()
    }


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "idx": str(tmp_path / "index"),
        "cp": str(tmp_path / "checkpoint"),
        "tmp": str(tmp_path / "slice_tmp"),
    }


def _run_ingest(spark, corpus_sdf, dirs):
    stream = (
        spark.readStream.schema(corpus_sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"])
    )
    q = ingest.ingest_stream(
        stream, dirs["idx"], dirs["cp"], bucket_span=SPAN, available_now=True
    )
    q.awaitTermination(300)


def test_stream_ingestion_matches_batch_build(spark, corpus_sdf, dirs):
    slices = [
        corpus_sdf.filter(F.abs(F.hash("doc_id")) % 3 == i) for i in range(3)
    ]
    for i, s in enumerate(slices):
        _drop_slice(s, dirs["src"], f"slice_{i}.parquet", dirs["tmp"])
    _run_ingest(spark, corpus_sdf, dirs)

    segs = ingest._read_manifest(dirs["idx"])
    assert len(segs) == 3 and sum(s["num_docs"] for s in segs) == corpus_sdf.count()

    live = ingest.open_live_index(spark, dirs["idx"])
    batch = build_index(corpus_sdf, bucket_span=SPAN)

    assert live.num_docs == batch.num_docs
    assert live.num_tokens == batch.num_tokens
    assert abs(live.avgdl - batch.avgdl) < 1e-9
    lex_live = {
        (r["term"], r["df"], r["cf"]) for r in live.lexicon.collect()
    }
    lex_batch = {
        (r["term"], r["df"], r["cf"]) for r in batch.lexicon.collect()
    }
    assert lex_live == lex_batch
    assert _scores(live) == _scores(batch)

    # restart with one NEW file: only it is processed (checkpoint), and
    # the live index picks up its docs
    more = corpus_sdf.filter(F.abs(F.hash("doc_id")) % 3 == 0).withColumn(
        "doc_id", F.concat(F.lit("ffff"), F.col("doc_id"))
    )
    _drop_slice(more, dirs["src"], "slice_3.parquet", dirs["tmp"])
    _run_ingest(spark, corpus_sdf, dirs)
    segs2 = ingest._read_manifest(dirs["idx"])
    assert len(segs2) == 4
    live2 = ingest.open_live_index(spark, dirs["idx"])
    assert live2.num_docs == corpus_sdf.count() + more.count()


def test_compaction_preserves_results(spark, corpus_sdf, dirs):
    for i in range(3):
        _drop_slice(
            corpus_sdf.filter(F.abs(F.hash("doc_id")) % 3 == i),
            dirs["src"], f"slice_{i}.parquet", dirs["tmp"],
        )
    _run_ingest(spark, corpus_sdf, dirs)
    live = ingest.open_live_index(spark, dirs["idx"])
    before = _scores(live)
    stats = (live.num_docs, live.num_tokens)

    compacted = ingest.compact(spark, dirs["idx"])
    assert len(ingest._read_manifest(dirs["idx"])) == 1
    assert (compacted.num_docs, compacted.num_tokens) == stats
    assert _scores(compacted) == before
    # reopening goes through the compacted segment
    reopened = ingest.open_live_index(spark, dirs["idx"])
    assert _scores(reopened) == before


def test_empty_batch_is_skipped(spark, corpus_sdf, dirs):
    empty = corpus_sdf.limit(0)
    n = ingest.ingest_batch(empty, 0, dirs["idx"], bucket_span=SPAN)
    assert n == 0
    assert ingest._read_manifest(dirs["idx"]) == []


def _tiny(spark, lo, hi):
    rows = [(i, f"alpha beta doc{i} int return") for i in range(lo, hi)]
    return spark.createDataFrame(rows, "doc_id long, content string")


def test_many_small_segments_no_docno_collision(spark, dirs):
    """Rebase must use the docno-space EXTENT, not the doc count: three
    batches far smaller than the span pad each merge to a bucket
    boundary, so an offset derived from num_docs would hand segment 3
    the docno range segment 2 already occupies (two docs per docno —
    silently summed scores).  Regression for the r3 review finding."""
    for b in range(3):
        ingest.ingest_batch(
            _tiny(spark, b * 10, b * 10 + 10), b, dirs["idx"], bucket_span=SPAN
        )
    live = ingest.open_live_index(spark, dirs["idx"])
    docnos = [r["docno"] for r in live.docmap.select("docno").collect()]
    assert len(docnos) == 30
    assert len(set(docnos)) == 30, "docno ranges collided across segments"
    # limit outruns count because of per-merge padding
    assert live.docno_limit >= max(docnos) + 1 > live.num_docs
    # and the merged index still scores exactly like a batch build
    full = build_index(
        _tiny(spark, 0, 30), id_col="doc_id", text_col="content", bucket_span=SPAN
    )
    assert {(d, s) for d, s in _scores(live)} == {(d, s) for d, s in _scores(full)}


def test_replay_after_compact_is_noop(spark, dirs):
    """A compacted segment FOLDS IN every batch up to its id; an
    at-least-once replay of one of those batches must not re-add its
    docs under a fresh segment name.  Regression for the r3 review
    finding (rename defeating the name-keyed upsert)."""
    for b in range(2):
        ingest.ingest_batch(
            _tiny(spark, b * 10, b * 10 + 10), b, dirs["idx"], bucket_span=SPAN
        )
    ingest.compact(spark, dirs["idx"])
    n = ingest.ingest_batch(_tiny(spark, 10, 20), 1, dirs["idx"], bucket_span=SPAN)
    assert n == 0
    manifest = ingest._read_manifest(dirs["idx"])
    assert len(manifest) == 1 and manifest[0].get("compacted")
    assert ingest.open_live_index(spark, dirs["idx"]).num_docs == 20


def test_compact_preserves_segment_committed_during_fold(spark, dirs, monkeypatch):
    """A segment the ingest sink commits WHILE compact() is writing the
    fold must survive the manifest swap (compact re-reads at commit
    time).  Regression for the r3 review finding (stale read-modify-
    write dropping concurrent batches permanently)."""
    for b in range(2):
        ingest.ingest_batch(
            _tiny(spark, b * 10, b * 10 + 10), b, dirs["idx"], bucket_span=SPAN
        )
    orig_write = ingest.write_index

    def write_then_ingest_late(idx, out_dir, **kw):
        orig_write(idx, out_dir, **kw)
        if out_dir.endswith("_compacted"):
            monkeypatch.setattr(ingest, "write_index", orig_write)
            ingest.ingest_batch(
                _tiny(spark, 20, 30), 7, dirs["idx"], bucket_span=SPAN
            )

    monkeypatch.setattr(ingest, "write_index", write_then_ingest_late)
    ingest.compact(spark, dirs["idx"])
    manifest = ingest._read_manifest(dirs["idx"])
    assert [s["batch_id"] for s in manifest] == [1, 7]
    assert ingest.open_live_index(spark, dirs["idx"]).num_docs == 30


def test_maybe_compact_threshold_and_vacuum(spark, dirs):
    for b in range(4):
        ingest.ingest_batch(
            _tiny(spark, b * 10, b * 10 + 10), b, dirs["idx"], bucket_span=SPAN
        )
    # below threshold: no-op
    assert ingest.maybe_compact(spark, dirs["idx"], max_segments=8) is None
    assert len(ingest._read_manifest(dirs["idx"])) == 4
    # above threshold: compacts to one segment
    out = ingest.maybe_compact(spark, dirs["idx"], max_segments=3)
    assert out is not None and len(ingest._read_manifest(dirs["idx"])) == 1
    # old segment dirs survive for in-flight readers until vacuum
    import os
    segs = [d for d in os.listdir(dirs["idx"]) if d.startswith("seg_")]
    assert len(segs) == 5
    removed = ingest.vacuum(dirs["idx"], min_age_s=0)
    assert len(removed) == 4
    live = ingest.open_live_index(spark, dirs["idx"])
    assert live.num_docs == 40


def test_orphan_segment_deleted_on_concurrent_compact_fold(spark, dirs, monkeypatch):
    """If a concurrent compact() folds batch B while its segment is
    being written, the locked re-check skips the commit — and must also
    DELETE the fully-written orphan dir (ADVICE r4: nothing in the
    streaming path is obliged to call vacuum, so orphans otherwise
    accumulate forever)."""
    for b in range(2):
        ingest.ingest_batch(
            _tiny(spark, b * 10, b * 10 + 10), b, dirs["idx"], bucket_span=SPAN
        )
    orig_write = ingest.write_index

    def write_then_compact(idx, out_dir, **kw):
        orig_write(idx, out_dir, **kw)
        if not out_dir.endswith("_compacted"):
            # a concurrent maintenance pass folds everything committed
            # so far — batch_id 1 >= our in-flight batch 1
            monkeypatch.setattr(ingest, "write_index", orig_write)
            ingest.compact(spark, dirs["idx"])

    # replay batch 1 (at-least-once) with the compactor racing it
    monkeypatch.setattr(ingest, "write_index", write_then_compact)
    n = ingest.ingest_batch(_tiny(spark, 10, 20), 1, dirs["idx"], bucket_span=SPAN)
    assert n == 0
    # the replayed segment dir must be gone, not orphaned on disk
    assert not os.path.exists(os.path.join(dirs["idx"], "seg_00000001"))
    assert ingest.open_live_index(spark, dirs["idx"]).num_docs == 20


def test_vacuum_spares_stalled_uncommitted_writer(spark, dirs, monkeypatch):
    """A writer stalled arbitrarily long between write_index and its
    manifest commit must survive vacuum(min_age_s=0): the _IN_PROGRESS
    commit sentinel protects the dir regardless of age (VERDICT r3
    hygiene #4 — the old guard was mtime-based and racy for stalls
    longer than min_age_s)."""
    ingest.ingest_batch(_tiny(spark, 0, 10), 0, dirs["idx"], bucket_span=SPAN)
    orig_write = ingest.write_index
    vacuumed = {}

    def write_then_stall(idx, out_dir, **kw):
        orig_write(idx, out_dir, **kw)
        # the "stall": an aggressive vacuum fires while this writer has
        # written its segment but not yet committed the manifest entry
        vacuumed["removed"] = ingest.vacuum(dirs["idx"], min_age_s=0)
        vacuumed["survived"] = os.path.isdir(out_dir)

    monkeypatch.setattr(ingest, "write_index", write_then_stall)
    n = ingest.ingest_batch(_tiny(spark, 10, 20), 1, dirs["idx"], bucket_span=SPAN)
    assert n == 10
    assert vacuumed["removed"] == []
    assert vacuumed["survived"]
    # after commit the sentinel is gone and the segment is live
    seg = os.path.join(dirs["idx"], "seg_00000001")
    assert not os.path.exists(os.path.join(seg, ingest.IN_PROGRESS))
    assert ingest.open_live_index(spark, dirs["idx"]).num_docs == 20


def test_vacuum_still_removes_dead_unreferenced_dirs(spark, dirs):
    """Sentinel-less unreferenced segment dirs (e.g. pre-sentinel
    builds, or post-compaction leftovers) are still age-gated and
    removed as before."""
    ingest.ingest_batch(_tiny(spark, 0, 10), 0, dirs["idx"], bucket_span=SPAN)
    dead = os.path.join(dirs["idx"], "seg_99999999")
    os.makedirs(dead)
    with open(os.path.join(dead, "junk"), "w") as f:
        f.write("x")
    assert ingest.vacuum(dirs["idx"], min_age_s=0) == [dead]
    assert not os.path.exists(dead)


def test_vacuum_recheck_spares_segment_committed_mid_scan(spark, dirs, monkeypatch):
    """TOCTOU guard (review finding r4): a segment that becomes
    manifest-live AFTER vacuum snapshots the live set but BEFORE its
    rmtree must survive — vacuum re-checks manifest membership under
    _MANIFEST_LOCK immediately before each deletion.  Simulated by
    making the snapshot read return a STALE (empty) manifest while the
    locked re-check sees the real one."""
    ingest.ingest_batch(_tiny(spark, 0, 10), 0, dirs["idx"], bucket_span=SPAN)
    seg = os.path.join(dirs["idx"], "seg_00000000")
    assert os.path.isdir(seg)

    real_read = ingest._read_manifest
    calls = {"n": 0}

    def stale_first_read(index_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            return []  # the pre-commit snapshot: segment not yet live
        return real_read(index_dir)

    monkeypatch.setattr(ingest, "_read_manifest", stale_first_read)
    assert ingest.vacuum(dirs["idx"], min_age_s=0) == []
    assert calls["n"] >= 2  # the locked re-check actually ran
    assert os.path.isdir(seg)
    assert ingest.open_live_index(spark, dirs["idx"]).num_docs == 10


def test_compact_folds_exactly_its_manifest_snapshot(spark, dirs, monkeypatch):
    """A segment committed AFTER compact() snapshots the manifest but
    BEFORE the fold completes must appear exactly once in the final
    index (review finding r4: the fold used to re-read the manifest via
    open_live_index, pulling the late segment into the compacted blob
    AND keeping it in the 'late' list — its docs counted twice)."""
    ingest.ingest_batch(_tiny(spark, 0, 10), 0, dirs["idx"], bucket_span=SPAN)
    ingest.ingest_batch(_tiny(spark, 10, 20), 1, dirs["idx"], bucket_span=SPAN)

    real_fold = ingest._fold_segments

    def fold_with_concurrent_commit(spark_, index_dir, segments):
        # the sink commits batch 2 after the snapshot, during the fold
        ingest.ingest_batch(
            _tiny(spark_, 20, 30), 2, index_dir, bucket_span=SPAN
        )
        return real_fold(spark_, index_dir, segments)

    monkeypatch.setattr(ingest, "_fold_segments", fold_with_concurrent_commit)
    ingest.compact(spark, dirs["idx"])
    monkeypatch.setattr(ingest, "_fold_segments", real_fold)
    live = ingest.open_live_index(spark, dirs["idx"])
    assert live.num_docs == 30  # double-count would give 40
    # and the late segment's docs are queryable exactly once
    assert live.docmap.count() == 30

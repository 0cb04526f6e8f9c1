"""End-to-end content-sha256 invariant (operators/integrity.py).

North rule: "per-row content sha256 equality is enforced end-to-end".
These tests prove the three layers of the enforcement chain:
  1. the fingerprint IS sha256 of the UTF-8 content bytes (hashlib twin),
  2. per-row verification catches every violation class
     (MISSING / EXTRA / MISMATCH) and passes a clean round-trip through
     write_index → verify_index_content,
  3. the checkpoint lineage carries an order-independent sha-derived
     shard digest that any engine can recompute (local XOR twin).
"""

import hashlib

import pytest

from pyspark.sql import functions as F

from terrier_spark.operators import integrity
from terrier_spark.operators.index_build import build_index, write_index


def _local_sha(text: str) -> str:
    return hashlib.sha256(text.encode()).hexdigest()


def test_fingerprints_match_hashlib(corpus_sdf, corpus_pdf):
    fps = {
        r["doc_id"]: r["content_sha"]
        for r in integrity.content_fingerprints(corpus_sdf).collect()
    }
    assert len(fps) == len(corpus_pdf)
    for doc_id, content in zip(corpus_pdf["doc_id"], corpus_pdf["content"]):
        assert fps[doc_id] == _local_sha(content)


def test_collection_digest_order_independent_and_sensitive(spark, corpus_sdf):
    fps = integrity.content_fingerprints(corpus_sdf)
    d1 = integrity.collection_sha_digest(fps)
    # Re-shuffled / re-partitioned input → identical digest.
    d2 = integrity.collection_sha_digest(fps.repartition(7).orderBy(F.rand(3)))
    assert d1 == d2
    assert len(d1) == 64 and d1 != "0" * 64
    # One flipped row → different digest.
    mutated = corpus_sdf.withColumn(
        "content",
        F.when(
            F.col("doc_id")
            == corpus_sdf.select("doc_id").orderBy("doc_id").first()["doc_id"],
            F.concat(F.col("content"), F.lit("X")),
        ).otherwise(F.col("content")),
    )
    d3 = integrity.collection_sha_digest(integrity.content_fingerprints(mutated))
    assert d3 != d1
    # Empty set → the identity digest.
    empty = integrity.collection_sha_digest(
        integrity.content_fingerprints(corpus_sdf.filter(F.lit(False)))
    )
    assert empty == "0" * 64


def test_local_xor_twin(corpus_pdf):
    """The distributed digest equals a pure-Python XOR of per-row shas —
    the 'any engine can recompute it' property, proven off-platform."""
    acc = 0
    for content in corpus_pdf["content"]:
        acc ^= int(_local_sha(content), 16)
    expected = format(acc, "064x")
    # computed distributed in the other test; recompute here cheaply
    from terrier_spark.session import get_spark

    spark = get_spark(app_name="terrier_spark_tests", cores=8, shuffle_partitions=8)
    sdf = spark.createDataFrame(
        [(str(i), c) for i, c in enumerate(corpus_pdf["content"])],
        "doc_id string, content string",
    )
    got = integrity.collection_sha_digest(integrity.content_fingerprints(sdf))
    assert got == expected


def test_verify_content_clean_and_violations(spark, corpus_sdf):
    fps = integrity.content_fingerprints(corpus_sdf).persist()
    try:
        assert integrity.verify_content(corpus_sdf, fps).count() == 0

        ids = [r["doc_id"] for r in corpus_sdf.select("doc_id").orderBy("doc_id").limit(3).collect()]
        # MISMATCH: one row's content silently changed after fingerprinting.
        corrupted = corpus_sdf.withColumn(
            "content",
            F.when(F.col("doc_id") == ids[0], F.lit("tampered")).otherwise(
                F.col("content")
            ),
        )
        v = integrity.verify_content(corrupted, fps).collect()
        assert [(r["doc_id"], r["status"]) for r in v] == [(ids[0], "MISMATCH")]
        assert v[0]["expected_sha"] == _local_sha("tampered")

        # MISSING: a source row with no recorded fingerprint.
        v = integrity.verify_content(corpus_sdf, fps.filter(F.col("doc_id") != ids[1]))
        assert [(r["doc_id"], r["status"]) for r in v.collect()] == [
            (ids[1], "MISSING")
        ]

        # EXTRA: a fingerprint whose source row was deleted.
        v = integrity.verify_content(
            corpus_sdf.filter(F.col("doc_id") != ids[2]), fps
        )
        assert [(r["doc_id"], r["status"]) for r in v.collect()] == [(ids[2], "EXTRA")]
    finally:
        fps.unpersist()


def test_write_index_sidecar_roundtrip(spark, corpus_sdf, tmp_path):
    out = str(tmp_path / "idx")
    idx = build_index(corpus_sdf, cache=False)
    try:
        write_index(idx, out, fingerprint_docs=corpus_sdf)
        assert integrity.has_fingerprints(out)
        # Clean round-trip: zero violations against a fresh source read.
        assert integrity.verify_index_content(spark, out, corpus_sdf).count() == 0
        # Tampered source is caught per-row.
        doc = corpus_sdf.select("doc_id").orderBy("doc_id").first()["doc_id"]
        bad = corpus_sdf.withColumn(
            "content",
            F.when(F.col("doc_id") == doc, F.lit("evil")).otherwise(F.col("content")),
        )
        rows = integrity.verify_index_content(spark, out, bad).collect()
        assert [(r["doc_id"], r["status"]) for r in rows] == [(doc, "MISMATCH")]
    finally:
        idx.release()


def test_verify_without_sidecar_raises(spark, corpus_sdf, tmp_path):
    out = str(tmp_path / "idx_nofp")
    idx = build_index(corpus_sdf, cache=False)
    try:
        write_index(idx, out)  # no fingerprint_docs
        with pytest.raises(FileNotFoundError):
            integrity.verify_index_content(spark, out, corpus_sdf)
    finally:
        idx.release()


def test_checkpoint_lineage_carries_sha_digest(spark, corpus_sdf, corpus_pdf, tmp_path):
    from terrier_spark.operators.checkpoint import (
        build_postings_checkpointed, lineage_df, read_manifest,
    )

    out = str(tmp_path / "ckpt_sha")
    build_postings_checkpointed(corpus_sdf, out, n_shards=4, text_col="content")
    man = read_manifest(out)
    assert sorted(man) == [0, 1, 2, 3]

    # Twin: recompute each shard's digest in pure Python with the same
    # sharding rule (pmod(xxhash64(doc_id), 4) — read shard membership
    # back from Spark to avoid reimplementing xxhash64).
    shard_of = {
        r["doc_id"]: int(r["shard"])
        for r in corpus_sdf.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(4)).alias("shard")
        ).collect()
    }
    acc = {s: 0 for s in range(4)}
    for doc_id, content in zip(corpus_pdf["doc_id"], corpus_pdf["content"]):
        acc[shard_of[doc_id]] ^= int(_local_sha(content), 16)
    for s in range(4):
        assert man[s].content_sha_digest == format(acc[s], "064x")

    # Resume (no-op build) keeps digests; lineage_df exposes the column.
    build_postings_checkpointed(corpus_sdf, out, n_shards=4, text_col="content")
    man2 = read_manifest(out)
    assert {s: r.content_sha_digest for s, r in man2.items()} == {
        s: r.content_sha_digest for s, r in man.items()
    }
    assert "content_sha_digest" in lineage_df(spark, out).columns


def test_stream_ingest_enforces_invariant(spark, corpus_sdf, tmp_path):
    """The STREAMING build path carries the sidecar per segment, the
    live union covers every ingested doc, verification catches
    post-ingest tampering, and compaction folds sidecars losslessly."""
    import glob
    import os
    import shutil

    from terrier_spark.streaming import ingest

    src, idx_dir, cp, slice_tmp = (
        str(tmp_path / d) for d in ("src", "index", "cp", "slice_tmp")
    )
    slices = [
        corpus_sdf.filter(F.abs(F.hash("doc_id")) % 3 == i) for i in range(3)
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.mode("overwrite").parquet(slice_tmp)
        part = glob.glob(os.path.join(slice_tmp, "part-*.parquet"))[0]
        os.makedirs(src, exist_ok=True)
        shutil.copy(part, os.path.join(src, f"slice_{i}.parquet"))
    stream = (
        spark.readStream.schema(corpus_sdf.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ingest.ingest_stream(stream, idx_dir, cp, bucket_span=64, available_now=True)
    q.awaitTermination(300)

    assert len(ingest._read_manifest(idx_dir)) == 3
    fps = ingest.live_fingerprints(spark, idx_dir)
    assert fps.count() == corpus_sdf.count()
    assert ingest.verify_live_content(spark, idx_dir, corpus_sdf).count() == 0

    doc = corpus_sdf.select("doc_id").orderBy("doc_id").first()["doc_id"]
    tampered = corpus_sdf.withColumn(
        "content",
        F.when(F.col("doc_id") == doc, F.lit("evil")).otherwise(F.col("content")),
    )
    rows = ingest.verify_live_content(spark, idx_dir, tampered).collect()
    assert [(r["doc_id"], r["status"]) for r in rows] == [(doc, "MISMATCH")]

    # Compaction folds the sidecars: one segment, same invariant.
    ingest.compact(spark, idx_dir)
    segs = ingest._read_manifest(idx_dir)
    assert len(segs) == 1 and segs[0].get("compacted")
    assert ingest.verify_live_content(spark, idx_dir, corpus_sdf).count() == 0
    assert ingest.live_fingerprints(spark, idx_dir).count() == corpus_sdf.count()


def test_old_manifest_without_digest_still_loads(tmp_path):
    """Pre-r4 manifest rows (no content_sha_digest key) must parse."""
    import json
    import os

    from terrier_spark.operators.checkpoint import ShardRecord, read_manifest

    out = str(tmp_path / "old")
    os.makedirs(out)
    rec = {
        "shard": 0, "status": "COMPLETE", "n_rows": 1,
        "input_fingerprint": "ab" * 8, "n_postings": 3, "wall_ms": 1,
        "out_path": "x", "engine_version": "0.0", "finished_at_unix": 0,
    }
    with open(os.path.join(out, "manifest.jsonl"), "w") as f:
        f.write(json.dumps(rec) + "\n")
    man = read_manifest(out)
    assert man[0].content_sha_digest == ""
    assert isinstance(man[0], ShardRecord)

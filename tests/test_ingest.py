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

"""Checkpoint/resume (north rule: resumable builds with per-partition
lineage + timing).  Reference analog: recovery manager replay,
/root/reference/src/storage/recovery/recovery_manager.cpp:32-48."""

import json

import pytest

from pyspark.sql import functions as F

from terrier_spark.operators.checkpoint import (
    build_postings_checkpointed, lineage_df, read_manifest,
)

N_SHARDS = 4


def _expected_postings(corpus_pdf, oracle_index):
    exp = set()
    for term, docs in oracle_index.postings.items():
        for doc_id, tf in docs.items():
            exp.add((term, doc_id, tf, oracle_index.doclen[doc_id]))
    return exp


def test_full_build_and_contents(spark, corpus_sdf, oracle_index, corpus_pdf, tmp_path):
    out = str(tmp_path / "ckpt")
    posts = build_postings_checkpointed(
        corpus_sdf, out, n_shards=N_SHARDS, text_col="content"
    )
    got = {
        (r["term"], r["doc_id"], r["tf"], r["dl"])
        for r in posts.filter(F.col("term").isNotNull()).collect()
    }
    assert got == _expected_postings(corpus_pdf, oracle_index)
    # doclen rows present for every doc
    assert posts.filter(F.col("term").isNull()).count() == corpus_sdf.count()
    man = read_manifest(out)
    assert sorted(man) == list(range(N_SHARDS))
    assert all(r.status == "COMPLETE" for r in man.values())
    assert lineage_df(spark, out).count() == N_SHARDS


def test_failure_then_resume_skips_completed(spark, corpus_sdf, tmp_path):
    out = str(tmp_path / "ckpt_fail")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_postings_checkpointed(
            corpus_sdf, out, n_shards=N_SHARDS, text_col="content", fail_on_shard=2
        )
    man = read_manifest(out)
    assert man[0].status == "COMPLETE" and man[1].status == "COMPLETE"
    assert man[2].status == "FAILED"
    assert 3 not in man
    first_finish = {s: man[s].finished_at_unix for s in (0, 1)}

    posts = build_postings_checkpointed(
        corpus_sdf, out, n_shards=N_SHARDS, text_col="content", resume=True
    )
    man2 = read_manifest(out)
    assert all(man2[s].status == "COMPLETE" for s in range(N_SHARDS))
    # completed shards were NOT rebuilt: original manifest records stand
    for s in (0, 1):
        assert man2[s].finished_at_unix == first_finish[s]
    # append-log shape: 3 records from run 1 + 2 from resume
    with open(f"{out}/manifest.jsonl") as f:
        lines = [json.loads(l) for l in f if l.strip()]
    assert len(lines) == 5
    assert posts.count() > 0


def test_job_count_independent_of_shard_count(spark, corpus_sdf, tmp_path):
    """The one-pass build must run a CONSTANT number of Spark jobs —
    and therefore O(1) corpus scans — regardless of n_shards (the
    round-1 loop ran 2 jobs per shard).  Job count via job groups."""

    def jobs_for(n_shards: int, tag: str) -> int:
        sc = spark.sparkContext
        sc.setJobGroup(tag, tag)
        try:
            build_postings_checkpointed(
                corpus_sdf, str(tmp_path / tag), n_shards=n_shards, text_col="content"
            )
        finally:
            sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    j4 = jobs_for(4, "ckpt_jobs_4")
    j16 = jobs_for(16, "ckpt_jobs_16")
    assert j4 == j16, f"job count scales with shards: {j4} vs {j16}"
    # 3 queries (fingerprint, write, lineage counts); AQE may split each
    # into a few jobs but the total stays a small constant.
    assert j4 <= 10


def test_index_from_checkpointed_postings_matches_oracle(
    spark, corpus_sdf, oracle_index, corpus_pdf, tmp_path
):
    """Finish an index from the checkpointed shard postings (no
    re-tokenization) — BM25 must be rank-identical to the oracle."""
    from terrier_spark import oracle
    from terrier_spark.operators.index_build import index_from_postings
    from terrier_spark.operators.score import bm25_topk_exploded

    out = str(tmp_path / "ckpt_full")
    posts = build_postings_checkpointed(
        corpus_sdf, out, n_shards=N_SHARDS, text_col="content"
    )
    idx = index_from_postings(posts)
    assert idx.num_docs == oracle_index.num_docs
    assert abs(idx.avgdl - oracle_index.avgdl) < 1e-9
    q = "int return foo_bar"
    exp = oracle.bm25_topk(oracle_index, q, 10)
    got = [(r["doc_id"], r["score"]) for r in bm25_topk_exploded(idx, q, 10).collect()]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) <= 1e-9


def test_input_change_triggers_rebuild(spark, corpus_sdf, tmp_path):
    out = str(tmp_path / "ckpt_fp")
    build_postings_checkpointed(corpus_sdf, out, n_shards=2, text_col="content")
    t1 = {s: r.finished_at_unix for s, r in read_manifest(out).items()}
    changed = corpus_sdf.withColumn("content", F.concat(F.col("content"), F.lit(" extra")))
    build_postings_checkpointed(changed, out, n_shards=2, text_col="content")
    man = read_manifest(out)
    with open(f"{out}/manifest.jsonl") as f:
        lines = [l for l in f if l.strip()]
    assert len(lines) == 4  # both shards rebuilt (fingerprint mismatch)


def test_shrunk_to_empty_shard_is_deleted(spark, corpus_sdf, tmp_path):
    """ADVICE r2 (high): dynamic partition overwrite only replaces
    partitions present in the new data, so a shard whose input shrank to
    ZERO rows kept its stale dir and resurrected deleted docs.  Rebuild
    with one shard's docs entirely removed: its dir must be gone, the
    output must contain no deleted doc, and its manifest row must say
    n_rows=0 / n_postings=0."""
    import os

    out = str(tmp_path / "ckpt_shrink")
    build_postings_checkpointed(corpus_sdf, out, n_shards=N_SHARDS, text_col="content")
    shard_col = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(N_SHARDS))
    kept = corpus_sdf.filter(shard_col != 2)
    removed_ids = {
        r["doc_id"] for r in corpus_sdf.filter(shard_col == 2).select("doc_id").collect()
    }
    assert removed_ids  # the scenario is real on this corpus
    posts = build_postings_checkpointed(kept, out, n_shards=N_SHARDS, text_col="content")
    assert not os.path.isdir(os.path.join(out, "shard=2"))
    got_ids = {r["doc_id"] for r in posts.select("doc_id").distinct().collect()}
    assert not (got_ids & removed_ids)
    man = read_manifest(out)
    assert man[2].status == "COMPLETE"
    assert man[2].n_rows == 0 and man[2].n_postings == 0


def test_dirty_outdir_fresh_run_drops_stale_shards(spark, corpus_sdf, tmp_path):
    """resume=False over a dirty out_dir must not leak stale shard dirs
    for shards that are empty in the new input."""
    import os

    out = str(tmp_path / "ckpt_dirty")
    build_postings_checkpointed(corpus_sdf, out, n_shards=N_SHARDS, text_col="content")
    shard_col = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(N_SHARDS))
    only_one = corpus_sdf.filter(shard_col == 0)
    posts = build_postings_checkpointed(
        only_one, out, n_shards=N_SHARDS, text_col="content", resume=False
    )
    for s in range(1, N_SHARDS):
        assert not os.path.isdir(os.path.join(out, f"shard={s}"))
    assert posts.count() == posts.filter(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(N_SHARDS)) == 0
    ).count()

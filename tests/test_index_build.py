import numpy as np

from pyspark.sql import functions as F

from terrier_spark.operators.compress import decode_posting_list, vbyte_decode


def test_collection_stats_exact(spark_index, oracle_index):
    assert spark_index.num_docs == oracle_index.num_docs
    assert spark_index.num_tokens == oracle_index.num_tokens
    assert abs(spark_index.avgdl - oracle_index.avgdl) < 1e-12


def test_lexicon_exact(spark_index, oracle_index):
    lex = {r["term"]: (r["df"], r["cf"]) for r in spark_index.lexicon.collect()}
    exp = {t: (oracle_index.df[t], oracle_index.cf[t]) for t in oracle_index.df}
    assert lex == exp


def test_docnos_dense_and_ordered(spark_index):
    rows = spark_index.docmap.orderBy("docno").collect()
    docnos = [r["docno"] for r in rows]
    assert docnos == list(range(len(rows)))
    doc_ids = [r["doc_id"] for r in rows]
    assert doc_ids == sorted(doc_ids)  # docno order == doc_id order


def test_doclens_exact(spark_index, oracle_index):
    got = {r["doc_id"]: r["doclen"] for r in spark_index.doclens.collect()}
    assert got == oracle_index.doclen


def test_blocks_roundtrip_to_postings(spark_index, oracle_index):
    """Decoding every block reproduces the oracle postings exactly."""
    docno_to_id = {
        r["docno"]: r["doc_id"] for r in spark_index.docmap.collect()
    }
    got: dict[str, dict[str, int]] = {}
    for r in spark_index.blocks.collect():
        docnos, tfs = decode_posting_list(bytes(r["docno_blob"]), bytes(r["tf_blob"]))
        dls = vbyte_decode(bytes(r["dl_blob"]))
        assert r["n_docs"] == len(docnos)
        assert r["first_docno"] == int(docnos[0])
        assert r["last_docno"] == int(docnos[-1])
        assert r["max_tf"] == int(tfs.max())
        assert r["min_dl"] == int(dls.min())
        # docnos strictly increasing within a block
        assert (np.diff(docnos.astype(np.int64)) > 0).all() or len(docnos) == 1
        for dn, tf, dl in zip(docnos, tfs, dls):
            doc_id = docno_to_id[int(dn)]
            got.setdefault(r["term"], {})[doc_id] = int(tf)
            assert oracle_index.doclen[doc_id] == int(dl)
    assert got == oracle_index.postings


def test_shuffle_strategy_equivalent(corpus_sdf, oracle_index):
    """The shuffle-strategy build (fallback for unalignable ids) must
    produce identical postings and stats as the aligned default."""
    from terrier_spark.operators.index_build import build_index

    idx = build_index(corpus_sdf, strategy="shuffle")
    assert idx.num_docs == oracle_index.num_docs
    assert idx.num_tokens == oracle_index.num_tokens
    lex = {r["term"]: (r["df"], r["cf"]) for r in idx.lexicon.collect()}
    assert lex == {t: (oracle_index.df[t], oracle_index.cf[t]) for t in oracle_index.df}


def test_hot_term_spreads_over_buckets(spark_index):
    """Skew design: a hot term's postings land in many (term,bucket) rows."""
    hot = (
        spark_index.blocks.filter(F.col("term") == "int")
        .select("bucket")
        .distinct()
        .count()
    )
    assert hot > 1


def test_write_load_query_roundtrip(spark, spark_index, oracle_index, corpus_pdf, tmp_path):
    """write_index -> load_index -> block-path query must be
    rank-identical to the oracle (the CLI's serve path)."""
    from terrier_spark import oracle
    from terrier_spark.operators.index_build import load_index, write_index
    from terrier_spark.operators.score import bm25_topk_blocks

    out = str(tmp_path / "idx")
    write_index(spark_index, out)
    loaded = load_index(spark, out)
    assert loaded.num_docs == spark_index.num_docs
    assert abs(loaded.avgdl - spark_index.avgdl) < 1e-12
    q = "int return foo_bar"
    exp = oracle.bm25_topk(oracle_index, q, 10)
    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_blocks(loaded, q, 10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_hot_term_blocks_bounded(spark_index):
    """Skew design, part 2: no posting row is unbounded — every block of
    the hottest term holds at most BLOCK_DOCS docs, so a term in 30% of
    10^12 docs becomes millions of bounded rows, never one giant row."""
    from terrier_spark.operators.index_build import BLOCK_DOCS

    hot = spark_index.blocks.filter(F.col("term") == "int")
    mx = hot.agg(F.max("n_docs")).collect()[0][0]
    assert mx is not None and mx <= BLOCK_DOCS


def test_python_murmur3_matches_jvm_hash(spark):
    """The driver-side preimage search places rows with _murmur3_int32;
    if it ever drifts from Spark's Murmur3HashFunction the aligned
    build's bijective partition placement silently degrades to skewed
    placement — pin exact equality over a value sweep."""
    from pyspark.sql import functions as F

    from terrier_spark.operators.index_build import (
        _exact_partition_salts, _murmur3_int32,
    )

    rows = (
        spark.range(4096)
        .select(
            F.col("id").cast("int").alias("v"),
            F.hash(F.col("id").cast("int")).alias("h"),
        )
        .collect()
    )
    assert all(_murmur3_int32(r["v"]) == r["h"] for r in rows)
    # and the salts really are a bijection onto 0..parts-1
    for parts in (3, 8, 32, 100):
        salts = _exact_partition_salts(spark, parts)
        assert sorted(_murmur3_int32(s) % parts for s in salts) == list(range(parts))


def test_cache_false_leaves_no_persisted_rdds(spark, corpus_sdf, oracle_index):
    """build_index(cache=False) on NON-alignable ids (the shuffle
    strategy, which routes through assign_docnos) must leave zero
    persisted RDDs behind (VERDICT r3 hygiene #1: the ranged-id cache
    used to be unpersisted only under `if cache`), and stay
    rank-identical — docno assignment without the ranged cache rests on
    RangePartitioner's deterministic per-partition sample seeds."""
    from terrier_spark.oracle import bm25_topk as oracle_bm25
    from terrier_spark.operators.index_build import build_index
    from terrier_spark.operators.score import bm25_topk_exploded

    # corpus_sdf is persisted by the fixture — measure the DELTA
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    # prefix breaks hex alignment -> forces the shuffle strategy
    docs = corpus_sdf.select(
        F.concat(F.lit("id-"), "doc_id").alias("doc_id"), "content"
    )
    idx = build_index(docs, id_col="doc_id", text_col="content", cache=False)
    got = bm25_topk_exploded(idx, "int return", 10).collect()
    assert jsc.getPersistentRDDs().size() == before, "cache=False leaked a persist"
    exp = oracle_bm25(oracle_index, "int return", 10)
    assert [r["doc_id"][3:] for r in got] == [d for d, _ in exp]
    assert [round(r["score"], 9) for r in got] == [round(s, 9) for _, s in exp]


def test_bucket_span_out_of_range_raises(spark, corpus_sdf):
    """Caller-pinned spans outside [1, MAX_BUCKET_SPAN] must raise, not
    silently corrupt the positional kernel's packed (docno, pos) keys
    (ADVICE r3)."""
    import pytest

    from terrier_spark.operators.index_build import MAX_BUCKET_SPAN, build_index

    for bad in (0, -5, MAX_BUCKET_SPAN + 1, 1 << 32):
        with pytest.raises(ValueError, match="bucket_span"):
            build_index(corpus_sdf, bucket_span=bad)


def test_cache_false_release_reclaims_snapshot(spark, corpus_sdf, oracle_index):
    """A cache=False build on non-alignable ids snapshots the ranged ids
    to scratch parquet; the snapshot backs the index's plans for its
    lifetime and InvertedIndex.release() reclaims it (review finding r4:
    snapshots otherwise accumulate one full id column per build until
    process exit — tmpfs RAM under bench.py's /dev/shm default)."""
    import os

    from terrier_spark.oracle import bm25_topk as oracle_bm25
    from terrier_spark.operators.index_build import build_index
    from terrier_spark.operators.score import bm25_topk_exploded

    docs = corpus_sdf.select(
        F.concat(F.lit("id-"), "doc_id").alias("doc_id"), "content"
    )
    idx = build_index(docs, id_col="doc_id", text_col="content", cache=False)
    assert idx.scratch_dirs, "shuffle-strategy cache=False build must record its snapshot"
    assert all(os.path.isdir(d) for d in idx.scratch_dirs)
    # OWNED by the index, exempt from the transient-dir sweep: a driver
    # calling release_uniq_scratch() for frames IT holds must not delete
    # the snapshot under this live index (ADVICE r4)
    from terrier_spark.plans import relational as R

    assert not (set(idx.scratch_dirs) & set(R._UNIQ_DIRS))
    # index is fully queryable while the snapshot lives
    got = bm25_topk_exploded(idx, "int return", 10).collect()
    exp = oracle_bm25(oracle_index, "int return", 10)
    assert [r["doc_id"][3:] for r in got] == [d for d, _ in exp]
    idx.release()
    assert all(not os.path.exists(d) for d in idx.scratch_dirs)


def test_block_id_unique_across_chunks_and_stable_under_merge(spark):
    """block_id must be unique within (term, bucket) even when a bucket
    spans multiple ARROW_SLICE_DOCS encode chunks (review finding r4:
    the old blocks-within-group counter restarted at 0 per chunk, so a
    term present in >1 chunk of a bucket emitted duplicate ids), and
    merge_indexes must keep the id consistent with the rebased
    bucket/first_docno metadata."""
    from terrier_spark.corpus import corpus_df
    from terrier_spark.functions.tokenize import ARROW_SLICE_DOCS
    from terrier_spark.operators.index_build import build_index, merge_indexes

    span = 2 * ARROW_SLICE_DOCS  # one bucket = two encode chunks
    docs = corpus_df(spark, 3 * ARROW_SLICE_DOCS).withColumn(
        "doc_id", F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256)
    )

    def invariant(blocks):
        dup = (
            blocks.groupBy("term", "bucket", "block_id")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dup == 0, "duplicate block_id within (term, bucket)"
        bad = blocks.filter(
            F.col("block_id")
            != F.col("bucket") * 1_000_000 + F.col("first_docno") % 1_000_000
        ).count()
        assert bad == 0, "block_id inconsistent with bucket/first_docno"

    idx = build_index(docs, bucket_span=span)
    # the corpus's ubiquitous terms really do span chunks inside a bucket
    assert (
        idx.blocks.groupBy("term", "bucket")
        .agg(F.sum("n_docs").alias("nd"))
        .filter(F.col("nd") > ARROW_SLICE_DOCS)
        .count()
        > 0
    )
    invariant(idx.blocks)

    half = docs.limit(ARROW_SLICE_DOCS)
    other = docs.subtract(half)
    a = build_index(half, bucket_span=span)
    b = build_index(other, bucket_span=span)
    invariant(merge_indexes(a, b).blocks)

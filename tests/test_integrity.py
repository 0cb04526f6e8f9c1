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


def _local_digest_term(doc_id: str, content_sha: str | None) -> int:
    """Pure-Python twin of integrity.digest_word_aggs' per-row term:
    sha256(doc_id || '\\n' || coalesce(content_sha, ''))."""
    return int(
        hashlib.sha256(f"{doc_id}\n{content_sha or ''}".encode()).hexdigest(), 16
    )


def test_local_xor_twin(corpus_pdf):
    """The distributed digest equals a pure-Python XOR of the per-row
    digest terms — the 'any engine can recompute it' property, proven
    off-platform."""
    acc = 0
    for i, content in enumerate(corpus_pdf["content"]):
        acc ^= _local_digest_term(str(i), _local_sha(content))
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


def test_null_content_rows_verify_clean_and_digest_distinguishes(spark):
    """sha2(NULL) is NULL: a faithfully round-tripped NULL-content row
    must NOT be a violation (presence flags, not sha NULL-ness, drive
    MISSING/EXTRA), and the set digest must distinguish a NULL-content
    row from that row being absent, and NULL from empty-string."""
    rows = [("a", "hello"), ("b", None), ("c", "")]
    sdf = spark.createDataFrame(rows, "doc_id string, content string")
    fps = integrity.content_fingerprints(sdf)
    assert integrity.verify_content(sdf, fps).count() == 0

    # NULL → non-NULL and non-NULL → NULL are both MISMATCH.
    flipped = spark.createDataFrame(
        [("a", "hello"), ("b", ""), ("c", None)], "doc_id string, content string"
    )
    v = {r["doc_id"]: r["status"] for r in integrity.verify_content(flipped, fps).collect()}
    assert v == {"b": "MISMATCH", "c": "MISMATCH"}

    d_full = integrity.collection_sha_digest(fps)
    d_without_b = integrity.collection_sha_digest(fps.filter(F.col("doc_id") != "b"))
    d_b_empty = integrity.collection_sha_digest(integrity.content_fingerprints(flipped))
    assert len({d_full, d_without_b, d_b_empty}) == 3

    # Duplicate CONTENTS must not cancel out of the digest (the terms
    # bind doc_id, so two identical docs contribute distinct words).
    dup = spark.createDataFrame(
        [("a", "same"), ("b", "same"), ("c", "other")],
        "doc_id string, content string",
    )
    no_dup = spark.createDataFrame([("c", "other")], "doc_id string, content string")
    assert integrity.collection_sha_digest(
        integrity.content_fingerprints(dup)
    ) != integrity.collection_sha_digest(integrity.content_fingerprints(no_dup))


ADVERSARIAL_TEXTS = [
    "",  # empty
    "\x00byte", "a\x00b",  # embedded NUL
    "naïve café",  # latin-1 range
    "日本語のテキスト",  # CJK
    "🦀🚀𝕊𝕡𝕒𝕣𝕜",  # astral plane (4-byte UTF-8)
    "éclair",  # combining accent (NOT normalized — bytes differ from é)
    "שלום",  # RTL Hebrew
    "  ",  # unicode line/paragraph separators
    "tab\tnl\ncr\r mix",
    "￿￾",  # noncharacters
    "x" * 10000,  # long run
]


def test_sha_cross_engine_on_adversarial_unicode(spark):
    """The cross-engine equality claim hinges on all three engines
    hashing the SAME UTF-8 bytes: Spark sha2 == hashlib == DuckDB
    sha256 on empty / NUL / CJK / astral / combining / RTL /
    noncharacter inputs — the encodings where a UTF-16-backed engine
    could diverge."""
    import duckdb

    rows = [(f"d{i}", t) for i, t in enumerate(ADVERSARIAL_TEXTS)]
    sdf = spark.createDataFrame(rows, "doc_id string, content string")
    got = {
        r["doc_id"]: r["content_sha"]
        for r in integrity.content_fingerprints(sdf, text_col="content").collect()
    }
    con = duckdb.connect()
    for doc_id, text in rows:
        assert got[doc_id] == _local_sha(text), repr(text)
        assert (
            con.execute("select sha256(?)", [text]).fetchone()[0] == got[doc_id]
        ), repr(text)


def test_sha_cross_engine_hypothesis(spark):
    """Property form of the above: random unicode batches hash
    identically on Spark and hashlib (one Spark job per example)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(exclude_categories=["Cs"]), max_size=200
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(texts):
        rows = [(f"h{i}", t) for i, t in enumerate(texts)]
        sdf = spark.createDataFrame(rows, "doc_id string, content string")
        got = {
            r["doc_id"]: r["content_sha"]
            for r in integrity.content_fingerprints(sdf, text_col="content").collect()
        }
        for doc_id, text in rows:
            assert got[doc_id] == _local_sha(text), repr(text)

    check()


def test_duckdb_digest_twin(spark, corpus_sdf, tmp_path):
    """The collection digest is recomputable by a DIFFERENT engine from
    the raw parquet alone: DuckDB's sha256 + bit_xor over the same
    formula reproduces Spark's digest bit-for-bit — the engine-portable
    end-to-end property, demonstrated rather than asserted."""
    import duckdb

    src = str(tmp_path / "src.parquet")
    corpus_sdf.select("doc_id", "content").coalesce(1).write.parquet(src)
    spark_digest = integrity.collection_sha_digest(
        integrity.content_fingerprints(corpus_sdf)
    )
    words = ", ".join(
        f"bit_xor(('0x' || substr(h, {1 + 8 * i}, 8))::UBIGINT) AS w{i}"
        for i in range(8)
    )
    row = duckdb.connect().execute(
        f"""
        WITH fp AS (
          SELECT doc_id, sha256(content) AS content_sha FROM '{src}/*.parquet'
        ), t AS (
          SELECT sha256(doc_id || chr(10) || coalesce(content_sha, '')) AS h FROM fp
        )
        SELECT {words} FROM t
        """
    ).fetchone()
    duck_digest = "".join(format(int(w) & 0xFFFFFFFF, "08x") for w in row)
    assert duck_digest == spark_digest


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
        acc[shard_of[doc_id]] ^= _local_digest_term(doc_id, _local_sha(content))
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


def test_compact_preserves_partial_sidecars(spark, corpus_sdf, tmp_path):
    """A pre-sidecar segment in the mix must NOT make compaction drop
    the sidecars that DO exist (they'd be vacuumed with the old segment
    dirs, destroying the invariant permanently).  The compacted segment
    keeps the partial union; uncovered docs surface as MISSING."""
    import shutil

    from terrier_spark.streaming import ingest

    idx_dir = str(tmp_path / "index")
    parts = [
        corpus_sdf.filter(F.abs(F.hash("doc_id")) % 2 == i) for i in range(2)
    ]
    for b, p in enumerate(parts):
        ingest.ingest_batch(p, b, idx_dir, text_col="content", bucket_span=64)
    # Simulate a pre-sidecar (legacy) segment 0.
    shutil.rmtree(str(tmp_path / "index" / "seg_00000000" / "content_sha"))
    with pytest.raises(FileNotFoundError):
        ingest.live_fingerprints(spark, idx_dir)

    ingest.compact(spark, idx_dir)
    fps = ingest.live_fingerprints(spark, idx_dir)  # partial, but present
    n1 = parts[1].count()
    assert fps.count() == n1
    v = ingest.verify_live_content(spark, idx_dir, corpus_sdf)
    statuses = {r["status"] for r in v.collect()}
    assert statuses == {"MISSING"} and v.count() == corpus_sdf.count() - n1


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


# ------------------------------------------------------- LtHash digest


def test_lthash_matches_hashlib_twin(spark, corpus_sdf):
    """The distributed LtHash digest equals a pure-Python lane-sum of
    integrity._lthash_row_lanes — off-platform recomputability for the
    BINDING digest, same property the XOR fold proves in
    test_local_xor_twin."""
    import numpy as np

    fps = integrity.content_fingerprints(corpus_sdf)
    got = integrity.lthash_digest(fps)
    acc = np.zeros(integrity.LTHASH_LANES, dtype=np.uint64)
    for r in fps.collect():
        acc += integrity._lthash_row_lanes(r["doc_id"], r["content_sha"])
    assert got == integrity._lanes_to_hex(acc)
    assert len(got) == integrity.LTHASH_LANES * 4


def test_lthash_order_partition_independent_and_sensitive(spark, corpus_sdf):
    """Same multiset ⇒ same digest regardless of row order or physical
    partitioning; any single-row change ⇒ different digest; empty set ⇒
    the identity."""
    fps = integrity.content_fingerprints(corpus_sdf)
    d1 = integrity.lthash_digest(fps.repartition(7))
    d2 = integrity.lthash_digest(fps.coalesce(1).orderBy(F.desc("doc_id")))
    assert d1 == d2
    doc = fps.orderBy("doc_id").first()["doc_id"]
    tampered = fps.withColumn(
        "content_sha",
        F.when(F.col("doc_id") == doc, F.lit("0" * 64)).otherwise(
            F.col("content_sha")
        ),
    )
    assert integrity.lthash_digest(tampered) != d1
    empty = fps.filter(F.lit(False))
    assert integrity.lthash_digest(empty) == integrity.LTHASH_IDENTITY


def test_lthash_homomorphism(spark, corpus_sdf):
    """combine(digest(A), digest(B)) == digest(A ∪ B) and remove is its
    inverse — per-segment digests compose to the collection digest with
    zero data movement."""
    fps = integrity.content_fingerprints(corpus_sdf)
    a = fps.filter(F.abs(F.hash("doc_id")) % 2 == 0)
    b = fps.filter(F.abs(F.hash("doc_id")) % 2 == 1)
    da, db, dall = (integrity.lthash_digest(x) for x in (a, b, fps))
    assert integrity.lthash_combine(da, db) == dall
    assert integrity.lthash_combine(db, da) == dall
    assert integrity.lthash_remove(dall, da) == db
    assert integrity.lthash_remove(dall, db) == da
    assert integrity.lthash_combine(da, integrity.LTHASH_IDENTITY) == da


def test_lthash_duckdb_twin(spark, corpus_sdf, tmp_path):
    """A DIFFERENT engine recomputes the binding digest from raw parquet
    alone: DuckDB expands each row with string-domain sha256 blocks and
    lane-sums mod 2^16 — bit-identical to Spark's digest.  The
    construction deliberately stays inside sha256-over-strings so this
    twin needs nothing beyond ANSI-ish SQL + sha256."""
    import duckdb

    sub = corpus_sdf.select("doc_id", "content").orderBy("doc_id").limit(40)
    src = str(tmp_path / "src.parquet")
    sub.coalesce(1).write.parquet(src)
    spark_digest = integrity.lthash_digest(
        integrity.content_fingerprints(spark.read.parquet(src))
    )
    rows = duckdb.connect().execute(
        f"""
        WITH fp AS (
          SELECT doc_id, sha256(content) AS content_sha FROM '{src}/*.parquet'
        ), base AS (
          SELECT sha256(coalesce(CAST(doc_id AS VARCHAR), '') || chr(10)
                        || coalesce(content_sha, '')) AS b
          FROM fp
        ), blocks AS (
          SELECT i, sha256(b || ':' || i) AS h
          FROM base, range(0, {integrity.LTHASH_BLOCKS}) t(i)
        ), lanes AS (
          SELECT i * 16 + j AS lane,
                 ('0x' || substr(h, 1 + 4 * j, 4))::INT AS v
          FROM blocks, range(0, 16) u(j)
        )
        SELECT lane, sum(v) % 65536 AS s FROM lanes GROUP BY lane ORDER BY lane
        """
    ).fetchall()
    assert len(rows) == integrity.LTHASH_LANES
    duck_digest = "".join(format(int(s) & 0xFFFF, "04x") for _, s in rows)
    assert duck_digest == spark_digest


def test_lthash_segment_composition(spark, corpus_sdf, tmp_path):
    """Per-segment sidecar digests compose (lthash_combine) to the
    digest of the whole live fingerprint set — the audit a replica runs
    after catch-up: O(segments × 2 KB) exchanged, no rescan of the
    primary."""
    import functools
    import os

    from terrier_spark.operators.index_build import build_index, write_index

    seg_digests = []
    seg_fps = []
    for i in range(3):
        docs = corpus_sdf.filter(F.abs(F.hash("doc_id")) % 3 == i)
        seg_dir = str(tmp_path / f"seg_{i}")
        write_index(build_index(docs), seg_dir, fingerprint_docs=docs)
        fps = integrity.read_fingerprints(spark, seg_dir)
        seg_fps.append(fps)
        seg_digests.append(integrity.lthash_digest(fps))
    combined = functools.reduce(integrity.lthash_combine, seg_digests)
    union = functools.reduce(lambda a, b: a.unionByName(b), seg_fps)
    assert combined == integrity.lthash_digest(union)
    assert combined == integrity.lthash_digest(
        integrity.content_fingerprints(corpus_sdf)
    )


def test_lthash_algebra_properties():
    """Hypothesis pin of the multiset-hash laws on the local kernel
    twin (no Spark — the distributed path equals this twin by
    test_lthash_matches_hashlib_twin): permutation invariance,
    combine = digest of concatenation, remove is combine's inverse,
    identity element, and duplicate rows are NOT absorbed (multiset,
    not set, semantics — the XOR fold's duplicate-cancellation bug
    class is structurally impossible here)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    sha_s = st.one_of(st.none(), st.text("0123456789abcdef", min_size=0, max_size=64))
    row_s = st.tuples(st.one_of(st.integers(0, 2**40), st.text(max_size=8)), sha_s)
    rows_s = st.lists(row_s, max_size=12)

    def digest(rows):
        acc = np.zeros(integrity.LTHASH_LANES, dtype=np.uint64)
        for did, sha in rows:
            acc += integrity._lthash_row_lanes(did, sha)
        return integrity._lanes_to_hex(acc)

    @settings(max_examples=60, deadline=None)
    @given(a=rows_s, b=rows_s, seed=st.randoms())
    def check(a, b, seed):
        da, db = digest(a), digest(b)
        assert integrity.lthash_combine(da, db) == digest(a + b)
        assert integrity.lthash_remove(integrity.lthash_combine(da, db), db) == da
        shuffled = list(a)
        seed.shuffle(shuffled)
        assert digest(shuffled) == da
        assert integrity.lthash_combine(da, integrity.LTHASH_IDENTITY) == da
        if a:
            # a duplicated row changes the digest (multiset semantics)
            assert digest(a + [a[0]]) != da

    check()


def test_lthash_partials_plan_is_shuffle_free(spark, corpus_sdf):
    """The docstring's scale claim, pinned on the physical plan: the
    partial-sum leg is scan → project → mapInPandas with NO Exchange —
    driver state is O(partitions), and nothing reshuffles 100 TB of
    fingerprints to hash them."""
    fps = integrity.content_fingerprints(corpus_sdf)
    plan = (
        integrity._lthash_partials_df(fps)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan

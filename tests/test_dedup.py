"""Dedup operators: exact paths vs brute force, LSH paths vs the exact
path (recall at test scale), hot-shingle cap invariants."""

import pytest

from pyspark.sql import functions as F

from terrier_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


def _pairs(df):
    return {(r["id1"], r["id2"]) for r in df.collect()}


@pytest.fixture(scope="module")
def exact_pairs(docs):
    return _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.12, n=2))


def test_exact_dedup_counts(docs):
    out = dedup.dedup_exact(docs, "doc_id", "text")
    assert out.agg(F.sum("dup_count")).collect()[0][0] == docs.count()
    # survivor is the minimum id of its group
    assert out.filter(F.col("survivor_id").isNull()).count() == 0


def test_minhash_matches_exact_at_high_recall_banding(docs, exact_pairs):
    """64 single-row bands ⇒ per-pair miss prob (1-j)^64 ≈ 3e-4 at the
    0.12 threshold — empirically recall 1.0 on this corpus, and the
    verify step guarantees zero false positives, so the sets are equal."""
    mh = dedup.minhash_lsh_pairs(docs, threshold=0.12, num_perm=64, bands=64, n=2)
    assert _pairs(mh) == exact_pairs


def test_minhash_entry_config_matches_exact(docs):
    """The driver entry's configuration (threshold 0.5, 4 rows × 32
    bands) must equal the exact result — this is the equality the
    exact DuckDB oracle certifies."""
    exact = _pairs(dedup.ngram_jaccard_pairs(docs, threshold=0.5, n=2))
    mh = dedup.minhash_lsh_pairs(docs, threshold=0.5, num_perm=128, bands=32, n=2)
    assert _pairs(mh) == exact


def test_minhash_no_false_positives_any_banding(docs, exact_pairs):
    """Whatever the banding, the exact-Jaccard verify means output ⊆
    the true pair set (banding only affects recall)."""
    mh = dedup.minhash_lsh_pairs(docs, threshold=0.12, num_perm=64, bands=16, n=2)
    assert _pairs(mh) <= exact_pairs


def test_ngram_df_cap_above_max_df_is_identity(docs):
    uncapped = dedup.ngram_jaccard_pairs(docs, threshold=0.12, n=2)
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.12, n=2, max_df=10**9)
    a = sorted(map(tuple, uncapped.collect()))
    b = sorted(map(tuple, capped.collect()))
    assert a == b


def test_ngram_df_cap_is_lower_bound(docs, exact_pairs):
    """An aggressive cap may only LOSE pairs / lower jaccard — never
    invent pairs or raise scores above the uncapped value."""
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.12, n=2, max_df=5)
    uncapped = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.12, n=2).collect()
    }
    for r in capped.collect():
        key = (r["id1"], r["id2"])
        assert key in uncapped
        assert r["jaccard"] <= uncapped[key] + 1e-9


def test_simhash_md5_matches_kernel_on_identical_docs(spark):
    """Both simhash variants must flag exact duplicates (hamming 0) —
    the hash functions differ, the zero-distance contract doesn't."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "a completely different document about spark physical plans"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in (dedup.simhash_pairs, dedup.simhash_pairs_md5):
        got = {(r["id1"], r["id2"]): r["hamming"] for r in fn(df, max_hamming=3).collect()}
        assert got.get((1, 2)) == 0
        assert (1, 3) not in got and (2, 3) not in got


def test_simhash_md5_banding_complete_vs_bruteforce(docs):
    """The 4×15-bit banding must find EVERY pair with hamming ≤ 3
    (pigeonhole) — compare against a driver-side brute force over the
    signatures."""
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash_df_md5(docs).collect()}
    ids = sorted(sig)
    brute = set()
    for i, x in enumerate(ids):
        for y in ids[i + 1 :]:
            if bin(sig[x] ^ sig[y]).count("1") <= 3:
                brute.add((x, y))
    got = _pairs(dedup.simhash_pairs_md5(docs, max_hamming=3))
    assert got == brute


def test_simhash_max_hamming_validation(docs):
    """4-chunk banding is only complete for d ≤ 3 — larger values must
    raise instead of silently losing pairs (ADVICE r2)."""
    for fn in (dedup.simhash_pairs, dedup.simhash_pairs_md5):
        with pytest.raises(ValueError, match="max_hamming"):
            fn(docs, max_hamming=4)


def test_shingle_arrays_ascii_whitespace_matches_jvm():
    """Python shingling must split exactly like the JVM regex \\s+
    (ASCII): a non-breaking space is NOT a separator on either path."""
    texts = ["foo bar baz qux", "a\tb\nc d"]
    got = dedup._shingle_arrays(texts, 2)
    assert set(got[0]) == {"foo bar baz", "baz qux"}
    assert set(got[1]) == {"a b", "b c", "c d"}


def test_pair_ops_leave_no_persisted_rdds(spark, docs):
    """Cache hygiene (VERDICT r2): the LSH/simhash pair operators must
    release every cache they create before returning."""
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    dedup.minhash_lsh_pairs(docs, threshold=0.5, num_perm=128, bands=32, n=2).count()
    dedup.simhash_pairs_md5(docs, max_hamming=3).count()
    assert jsc.getPersistentRDDs().size() == before


def test_vectorized_shingle_hashes_match_string_shingles():
    """The Arrow/numpy shingle-hash kernel (no shingle strings) must
    yield the same per-doc distinct counts and the same pairwise
    Jaccard as the per-doc string shingler twin — equality of the hash
    sets' intersections/unions with the string sets' (injective on
    these corpora; cross-doc equal shingles hash equal by
    construction)."""
    import numpy as np
    import pandas as pd

    texts = [
        "alpha beta gamma alpha beta gamma delta",
        "alpha beta gamma",
        "alpha beta gamma\u00a0delta",  # NBSP is NOT ASCII \\s
        "  leading and trailing  ",
        "one",                                # fewer than n tokens
        "",
        None,
        "Mixed CASE Tokens mixed case tokens",
        "tab\tsplit\nnewline\x0bvtab\x0cff\rcr end",
    ]
    n = 2
    counts, vals = dedup._shingle_hash_batch(pd.Series(texts), n)
    strs = dedup._shingle_arrays(texts, n)
    assert counts.tolist() == [len(s) for s in strs]
    offs = np.r_[0, np.cumsum(counts)]
    hsets = [set(vals[offs[i]:offs[i + 1]].tolist()) for i in range(len(texts))]
    ssets = [set(s.tolist()) for s in strs]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            hi, hu = len(hsets[i] & hsets[j]), len(hsets[i] | hsets[j])
            si, su = len(ssets[i] & ssets[j]), len(ssets[i] | ssets[j])
            assert (hi, hu) == (si, su), (i, j)


def test_fused_kernel_matches_two_pass_band_rows(spark, docs):
    """shingle_band_df (one Arrow pass) must emit exactly the shingle
    hashes of shingle_hash_df AND the band hashes of
    _band_rows_from_hashes — the fused kernel is a fusion, not a
    reimplementation (both call _band_hash_matrix on the same arrays)."""
    n, num_perm, bands, seed = 2, 128, 32, 42
    fused = dedup.shingle_band_df(docs, n, num_perm, bands, seed)
    fused_rows = {r["doc_id"]: (tuple(r["shash"]), tuple(r["bh"])) for r in fused.collect()}

    sh = dedup.shingle_hash_df(docs, n)
    two_pass_sh = {r["doc_id"]: tuple(r["shash"]) for r in sh.collect()}
    band = dedup._band_rows_from_hashes(sh, num_perm, bands, seed)
    two_pass_bh: dict = {}
    for r in band.collect():
        two_pass_bh.setdefault(r["doc_id"], [0] * bands)[r["band"]] = r["bhash"]

    assert set(fused_rows) == set(two_pass_sh)
    for did, (shash, bh) in fused_rows.items():
        assert shash == two_pass_sh[did], did
        if shash:
            assert list(bh) == two_pass_bh[did], did
        else:
            # zero-shingle docs carry an empty band array (the two-pass
            # kernel emits no band rows for them)
            assert bh == () and did not in two_pass_bh


def test_band_hash_matrix_chunking_is_value_invariant():
    """The chunk cap is a memory-locality knob, never a semantic one:
    per-doc band hashes must be identical whether a doc set is
    processed in one chunk or split across many (including docs larger
    than the cap, which get a private chunk)."""
    import numpy as np

    rng = np.random.default_rng(7)
    arrs = [
        rng.integers(-(2**62), 2**62, size=s, dtype=np.int64)
        for s in [3, 11_000, 1, 500, 9_999, 42]  # one doc above the 10k cap
    ]
    counts = np.array([len(a) for a in arrs], dtype=np.int64)
    a_mul, b_add = dedup._band_perm_consts(64, 42)
    got = dedup._band_hash_matrix(arrs, counts, 16, a_mul, b_add)
    # reference: no chunking at all (single big matrix)
    h = np.concatenate(arrs).view(np.uint64)
    m = h[:, None] * a_mul[None, :] + b_add[None, :]
    offs = np.r_[0, np.cumsum(counts[:-1])]
    sig = np.minimum.reduceat(m, offs, axis=0)
    g = sig.reshape(len(arrs), 16, 4)
    mix = np.uint64(0x9E3779B97F4A7C15)
    bh = g[:, :, 0].copy()
    for r in range(1, 4):
        bh = bh * mix + g[:, :, r]
    assert np.array_equal(got, bh.view(np.int64))


def test_fanout_parts_scales_with_bytes_not_cores(spark, docs):
    """Partition fan-out must derive from input size: a kilobyte-scale
    corpus stays at a handful of tasks (not one per core), and the
    count is monotone in the size estimate with a hard floor of 1."""
    parts = dedup._fanout_parts(docs.select("doc_id", "text"))
    assert 1 <= parts < spark.sparkContext.defaultParallelism
    # the math itself: 4 MB min-task, 64 MB max-task, core ceiling
    cores = spark.sparkContext.defaultParallelism
    for est, expect in [
        (1, 1),
        (4 << 20, 1),
        (40 << 20, min(10, cores)),           # 10 x 4 MB tasks, core-capped
        (cores * (4 << 20) * 2, cores),       # lo exceeds cores -> cap
        ((64 << 20) * cores * 3, cores * 3),  # big data: 64 MB/task wins
    ]:
        lo = -(-est // dedup._FANOUT_MIN_TASK_BYTES)
        hi = max(cores, -(-est // dedup._FANOUT_MAX_TASK_BYTES))
        assert max(1, min(lo, hi, cores * 64)) == expect, est


def test_fanout_parts_capped_against_inflated_estimates(spark, docs):
    """Catalyst's non-CBO stats MULTIPLY child sizes through a join, so
    a small corpus joined to a tiny dim can estimate terabytes while
    staying under the 2^50 missing-stats sentinel.  The fan-out must
    stay bounded (64 parts/core), not shuffle into tens of thousands of
    near-empty partitions of scheduling overhead."""
    cores = spark.sparkContext.defaultParallelism
    dim = spark.createDataFrame(
        [(r.doc_id, 1) for r in docs.select("doc_id").limit(50).collect()],
        ["doc_id", "flag"],
    )
    joined = docs.join(dim, "doc_id", "left")
    assert dedup._fanout_parts(joined) <= cores * 64
    # and the pure math: a 1 TB estimate under the sentinel still caps
    est = 1 << 40
    lo = -(-est // dedup._FANOUT_MIN_TASK_BYTES)
    hi = max(cores, -(-est // dedup._FANOUT_MAX_TASK_BYTES))
    assert min(lo, hi) > cores * 64  # would explode without the cap
    assert max(1, min(lo, hi, cores * 64)) == cores * 64


def test_minhash_band_rows_is_one_pass_and_matches_twin(spark, docs):
    """The public minhash_band_rows API now rides the fused kernel +
    JVM posexplode (one Arrow pass) instead of the two-pass
    shingle_hash_df -> _band_rows_from_hashes chain (review finding r4);
    values must be identical to the two-pass twin."""
    n, num_perm, bands, seed = 2, 64, 16, 42
    got = sorted(
        (r["doc_id"], r["band"], r["bhash"])
        for r in dedup.minhash_band_rows(
            docs, n=n, num_perm=num_perm, bands=bands, seed=seed
        ).collect()
    )
    sh = dedup.shingle_hash_df(docs, n)
    exp = sorted(
        (r["doc_id"], r["band"], r["bhash"])
        for r in dedup._band_rows_from_hashes(sh, num_perm, bands, seed).collect()
    )
    assert got == exp
    # one pass: exactly one Python-worker stage (mapInPandas) in the plan
    plan = dedup.minhash_band_rows(docs, n=n, num_perm=num_perm, bands=bands)
    assert plan._jdf.queryExecution().executedPlan().toString().count("MapInPandas") == 1


def test_release_uniq_scratch_reclaims_pair_sets(spark, docs):
    """cleanup=True pair sets materialize to per-call scratch parquet;
    release_uniq_scratch() reclaims them in-process (review finding r4:
    a long-lived driver otherwise grows the tempdir — RAM under a tmpfs
    TMPDIR — until exit).  The registry is swapped out and restored so
    other tests' still-live scratch results are untouched."""
    import os

    from terrier_spark.plans import relational as R

    from terrier_spark.plans import textqueries as T

    saved = R._UNIQ_DIRS[:]
    del R._UNIQ_DIRS[:]
    # The sweep also evicts+deletes the IVF layout cache (ADVICE r4);
    # park other tests' entries so their dirs survive and the count
    # below sees only this test's pair-set dirs.
    saved_ivf = dict(T._IVF_CACHE)
    T._IVF_CACHE.clear()
    try:
        pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5, num_perm=16, bands=8)
        pairs.count()
        created = R._UNIQ_DIRS[:]
        assert created and all(os.path.isdir(d) for d in created)
        assert R.release_uniq_scratch() == len(created)
        assert not R._UNIQ_DIRS
        assert not T._IVF_CACHE
        assert all(not os.path.exists(d) for d in created)
    finally:
        R._UNIQ_DIRS.extend(saved)
        T._IVF_CACHE.update(saved_ivf)

"""Similarity search: pandas path vs built-in path, IVF recall vs brute
force, hyperplane-LSH near-dup recall/precision at test-scale banding."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from terrier_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0])


def test_pandas_path_matches_builtin(emb, qvec):
    a = similarity.cosine_topk(emb, qvec, k=15).collect()
    b = similarity.cosine_topk_pandas(emb, qvec, k=15).collect()
    assert [r["vec_id"] for r in a] == [r["vec_id"] for r in b]
    for x, y in zip(a, b):
        assert abs(x["cos"] - y["cos"]) < 1e-8


def test_ivf_full_probe_is_exact(emb, qvec):
    cents = similarity.train_centroids(emb, n_centroids=8, sample=512)
    assigned = similarity.ivf_assign(emb, cents).persist()
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, qvec, k=25).collect()]
    full = [
        r["vec_id"]
        for r in similarity.ivf_topk(assigned, cents, qvec, k=25, nprobe=8).collect()
    ]
    assert full == exact


def test_ivf_partial_probe_recall(emb, qvec):
    cents = similarity.train_centroids(emb, n_centroids=8, sample=512)
    assigned = similarity.ivf_assign(emb, cents).persist()
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, qvec, k=25).collect()}
    approx = {
        r["vec_id"]
        for r in similarity.ivf_topk(assigned, cents, qvec, k=25, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    # The test embeddings are near-uniform (max pairwise cos ≈ 0.51), so
    # true neighbors scatter across clusters and IVF recall ≈ the
    # scanned fraction (~nprobe/C ≈ 0.42 here) — the honest floor for
    # unclusterable data.  On clustered data recall is far higher; the
    # assertion checks IVF at least earns its scan budget.
    assert recall >= 0.3, f"IVF nprobe=3/8 recall {recall}"


def _brute_pairs(emb, threshold):
    rows = emb.select("vec_id", "embedding").collect()
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    norms = np.linalg.norm(m, axis=1)
    cos = (m @ m.T) / np.outer(norms, norms)
    out = set()
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if round(cos[i, j], 9) >= threshold:
                a, b = ids[i], ids[j]
                out.add((min(a, b), max(a, b)))
    return out


def test_neardup_lsh_equals_bruteforce_at_test_banding(emb):
    got = {
        (r["id1"], r["id2"])
        for r in similarity.embedding_neardup_pairs(
            emb, threshold=0.4, bits_per_band=2, n_bands=32
        ).collect()
    }
    assert got == _brute_pairs(emb, 0.4)


def test_neardup_lsh_no_false_positives_tight_banding(emb):
    """Coarser banding (fewer bands) can only lose pairs — the exact
    verify forbids false positives."""
    got = {
        (r["id1"], r["id2"])
        for r in similarity.embedding_neardup_pairs(
            emb, threshold=0.4, bits_per_band=8, n_bands=2
        ).collect()
    }
    assert got <= _brute_pairs(emb, 0.4)


def test_ivf_written_layout_partition_prunes(spark, emb, qvec, tmp_path):
    """The probe over a write_ivf_index layout must be a planning-time
    partition prune: PartitionFilters on the scan, and only nprobe of
    the 8 cluster directories' files actually read."""
    cents = similarity.train_centroids(emb, n_centroids=8, sample=512)
    assigned = similarity.ivf_assign(emb, cents)
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(assigned, cents, path)
    vecs, cents2 = similarity.load_ivf_index(spark, path)
    assert np.allclose(cents, cents2)

    top = similarity.ivf_topk(vecs, cents2, qvec, k=25, nprobe=3)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan

    q = np.asarray(qvec, dtype=np.float64)
    d = ((cents2 - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d)[:3]]
    cand = vecs.filter(F.col("cluster").isin(probe))
    files_read = cand.select(F.input_file_name()).distinct().count()
    files_total = vecs.select(F.input_file_name()).distinct().count()
    assert files_read < files_total, (files_read, files_total)

    # Pruned result == in-memory-filter result (same probes, same rows).
    unpruned = similarity.ivf_topk(assigned, cents, qvec, k=25, nprobe=3)
    assert [tuple(r) for r in top.collect()] == [
        tuple(r) for r in unpruned.collect()
    ]


def test_zero_norm_vectors_rank_last_on_both_paths(spark):
    """Zero-norm vectors (cosine undefined) must rank LAST on both the
    JVM and pandas paths (review finding r4: numpy 0/0 yielded NaN,
    which pandas sorts last locally but Spark's final orderBy ranks
    FIRST — an all-zeros padding row silently took rank 1 on the
    pandas/IVF path while the JVM path ranked it last)."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 0.0]),  # zero norm
        (3, [0.5, 0.5]),
        (4, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = [1.0, 0.0]
    jvm = similarity.cosine_topk(df, q, k=4).collect()
    pnd = similarity.cosine_topk_pandas(df, q, k=4).collect()
    assert [r["vec_id"] for r in jvm] == [1, 3, 4, 2]
    assert [r["vec_id"] for r in pnd] == [1, 3, 4, 2]
    assert jvm[-1]["cos"] == float("-inf") and pnd[-1]["cos"] == float("-inf")
    # and with k smaller than the corpus the zero vector never displaces
    # a genuine neighbor — the original failure was at rank 1
    assert [r["vec_id"] for r in similarity.cosine_topk_pandas(df, q, k=1).collect()] == [1]


def test_string_ids_supported_by_pandas_and_ivf_paths(spark):
    """cosine_topk_pandas / ivf_assign / embedding_neardup_pairs took
    id_col as a parameter but hardcoded `long` in their Arrow output
    schemas (review finding r4) — string vec ids crashed at runtime on
    every path except the JVM one."""
    rows = [("a", [1.0, 0.0]), ("b", [0.9, 0.1]), ("c", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    got = similarity.cosine_topk_pandas(df, [1.0, 0.0], k=2, id_col="doc_id").collect()
    assert [r["vec_id"] for r in got] == ["a", "b"]
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    assigned = similarity.ivf_assign(df, cents, id_col="doc_id")
    assert {r["doc_id"] for r in assigned.collect()} == {"a", "b", "c"}
    pairs = similarity.embedding_neardup_pairs(
        df, threshold=0.9, bits_per_band=2, n_bands=8, id_col="doc_id"
    )
    assert {(r["id1"], r["id2"]) for r in pairs.collect()} == {("a", "b")}


def test_neardup_pairs_empty_input_returns_empty(spark):
    """embedding_neardup_pairs on an empty frame returns an empty pair
    set instead of raising TypeError on first() (review finding r4)."""
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = similarity.embedding_neardup_pairs(df)
    assert out.columns == ["id1", "id2", "cos"]
    assert out.count() == 0


def test_ivf_entry_layout_memoized(spark):
    """_ivf_index trains/writes the partitioned layout ONCE per
    (application, sf_dir): emb_ivf_topk and emb_ivf_full used to each
    rebuild it into the same overwritten path, invalidating the other
    entry's lazily-scanned files (review finding r4)."""
    from terrier_spark.plans import textqueries as T

    a = T._ivf_index(spark, SF_DIR)
    b = T._ivf_index(spark, SF_DIR)
    assert a is b


def test_release_uniq_scratch_invalidates_ivf_cache(spark):
    """ADVICE r4: release_uniq_scratch() used to delete the IVF layout
    parquet while plans/textqueries._IVF_CACHE still held lazy readers
    over it — a driver honoring the documented contract for ITS frames
    broke later emb_ivf_* calls.  Now the sweep clears the cache (and
    deletes the layouts it owned), so the next call REBUILDS and
    queries cleanly."""
    import os

    from terrier_spark.plans import relational as R
    from terrier_spark.plans import textqueries as T

    a = T._ivf_index(spark, SF_DIR)
    path_a = a[3]
    assert os.path.isdir(path_a)
    R.release_uniq_scratch()
    assert not T._IVF_CACHE
    assert not os.path.exists(path_a)
    b = T._ivf_index(spark, SF_DIR)
    assert b is not a
    assert T.emb_ivf_full(spark, SF_DIR).count() == 25


def test_emb_ivf_topk_oracle_parity(spark):
    """The published-centroid DuckDB oracle (VERDICT r5: the last
    rows-only entry made exact) matches the Spark entry value-for-value
    at sf0.001 — same comparison the driver runs at sf0.01.  The oracle
    recomputes assignment + probe + cosine rank from the published
    centroids alone, so equality certifies ivf_assign, the partitioned
    write/reload, the probe set, and the scoring path."""
    import duckdb

    from terrier_spark.plans import textqueries as T
    from terrier_spark.plans.oracles import ORACLES

    got = [
        (r["vec_id"], round(r["cos"], 9))
        for r in T.emb_ivf_topk(spark, SF_DIR).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    exp = [
        (r[0], round(r[1], 9))
        for r in con.execute(ORACLES["emb_ivf_topk"]).fetchall()
    ]
    assert got == exp

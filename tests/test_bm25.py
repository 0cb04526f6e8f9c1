import pytest

from terrier_spark import oracle
from terrier_spark.operators.score import bm25_topk_blocks, bm25_topk_exploded

QUERIES = [
    "int",                                # hottest term
    "int return",                         # two hot terms
    "foo_bar the",                        # identifier + hot
    "Int RETURN int",                     # mixed case + dup (normalization)
    "zzz_absent int",                     # absent + present
    "zzz_absent",                         # fully absent
    "",                                   # empty
    "template namespace static sizeof",   # per-lang keywords
    "node_list_map key0 idx",             # rarer identifiers
]


def _check(got_rows, exp, k=10):
    got = [(r["doc_id"], r["score"]) for r in got_rows]
    assert [d for d, _ in got] == [d for d, _ in exp], (got[:3], exp[:3])
    for (_, a), (_, b) in zip(got, exp):
        assert abs(a - b) < 1e-9


@pytest.mark.parametrize("query", QUERIES)
def test_exploded_rank_identical(spark_index, oracle_index, query):
    exp = oracle.bm25_topk(oracle_index, query, 10)
    _check(bm25_topk_exploded(spark_index, query, 10).collect(), exp)


@pytest.mark.parametrize("query", QUERIES)
def test_blocks_rank_identical(spark_index, oracle_index, query):
    exp = oracle.bm25_topk(oracle_index, query, 10)
    _check(bm25_topk_blocks(spark_index, query, 10).collect(), exp)


@pytest.mark.parametrize(
    "query", ["int return", "foo_bar the", "zzz_absent int", "int", "node_list_map key0 idx"]
)
def test_conjunctive_rank_identical(spark_index, oracle_index, query):
    from terrier_spark.operators.score import bm25_topk_conjunctive

    exp = oracle.bm25_topk_and(oracle_index, query, 10)
    _check(bm25_topk_conjunctive(spark_index, query, 10).collect(), exp)


@pytest.mark.parametrize("query", ["int return", "foo_bar the int for", "node_list_map key0 idx"])
def test_wand_prune_matches_full_scan(spark_index, query):
    """Block-max pruning must be invisible: same docs, same exact scores."""
    pruned = bm25_topk_blocks(spark_index, query, 10, prune=True).collect()
    full = bm25_topk_blocks(spark_index, query, 10, prune=False).collect()
    assert [(r["doc_id"], r["score"]) for r in pruned] == [
        (r["doc_id"], r["score"]) for r in full
    ]


def test_k_larger_than_corpus(spark_index, oracle_index):
    exp = oracle.bm25_topk(oracle_index, "int", 10_000)
    _check(bm25_topk_blocks(spark_index, "int", 10_000).collect(), exp)


def test_batch_rank_identical_per_query(spark_index, oracle_index):
    """ir_bm25_batch's one-pass evaluation must be rank-identical per
    query to the single-query oracle — including empty / fully-absent
    queries contributing zero rows."""
    from terrier_spark.operators.score import bm25_topk_batch

    qset = {f"q{i}": q for i, q in enumerate(QUERIES)}
    rows = bm25_topk_batch(spark_index, qset, 10).collect()
    by_qid: dict[str, list] = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    for qid, query in qset.items():
        exp = oracle.bm25_topk(oracle_index, query, 10)
        got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        _check(got, exp)
        assert [r["rank"] for r in got] == list(range(1, len(exp) + 1))


def test_batch_empty_query_set(spark_index):
    from terrier_spark.operators.score import bm25_topk_batch

    assert bm25_topk_batch(spark_index, {}, 10).count() == 0


@pytest.mark.parametrize("query", QUERIES)
def test_single_query_batch_path_rank_identical(spark_index, oracle_index, query):
    """bm25_topk — the low-latency single-query path through the batch
    kernel (VERDICT r3 item 7) — must rank identically to the oracle."""
    from terrier_spark.operators.score import bm25_topk

    got = bm25_topk(spark_index, query, 10).collect()
    _check(got, oracle.bm25_topk(oracle_index, query, 10))


def test_aqe_window_is_refcounted_not_serialized(spark):
    """_aqe_disabled (review finding r4): concurrent entrants share one
    refcounted AQE-off window instead of serializing behind a lock that
    spanned the scoring collect.  All four threads must be INSIDE the
    window simultaneously (the barrier would time out under the old
    whole-body lock), nesting must not restore early, and the last exit
    restores the original value exactly once."""
    import threading

    from terrier_spark.operators.score import _aqe_disabled

    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key, "true")
    spark.conf.set(key, "true")
    try:
        # nesting: inner exit must not restore early
        with _aqe_disabled(spark):
            assert spark.conf.get(key) == "false"
            with _aqe_disabled(spark):
                assert spark.conf.get(key) == "false"
            assert spark.conf.get(key) == "false"
        assert spark.conf.get(key) == "true"

        barrier = threading.Barrier(4, timeout=30)
        seen = []

        def worker():
            with _aqe_disabled(spark):
                barrier.wait()  # proves no serialization across the body
                seen.append(spark.conf.get(key))

        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert seen == ["false"] * 4
        assert spark.conf.get(key) == "true"
    finally:
        spark.conf.set(key, orig)


def test_lexicon_cache_gate_reads_meta_not_a_count_job(
    spark, corpus_sdf, tmp_path
):
    """VERDICT r4 item 5: the vocabulary size is computed for free on
    the build's own stats action (count_distinct(term) in the same agg)
    and persisted in stats.json, so the scorer's driver-lexicon-cache
    gate never launches a count() job on the first warm query.
    Poison-pill the lexicon handle's count to prove the gate no longer
    calls it, on both a fresh build and a written/loaded index; a
    merged index (lazy lexicon — vocab size genuinely unknown) keeps
    the documented fallback."""
    from terrier_spark.operators import score
    from terrier_spark.operators.index_build import (
        build_index, load_index, merge_indexes, write_index,
    )

    def boom():
        raise AssertionError("lexicon.count() ran: gate ignored n_terms")

    idx = build_index(corpus_sdf)
    assert idx.n_terms == idx.lexicon.count()  # meta IS the vocab size
    idx.lexicon.count = boom  # instance attr shadows the method
    dfs = score._lexicon_dfs(idx, ["int", "return", "zzz_absent"])
    assert dfs["int"] > 0 and "zzz_absent" not in dfs

    out = str(tmp_path / "nterms_idx")
    idx.lexicon.count = None
    del idx.lexicon.count
    write_index(idx, out)
    loaded = load_index(spark, out)
    assert loaded.n_terms == idx.n_terms  # round-trips through stats.json
    loaded.lexicon.count = boom
    assert score._lexicon_dfs(loaded, ["int"])["int"] == dfs["int"]

    merged = merge_indexes(idx, loaded)
    assert merged.n_terms is None  # lazy lexicon: honest unknown
    assert score._lexicon_dfs(merged, ["int"])["int"] == 2 * dfs["int"]

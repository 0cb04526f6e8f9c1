"""Segment merge: two half-corpus indexes merged must carry the exact
full-corpus statistics and produce oracle-identical BM25 scores."""

import pytest

from pyspark.sql import functions as F

from terrier_spark import oracle
from terrier_spark.operators.index_build import build_index, merge_indexes
from terrier_spark.operators.score import bm25_topk_blocks, bm25_topk_exploded


@pytest.fixture(scope="module")
def merged(corpus_sdf):
    half = F.pmod(F.xxhash64("doc_id"), F.lit(2))
    a = build_index(corpus_sdf.filter(half == 0), text_col="content")
    b = build_index(corpus_sdf.filter(half == 1), text_col="content")
    assert a.bucket_span == b.bucket_span
    return merge_indexes(a, b)


def test_merge_stats_match_full_build(merged, oracle_index):
    assert merged.num_docs == oracle_index.num_docs
    assert merged.num_tokens == oracle_index.num_tokens
    assert abs(merged.avgdl - oracle_index.avgdl) < 1e-9
    lex = {r["term"]: (r["df"], r["cf"]) for r in merged.lexicon.collect()}
    assert lex == {t: (oracle_index.df[t], oracle_index.cf[t]) for t in oracle_index.df}


def test_merge_docmap_disjoint_and_complete(merged, corpus_sdf):
    rows = merged.docmap.collect()
    assert len(rows) == corpus_sdf.count()
    assert len({r["docno"] for r in rows}) == len(rows)
    assert len({r["doc_id"] for r in rows}) == len(rows)


def test_merged_bm25_scores_match_oracle(merged, oracle_index):
    """Scores are exactly the full-corpus scores (doc set + values);
    ordering ties could differ (docno order is segment-major after a
    merge), so compare as a doc→score map over the top-k."""
    q = "int return foo_bar"
    exp = dict(oracle.bm25_topk(oracle_index, q, 10))
    for fn in (bm25_topk_exploded, bm25_topk_blocks):
        got = {r["doc_id"]: r["score"] for r in fn(merged, q, 10).collect()}
        assert set(got) == set(exp), fn.__name__
        for d in exp:
            assert abs(got[d] - exp[d]) <= 1e-9


def test_merge_guards(corpus_sdf):
    a = build_index(corpus_sdf.limit(40), text_col="content")
    s = build_index(corpus_sdf.limit(40), text_col="content", stem=True)
    with pytest.raises(ValueError, match="stemmed"):
        merge_indexes(a, s)

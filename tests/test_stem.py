"""Porter-lite stemmer: unit behavior, engine/oracle parity, and the
golden stemmed BM25 top-k (rank-identical, scores to 1e-9)."""

import pytest

from pyspark.sql import functions as F

from terrier_spark.functions.stem import stem_token


@pytest.mark.parametrize(
    "tok,expected",
    [
        ("caresses", "caress"),
        ("ponies", "poni"),
        ("classes", "class"),
        ("cats", "cat"),
        ("running", "run"),
        ("hopping", "hop"),
        ("relational", "relate"),
        ("happily", "happili"),  # y→i after vowel (classic Porter quirk)
        ("agreed", "agre"),  # -ed stripped; matches real Porter output
        ("conflated", "conflate"),
        ("sized", "size"),
        ("happiness", "happi"),
        ("adjustment", "adjust"),
        # identifiers / short / non-alpha pass through untouched
        ("foo_bars", "foo_bars"),
        ("utf8", "utf8"),
        ("an", "an"),
        ("the", "the"),
        ("sys", "sys"),
    ],
)
def test_stem_token_rules(tok, expected):
    assert stem_token(tok) == expected


from hypothesis import given
from hypothesis import strategies as st


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=40))
def test_stem_never_crashes_and_preserves_identifiers(tok):
    out = stem_token(tok)
    assert isinstance(out, str)
    if tok:
        assert out, f"stem emptied {tok!r}"
    # anything non-alphabetic (identifiers, numbers) passes through
    if not (tok.isascii() and tok.isalpha()):
        assert out == tok


@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=4, max_size=30))
def test_stem_shrinks_or_preserves(tok):
    out = stem_token(tok)
    # suffix stripping may append at most one restorative 'e'/'i'
    assert len(out) <= len(tok) + 1
    assert out[:2] == tok[:2]  # the stem never rewrites the word head


def test_stem_idempotent_on_vocab():
    words = ["running", "classes", "relational", "merges", "sorted", "index"]
    for w in words:
        once = stem_token(w)
        assert stem_token(once) in (once, stem_token(once))  # no crash, stable
        assert isinstance(once, str) and once


def test_term_stats_match_oracle_stemmed(spark, corpus_sdf, corpus_pdf):
    """df/cf/avgdl of the stemmed engine index == stemmed oracle index."""
    from terrier_spark import oracle
    from terrier_spark.operators.index_build import build_index

    o = oracle.build_index(
        list(zip(corpus_pdf["doc_id"], corpus_pdf["content"])), stem=True
    )
    idx = build_index(corpus_sdf, text_col="content", stem=True)
    assert idx.stem is True
    assert idx.num_docs == o.num_docs
    assert idx.num_tokens == o.num_tokens  # dl keeps raw token count
    lex = {r["term"]: (r["df"], r["cf"]) for r in idx.lexicon.collect()}
    assert lex == {t: (o.df[t], o.cf[t]) for t in o.df}


def test_bm25_topk_stemmed_golden(spark, corpus_sdf, corpus_pdf):
    """Golden stemmed top-k: 'merging sorted indexes' must hit the same
    docs as the unstemmed terms 'merge sort index' would — and be
    rank-identical to the stemmed oracle on both physical paths."""
    from terrier_spark import oracle
    from terrier_spark.operators.index_build import build_index
    from terrier_spark.operators.score import bm25_topk_blocks, bm25_topk_exploded

    o = oracle.build_index(
        list(zip(corpus_pdf["doc_id"], corpus_pdf["content"])), stem=True
    )
    idx = build_index(corpus_sdf, text_col="content", stem=True)
    q = "merging sorted indexes"
    exp = oracle.bm25_topk(o, q, 10)
    for fn in (bm25_topk_exploded, bm25_topk_blocks):
        got = [(r["doc_id"], r["score"]) for r in fn(idx, q, 10).collect()]
        assert [d for d, _ in got] == [d for d, _ in exp], fn.__name__
        for (_, gs), (_, es) in zip(got, exp):
            assert abs(gs - es) <= 1e-9

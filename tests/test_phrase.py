"""Positional postings + phrase queries: position correctness vs an
exploded JVM twin, overlapping/repeated-term occurrence counting, and
edge semantics (absent phrase, separators, single term)."""

import pytest

from pyspark.sql import functions as F

from terrier_spark.operators.phrase import (
    phrase_match,
    phrase_terms,
    positional_postings,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "quick brown, quick brown... QUICK   brown"),  # separators + case
        (3, "foo bar foo bar foo"),  # overlapping repeated-term runs
        (4, "batch batch batch"),
        (5, "brown quick"),  # both terms, wrong order
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_positions_match_exploded_twin(spark, docs):
    """Kernel positions == posexplode of the pinned JVM tokenizer."""
    from terrier_spark.functions.tokenize import tokens

    got = {
        (r["doc_id"], r["term"]): list(r["positions"])
        for r in positional_postings(docs, text_col="text").collect()
    }
    exp_rows = (
        docs.select("doc_id", F.posexplode(tokens("text")).alias("pos", "term"))
        .groupBy("doc_id", "term")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        .collect()
    )
    exp = {(r["doc_id"], r["term"]): list(r["positions"]) for r in exp_rows}
    assert got == exp


def test_dl_counts_kept_tokens(docs):
    dls = {
        r["doc_id"]: r["dl"]
        for r in positional_postings(docs, text_col="text").collect()
    }
    assert dls[1] == 9 and dls[2] == 6 and dls[4] == 3


def test_phrase_basic_and_separator_insensitive(docs):
    m = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_match(docs, "quick brown", text_col="text").collect()
    }
    # punctuation/whitespace between tokens doesn't break adjacency
    assert m == {1: 1, 2: 3}


def test_phrase_repeated_term_overlapping(docs):
    m = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_match(docs, "foo bar foo", text_col="text").collect()
    }
    assert m == {3: 2}  # positions 0 and 2 both anchor a match
    m2 = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_match(docs, "batch batch", text_col="text").collect()
    }
    assert m2 == {4: 2}


def test_phrase_wrong_order_no_match(docs):
    m = phrase_match(docs, "dog lazy", text_col="text").collect()
    assert m == []


def test_single_term_phrase(docs):
    m = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_match(docs, "quick", text_col="text").collect()
    }
    assert m == {1: 1, 2: 3, 5: 1}


def test_empty_phrase_raises(docs):
    with pytest.raises(ValueError):
        phrase_match(docs, "...", text_col="text")
    assert phrase_terms("Foo-Bar baz") == ["foo", "bar", "baz"]


def test_postings_reuse(docs):
    pp = positional_postings(docs, text_col="text").persist()
    try:
        a = phrase_match(docs, "quick brown", text_col="text").collect()
        b = phrase_match(docs, "quick brown", postings=pp).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    finally:
        pp.unpersist()

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


# ------------------------------------------------- positional block index

@pytest.fixture(scope="module")
def pos_index(spark, docs):
    from terrier_spark.operators.index_build import build_index

    idx = build_index(docs, id_col="doc_id", text_col="text", positions=True)
    yield idx
    for h in (idx.blocks, idx.lexicon):
        try:
            h.unpersist()
        except Exception:
            pass


def _match_dict(df):
    return {r["doc_id"]: r["n_occ"] for r in df.collect()}


def test_indexed_phrase_equals_postings_path(docs, pos_index):
    from terrier_spark.operators.phrase import phrase_match_indexed

    for q in ["quick brown", "foo bar foo", "batch batch", "the lazy dog",
              "brown quick", "quick", "nosuchterm quick"]:
        exp = _match_dict(phrase_match(docs, q, text_col="text"))
        got = _match_dict(phrase_match_indexed(pos_index, q))
        assert got == exp, q


def test_positional_index_rank_identical_bm25(spark, docs, pos_index):
    """pos_blob is additive: tf/dl streams and BM25 ranks are unchanged
    vs a positions=False build of the same docs."""
    from terrier_spark.operators.index_build import build_index
    from terrier_spark.operators.score import bm25_topk_blocks

    base = build_index(docs, id_col="doc_id", text_col="text")
    q = "quick brown fox"
    got = [(r["doc_id"], r["score"]) for r in bm25_topk_blocks(pos_index, q, 5).collect()]
    exp = [(r["doc_id"], r["score"]) for r in bm25_topk_blocks(base, q, 5).collect()]
    assert got == exp and len(got) > 0
    for h in (base.blocks, base.lexicon):
        h.unpersist()


def test_positional_write_load_merge_roundtrip(spark, tmp_path_factory):
    """Segmented positional indexes: write/load keeps pos_blob + the
    positions flag; a merged pair answers phrases identically to a
    single build over the union."""
    from terrier_spark.operators.index_build import (
        build_index, load_index, merge_indexes, write_index,
    )
    from terrier_spark.operators.phrase import phrase_match_indexed

    rows_a = [(i, f"alpha beta gamma doc{i} alpha beta") for i in range(1, 9)]
    rows_b = [(i, f"beta alpha beta gamma{i}") for i in range(9, 17)]
    a = spark.createDataFrame(rows_a, "doc_id long, text string")
    b = spark.createDataFrame(rows_b, "doc_id long, text string")
    span = 1 << 18
    d = tmp_path_factory.mktemp("posidx")
    ia = build_index(a, id_col="doc_id", text_col="text",
                     positions=True, bucket_span=span)
    write_index(ia, str(d / "a"))
    la = load_index(spark, str(d / "a"))
    assert la.positions and "pos_blob" in la.blocks.columns
    ib = build_index(b, id_col="doc_id", text_col="text",
                     positions=True, bucket_span=span)
    merged = merge_indexes(la, ib)
    assert merged.positions
    full = build_index(a.unionByName(b), id_col="doc_id", text_col="text",
                       positions=True, bucket_span=span)
    for q in ["alpha beta", "beta gamma", "alpha beta gamma"]:
        got = _match_dict(phrase_match_indexed(merged, q))
        exp = _match_dict(phrase_match_indexed(full, q))
        assert got == exp, q


def test_positions_require_aligned_build(spark):
    from terrier_spark.operators.index_build import build_index

    bad = spark.createDataFrame(
        [("zz-not-hex", "alpha beta")], "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="positions=True requires"):
        build_index(bad, id_col="doc_id", text_col="text", positions=True)


def test_phrase_topk_ranks_matching_docs(spark, docs, pos_index):
    """phrase_topk = BM25 over the phrase terms, restricted to docs the
    phrase actually matches; rank-identical to the python oracle
    filtered the same way."""
    from terrier_spark import oracle
    from terrier_spark.operators.phrase import phrase_topk

    rows = docs.collect()
    o = oracle.build_index([(str(r["doc_id"]), r["text"] or "") for r in rows])
    q = "quick brown"
    matched = set(_match_dict(phrase_match(docs, q, text_col="text")))
    exp = [
        (int(d), s) for d, s in oracle.bm25_topk(o, q, 10) if int(d) in matched
    ][:3]
    got = [
        (r["doc_id"], r["score"])
        for r in phrase_topk(pos_index, q, 3).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-8
    # every returned doc really contains the phrase
    assert {d for d, _ in got} <= matched


def test_stemmed_positional_index_phrase_and_positions(spark):
    """stem=True positional path: codes are remapped to stemmed vocab
    BEFORE the positional sort, so conflated terms' position runs must
    come out merge-sorted (searchsorted in the phrase kernel relies on
    per-posting ascending positions).  Also pins Terrier's stemmed
    phrase semantics: query terms stem, adjacency applies to raw
    positions."""
    import numpy as np

    from terrier_spark.operators.compress import (
        decode_positions, decode_posting_list,
    )
    from terrier_spark.operators.index_build import build_index
    from terrier_spark.operators.phrase import phrase_match_indexed

    rows = [
        # 'running'/'runs'/'run' all stem to 'run': doc 1 interleaves
        # them so the merged position run exercises the merge-sort
        (1, "running fast runs faster run fastest running"),
        (2, "jumped high jumping higher"),
        (3, "fast running"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(
        docs, id_col="doc_id", text_col="text", positions=True, stem=True
    )
    # positions of stemmed 'run' in doc 1 = merged occurrences of all
    # three surface forms, strictly ascending
    blk = idx.blocks.filter(F.col("term") == "run").collect()
    assert blk, "stemmed term missing from positional blocks"
    got_pos = {}
    for row in blk:
        dns, tfs = decode_posting_list(bytes(row["docno_blob"]), bytes(row["tf_blob"]))
        pos = decode_positions(bytes(row["pos_blob"]), tfs)
        off = 0
        for dn, tf in zip(dns, tfs):
            tf = int(tf)
            got_pos[int(dn)] = pos[off:off + tf].tolist()
            off += tf
    # doc_id 1 -> docno 0 (ids sorted); kept-token positions 0,2,4,6
    assert got_pos[0] == [0, 2, 4, 6]
    assert all(
        all(a < b for a, b in zip(p, p[1:])) for p in got_pos.values()
    ), "merged stemmed position runs must be strictly ascending"
    # stemmed phrase: "runs fast" stems to (run, fast); adjacency on raw
    # positions matches doc 1 ("running fast") and doc... doc 3 is
    # "fast running" (wrong order) -> only doc 1
    m = {r["doc_id"]: r["n_occ"] for r in phrase_match_indexed(idx, "runs fast").collect()}
    assert m == {1: 1}
    # reversed phrase: doc 3, and doc 1 via its fast@1 -> run@2 pair
    m2 = {r["doc_id"]: r["n_occ"] for r in phrase_match_indexed(idx, "fast running").collect()}
    assert m2 == {1: 1, 3: 1}
    for h in (idx.blocks, idx.lexicon):
        h.unpersist()


def _brute_min_span(text, terms):
    """Reference min-window: smallest token span containing all terms."""
    toks = phrase_terms(text)  # pinned tokenizer, whole doc
    best = None
    occ = [(i, t) for i, t in enumerate(toks) if t in terms]
    for j, (pj, tj) in enumerate(occ):
        seen = {}
        for i in range(j, -1, -1):
            pi, ti = occ[i]
            seen[ti] = pi
            if len(seen) == len(terms):
                span = pj - pi + 1
                best = span if best is None else min(best, span)
                break
    return best


def test_proximity_unordered_window(spark, docs, pos_index):
    """proximity_match_indexed == brute-force min-window twin over the
    pinned tokenizer, for every doc and several windows."""
    from terrier_spark.operators.phrase import proximity_match_indexed

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for q in ["quick dog", "foo bar", "the lazy", "quick brown fox"]:
        terms = set(phrase_terms(q))
        exp_span = {
            d: _brute_min_span(t, terms)
            for d, t in texts.items()
            if _brute_min_span(t, terms) is not None
        }
        for w in (1, 2, 3, 5, 9, 50):
            got = {
                r["doc_id"]: r["min_span"]
                for r in proximity_match_indexed(pos_index, q, w).collect()
            }
            exp = {d: s for d, s in exp_span.items() if s <= w}
            assert got == exp, (q, w, got, exp)


def test_proximity_requires_positions(spark, docs):
    from terrier_spark.operators.index_build import build_index
    from terrier_spark.operators.phrase import proximity_match_indexed

    idx = build_index(docs, id_col="doc_id", text_col="text")
    with pytest.raises(ValueError, match="without positions"):
        proximity_match_indexed(idx, "quick brown", 4)
    for h in (idx.blocks, idx.lexicon):
        h.unpersist()

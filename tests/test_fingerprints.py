"""Winnowing fingerprints: the shared-substring guarantee (docs sharing
a run of ≥ w+k-1 chars share ≥ 1 fingerprint), disjointness for
unrelated docs, and Arrow-kernel ≡ SQL-shape-plan equivalence (the
kernel is the scale path; the JVM window plan is the cross-check)."""

import pytest

from pyspark.sql import functions as F

from terrier_spark.functions.text_stats import (
    winnowing_fingerprints,
    winnowing_fingerprints_sql_shape,
)

K, W = 8, 16

IMPLS = {
    "arrow": winnowing_fingerprints,
    "sql_shape": winnowing_fingerprints_sql_shape,
}


def _fps(df, impl):
    out = {}
    for r in IMPLS[impl](df, k=K, w=W).collect():
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


@pytest.mark.parametrize("impl", list(IMPLS))
def test_shared_run_shares_fingerprint(spark, impl):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"zeta eta theta {shared} iota kappa"),
        (3, "completely different content about spark physical plans and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = _fps(df, impl)
    assert len(shared) >= W + K - 1
    assert fps[1] & fps[2], "docs sharing a long run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


@pytest.mark.parametrize("impl", list(IMPLS))
def test_whitespace_normalization_invariance(spark, impl):
    rows = [
        (1, "int  main( ) {\n  return 0; }"),
        (2, "int main( ) { return 0; }"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = _fps(df, impl)
    assert fps[1] == fps[2]


@pytest.mark.parametrize("impl", list(IMPLS))
def test_short_docs_skipped(spark, impl):
    df = spark.createDataFrame([(1, "tiny"), (2, "x" * 40)], "doc_id long, text string")
    fps = _fps(df, impl)
    assert 1 not in fps  # shorter than k
    assert fps[2]


def test_kernel_equals_sql_shape_on_documents(spark):
    """Value-level identity of the two paths on the real sf0.001 docs
    table — including docs shorter than one full window (truncated
    trailing-window semantics) and string doc ids."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = winnowing_fingerprints(d, k=K, w=W).collect()
    b = winnowing_fingerprints_sql_shape(d, k=K, w=W).collect()
    assert [(r["doc_id"], r["fp"]) for r in a] == [(r["doc_id"], r["fp"]) for r in b]


def test_kernel_equals_sql_shape_truncated_windows(spark):
    """Docs with fewer grams than one window (k ≤ len < k+w-1) exercise
    the sentinel-padded trailing windows."""
    rows = [(1, "abcdefgh"), (2, "abcdefghij"), (3, "a" * (K + W - 2))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = winnowing_fingerprints(df, k=K, w=W).collect()
    b = winnowing_fingerprints_sql_shape(df, k=K, w=W).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert a  # short-but-≥k docs do emit fingerprints


def test_kernel_ascii_whitespace_matches_sql_shape(spark):
    """Non-ASCII whitespace (NBSP) must NOT be collapsed: the JVM plan
    and the DuckDB oracle use ASCII \\s, so the Arrow kernel pins
    re.ASCII too.  Regression for the r3 review finding."""
    from terrier_spark.functions.text_stats import (
        winnowing_fingerprints, winnowing_fingerprints_sql_shape,
    )

    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, winnowing_fingerprints(df, text_col="text").collect()))
    exp = sorted(map(tuple, winnowing_fingerprints_sql_shape(df, text_col="text").collect()))
    assert got == exp
    # and with a window tight enough that every gram matters, the NBSP
    # doc must fingerprint differently from its plain-space twin (a
    # Unicode-\s kernel would collapse them to identical texts)
    tight = lambda frame: {
        (r["doc_id"], r["fp"])
        for r in winnowing_fingerprints(frame, k=4, w=2, text_col="text").collect()
    }
    fp1 = {fp for d, fp in tight(df) if d == 1}
    fp2 = {fp for d, fp in tight(df) if d == 2}
    assert fp1 != fp2


def test_unicode_whitespace_edges_kernel_equals_sql_shape(spark):
    """Text with non-ASCII whitespace (NBSP) at the EDGES: the Arrow
    kernel used Python str.strip(), which removes Unicode whitespace,
    while the SQL twin's F.trim (and the DuckDB oracle's trim) strip
    ASCII spaces only — shifting every k-gram and emitting disjoint
    fingerprint sets (review finding r4).  Both paths must agree
    row-for-row."""
    rows = [
        (1, "\xa0the quick brown fox jumps over the lazy dog\xa0"),
        (2, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert _fps(df, "arrow") == _fps(df, "sql_shape")


def test_null_text_emits_no_fingerprints(spark):
    """NULL text rows emit nothing on BOTH paths (review finding r4:
    the Arrow kernel's str(txt) hashed the literal 'none' for SQL-NULL
    text, fingerprinting a null doc the SQL twin drops)."""
    rows = [(1, None), (2, "the quick brown fox jumps over the lazy dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a, b = _fps(df, "arrow"), _fps(df, "sql_shape")
    assert a == b
    assert 1 not in a and 2 in a

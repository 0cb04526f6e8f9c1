"""Winnowing fingerprints: the shared-substring guarantee (docs sharing
a run of ≥ w+k-1 chars share ≥ 1 fingerprint) and disjointness for
unrelated docs."""

from pyspark.sql import functions as F

from terrier_spark.functions.text_stats import winnowing_fingerprints

K, W = 8, 16


def _fps(df):
    out = {}
    for r in winnowing_fingerprints(df, k=K, w=W).collect():
        out.setdefault(r["doc_id"], set()).add(r["fp"])
    return out


def test_shared_run_shares_fingerprint(spark):
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"zeta eta theta {shared} iota kappa"),
        (3, "completely different content about spark physical plans and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = _fps(df)
    assert len(shared) >= W + K - 1
    assert fps[1] & fps[2], "docs sharing a long run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_whitespace_normalization_invariance(spark):
    rows = [
        (1, "int  main( ) {\n  return 0; }"),
        (2, "int main( ) { return 0; }"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = _fps(df)
    assert fps[1] == fps[2]


def test_short_docs_skipped(spark):
    df = spark.createDataFrame([(1, "tiny"), (2, "x" * 40)], "doc_id long, text string")
    fps = _fps(df)
    assert 1 not in fps  # shorter than k
    assert fps[2]

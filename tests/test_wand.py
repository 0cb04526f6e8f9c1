"""Block-max WAND prunability is a DATA property: uniform corpora give
0% prune (every block's bound clears θ), skewed corpora prune heavily.
Both behaviors pinned here, plus rank-identity of the pruned path on
the skewed corpus."""

import pytest

from pyspark.sql import functions as F

from terrier_spark import oracle
from terrier_spark.operators.index_build import build_index
from terrier_spark.operators.score import bm25_topk_blocks, wand_prune_stats


@pytest.fixture(scope="module")
def skewed(spark):
    """needle is RARE (df≈50: 31 scattered tf=1 docs + 20 clustered
    tf=30 docs at the top of the id range), haystack is uncommon
    (df≈111).  The rarest-term seed θ comes from the planted tf=30 docs
    and sits ~2x above any tf=1 block's bound, so the filler buckets'
    blocks all prune while the planted bucket survives."""
    rows = []
    for i in range(1000):
        filler = " ".join(f"word{j}_{i % 7}" for j in range(60))
        needle = "needle " if i % 33 == 0 else ""
        hay = "haystack " if i % 11 == 0 else ""
        rows.append((i, f"{needle}{hay}common {filler}"))
    for i in range(1000, 1020):
        rows.append((i, "needle " * 30 + "haystack"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df


@pytest.fixture(scope="module")
def skewed_index(skewed):
    return build_index(skewed, id_col="doc_id", text_col="text", target_buckets=16)


def test_uniform_corpus_prunes_nothing(spark, corpus_sdf):
    """The synthetic uniform corpus is term-homogeneous: block maxima
    are flat, so no block can be excluded — kept == total.  (This is
    why bench WAND gains are data-dependent; see BENCH/BASELINE.md.)"""
    idx = build_index(corpus_sdf, text_col="content")
    stats = wand_prune_stats(idx, "int return", k=10)
    assert stats["total_blocks"] > 0
    assert stats["kept_blocks"] == stats["total_blocks"]


def test_skewed_corpus_prunes_blocks(skewed_index):
    stats = wand_prune_stats(skewed_index, "needle haystack", k=10)
    assert stats["total_blocks"] > 0 and stats["theta"] is not None
    # the 20 planted high-tf docs push θ far above the filler blocks
    assert stats["kept_blocks"] < stats["total_blocks"] * 0.5, stats


def test_pruned_path_rank_identical_on_skewed(skewed, skewed_index):
    pdf = skewed.toPandas()
    o = oracle.build_index(
        [(str(r.doc_id), r.text) for r in pdf.itertuples(index=False)]
    )
    exp = oracle.bm25_topk(o, "needle haystack", 10)
    got = [
        (str(r["doc_id"]), r["score"])
        for r in bm25_topk_blocks(skewed_index, "needle haystack", 10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) <= 1e-9

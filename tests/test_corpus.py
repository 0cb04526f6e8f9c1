import hashlib

from pyspark.sql import functions as F


def test_distributed_matches_local(corpus_sdf, corpus_pdf):
    rows = corpus_sdf.orderBy("doc_id").collect()
    pdf = corpus_pdf.sort_values("doc_id").reset_index(drop=True)
    assert len(rows) == len(pdf)
    for i, r in enumerate(rows):
        assert r["doc_id"] == pdf["doc_id"][i]
        assert r["content"] == pdf["content"][i]
        assert r["lang"] == pdf["lang"][i]


def test_sha256_invariant(corpus_sdf, corpus_pdf):
    """north rule: per-row sha256(content) equality, Spark vs Python."""
    got = {
        r["doc_id"]: r["h"]
        for r in corpus_sdf.select(
            "doc_id", F.sha2("content", 256).alias("h")
        ).collect()
    }
    for doc_id, content in zip(corpus_pdf["doc_id"], corpus_pdf["content"]):
        assert got[doc_id] == hashlib.sha256(content.encode()).hexdigest()


def test_partitioning_invariance(spark):
    """Same rows regardless of partition count (pure function of index)."""
    from terrier_spark.corpus import corpus_df

    a = {r["path"] for r in corpus_df(spark, 50, partitions=2).collect()}
    b = {r["path"] for r in corpus_df(spark, 50, partitions=16).collect()}
    assert a == b

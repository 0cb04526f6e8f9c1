from pyspark.sql import functions as F

from terrier_spark import oracle
from terrier_spark.functions.tokenize import tokens, tokens_pandas_udf


def test_builtin_matches_oracle(spark):
    samples = [
        "int Foo(bar_baz);\nreturn x == 42",
        "  leading   space",
        "UPPER lower MiXeD",
        "",
        "!!!",
        "a_b_c a-b-c a.b.c",
        "unicode: héllo wörld",  # accents are separators under [^a-z0-9_]
    ]
    df = spark.createDataFrame([(s,) for s in samples], "content string")
    got = [r["t"] for r in df.select(tokens("content").alias("t")).collect()]
    exp = [oracle.tokenize(s) for s in samples]
    assert got == exp


def test_pandas_udf_matches_builtin(spark, corpus_sdf):
    a = corpus_sdf.select("doc_id", tokens("content").alias("ta"))
    b = corpus_sdf.select("doc_id", tokens_pandas_udf("content").alias("tb"))
    diff = a.join(b, "doc_id").filter(F.col("ta") != F.col("tb"))
    assert diff.count() == 0


def test_corpus_has_hot_terms(spark, corpus_sdf):
    # FIXTURES.md: >=5 hot terms in >30% of docs
    n = corpus_sdf.count()
    from terrier_spark.functions.tokenize import explode_terms

    df_counts = (
        explode_terms(corpus_sdf)
        .distinct()
        .groupBy("term")
        .count()
        .filter(F.col("count") > 0.3 * n)
    )
    assert df_counts.count() >= 5

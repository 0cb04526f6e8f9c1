import pytest

from pyspark.sql import functions as F

from terrier_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="terrier_spark_tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


N_DOCS = 120


@pytest.fixture(scope="session")
def corpus_sdf(spark):
    """Spark-side corpus with doc_id, cached for the whole session."""
    from terrier_spark.corpus import corpus_df

    df = corpus_df(spark, N_DOCS).withColumn(
        "doc_id", F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256)
    )
    df = df.persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def corpus_pdf():
    from terrier_spark.corpus import corpus_pandas

    return corpus_pandas(N_DOCS)


@pytest.fixture(scope="session")
def oracle_index(corpus_pdf):
    from terrier_spark import oracle

    return oracle.build_index(list(zip(corpus_pdf["doc_id"], corpus_pdf["content"])))


@pytest.fixture(scope="session")
def spark_index(corpus_sdf):
    from terrier_spark.operators.index_build import build_index

    return build_index(corpus_sdf)


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"

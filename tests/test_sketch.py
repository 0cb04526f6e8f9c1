"""ANALYZE/sketch statistics: exact paths vs brute force, approximate
paths vs their mathematical guarantees (hash-seeded values can't be
oracle-compared)."""

import pytest

from pyspark.sql import functions as F

from terrier_spark.operators import sketch

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="module")
def terms(spark):
    from terrier_spark.functions.tokenize import explode_terms

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return explode_terms(docs, text_col="text", id_col="doc_id").persist()


def test_heavy_hitters_exact(terms):
    got = sketch.heavy_hitters(terms, "term", k=10).collect()
    exact = (
        terms.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(10)
        .collect()
    )
    assert [(r["value"], r["cnt"]) for r in got] == [
        (r["term"], r["cnt"]) for r in exact
    ]
    assert [r["rank"] for r in got] == list(range(1, 11))


def test_histogram_total_and_bounds(orders):
    h = sketch.equi_width_histogram(orders, "o_totalprice", bins=16).collect()
    assert len(h) == 16
    assert sum(r["cnt"] for r in h) == orders.filter(
        F.col("o_totalprice").isNotNull()
    ).count()
    assert all(h[i]["bin"] == i for i in range(16))
    assert all(r["bin_hi"] > r["bin_lo"] for r in h)


def test_column_stats_exact(orders):
    rows = {
        r["col_name"]: r
        for r in sketch.column_stats(orders, ["o_orderkey", "o_orderstatus"]).collect()
    }
    n = orders.count()
    assert rows["o_orderkey"]["n_rows"] == n
    assert rows["o_orderkey"]["n_distinct"] == n  # primary key
    assert rows["o_orderkey"]["n_nulls"] == 0
    assert rows["o_orderstatus"]["n_distinct"] == orders.select(
        "o_orderstatus"
    ).distinct().count()


def test_approx_distinct_within_bound(orders):
    exact = orders.select("o_custkey").distinct().count()
    approx = sketch.approx_distinct(orders, "o_custkey", rsd=0.05)
    # HLL guarantee: rsd is the relative standard deviation; 4 sigma is
    # a conservatively loose but deterministic-per-seed bound.
    assert abs(approx - exact) <= max(4 * 0.05 * exact, 1)


def test_count_min_overestimates(terms):
    cms = sketch.count_min_sketch(terms, "term", depth=4, width=256).persist()
    exact = terms.groupBy(F.col("term").alias("value")).agg(
        F.count("*").alias("true_cnt")
    )
    est = sketch.cms_estimate(cms, exact.select("value"), "value", depth=4, width=256)
    joined = est.join(exact, "value").collect()
    total = sum(r["true_cnt"] for r in joined)
    assert joined
    for r in joined:
        # CMS never underestimates...
        assert r["estimate"] >= r["true_cnt"]
        # ...and overestimates by at most eps*N with eps = e/width
        # (per-row bound holds in expectation; 8x slack keeps the test
        # deterministic-robust for this fixed seed/data).
        assert r["estimate"] - r["true_cnt"] <= 8 * 2.718 * total / 256


def test_histogram_all_null_column(spark):
    """ADVICE r2: an entirely-NULL column must yield a zero-filled grid,
    not a TypeError."""
    from terrier_spark.operators import sketch

    df = spark.createDataFrame([(None,), (None,)], "x double")
    out = sketch.equi_width_histogram(df, "x", bins=4).collect()
    assert len(out) == 4
    assert all(r["cnt"] == 0 and r["bin_lo"] is None for r in out)

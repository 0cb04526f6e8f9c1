"""Explicit skew salting: salted plans must equal their unsalted
twins exactly (the salt only changes the shuffle layout)."""

import pytest

from pyspark.sql import functions as F

from terrier_spark.operators import salting

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").persist()


def test_salted_agg_equals_direct(li):
    direct = {
        r["l_suppkey"]: (r["n"], round(r["s"], 6), r["m"])
        for r in li.groupBy("l_suppkey")
        .agg(
            F.count("l_quantity").alias("n"),
            F.sum("l_quantity").alias("s"),
            F.max("l_quantity").alias("m"),
        )
        .collect()
    }
    salted = {
        r["l_suppkey"]: (r["n"], round(r["s"], 6), r["m"])
        for r in salting.salted_agg(
            li,
            ["l_suppkey"],
            {"n": ("l_quantity", "count"), "s": ("l_quantity", "sum"), "m": ("l_quantity", "max")},
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_mergeable(li):
    with pytest.raises(ValueError, match="not algebraic"):
        salting.salted_agg(li, ["l_suppkey"], {"a": ("l_quantity", "avg")})


def test_salted_hot_join_equals_plain_join(spark, li):
    supp = spark.read.parquet(f"{SF_DIR}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    # the genuinely hottest keys by row count
    hot = [
        r["l_suppkey"]
        for r in li.groupBy("l_suppkey").count().orderBy(F.desc("count")).limit(3).collect()
    ]
    plain = (
        li.join(supp, "l_suppkey")
        .groupBy("l_suppkey", "s_name")
        .count()
        .collect()
    )
    salted = (
        salting.salted_hot_join(li, supp, "l_suppkey", hot_keys=hot, n_salts=8)
        .groupBy("l_suppkey", "s_name")
        .count()
        .collect()
    )
    key = lambda rows: sorted((r["l_suppkey"], r["s_name"], r["count"]) for r in rows)
    assert key(salted) == key(plain)

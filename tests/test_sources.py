"""CSV source parity (reference CSVScan, csv_scan_plan_node.h:30-84) and
DML semantics (insert/update/delete/merge translators, SURVEY.md §2.1)."""

import pytest

from pyspark.sql import functions as F

from terrier_spark.sources.dml import (
    create_table, delete_where, insert_into, merge_upsert, update_where,
)
from terrier_spark.sources.tables import load_table, read_csv


def test_csv_roundtrip_with_options(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    csv_dir = str(tmp_path / "nation_csv")
    (
        nation.write.option("header", True).option("sep", "|")
        .option("quote", "'").option("escape", "\\")
        .csv(csv_dir)
    )
    schema = ", ".join(f"{c} {t}" for c, t in nation.dtypes)
    back = read_csv(spark, csv_dir, schema=schema, sep="|", quote="'")
    a = sorted(map(tuple, nation.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


@pytest.fixture()
def small_table(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    create_table(load_table(spark, sf_dir, "nation"), path)
    return path


def test_insert_into(spark, small_table):
    before = spark.read.parquet(small_table).count()
    rows = spark.createDataFrame(
        [(99, "ATLANTIS", 0)],
        spark.read.parquet(small_table).schema,
    )
    insert_into(spark, small_table, rows)
    t = spark.read.parquet(small_table)
    assert t.count() == before + 1
    assert t.filter(F.col("n_name") == "ATLANTIS").count() == 1


def test_delete_where(spark, small_table):
    before = spark.read.parquet(small_table).count()
    n = delete_where(spark, small_table, F.col("n_regionkey") == 0)
    t = spark.read.parquet(small_table)
    assert n > 0
    assert t.count() == before - n
    assert t.filter(F.col("n_regionkey") == 0).count() == 0


def test_update_where(spark, small_table):
    n = update_where(
        spark,
        small_table,
        F.col("n_regionkey") == 1,
        {"n_name": F.concat(F.col("n_name"), F.lit("_UPDATED"))},
    )
    t = spark.read.parquet(small_table)
    assert n > 0
    assert t.filter(F.col("n_name").endswith("_UPDATED")).count() == n
    assert t.filter((F.col("n_regionkey") != 1) & F.col("n_name").endswith("_UPDATED")).count() == 0


def test_merge_upsert(spark, small_table):
    t0 = spark.read.parquet(small_table)
    before = t0.count()
    schema = t0.schema
    source = spark.createDataFrame(
        [
            (0, "RENAMED_NATION", 0),
            (98, "NEWLAND", 2),
        ],
        schema,
    )
    merge_upsert(spark, small_table, source, ["n_nationkey"])
    t = spark.read.parquet(small_table)
    assert t.count() == before + 1
    assert t.filter(F.col("n_nationkey") == 0).collect()[0]["n_name"] == "RENAMED_NATION"
    assert t.filter(F.col("n_name") == "NEWLAND").count() == 1

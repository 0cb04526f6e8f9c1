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


def test_ycsb_b_mix_semantics(spark, sf_dir, tmp_path):
    """Pytest backing for the ``dml_ycsb_b_mix`` bench row (VERDICT r4
    item 9: the reference's remaining OLTP nightly flight,
    script/testing/oltpbench/configs/nightly/nightly.json:11-60).  One
    microbatch of the 95/5 read/update mix: the broadcast-semi point
    read hits exactly the read keys, the merge updates exactly the
    update keys, and every other row is byte-identical."""
    path = str(tmp_path / "ycsb")
    orders = load_table(spark, sf_dir, "orders")
    create_table(orders, path)
    keys = [r[0] for r in orders.select("o_orderkey").limit(40).collect()]
    read_keys, upd_keys = keys[:38], keys[38:]

    tbl = spark.read.parquet(path)
    read_df = spark.createDataFrame(
        [(k,) for k in read_keys], "o_orderkey bigint"
    )
    n_read = tbl.join(
        F.broadcast(read_df), "o_orderkey", "left_semi"
    ).count()
    assert n_read == len(read_keys)

    before = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in tbl.select("o_orderkey", "o_totalprice").collect()
    }
    upd_rows = tbl.filter(F.col("o_orderkey").isin(upd_keys)).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.02
    )
    merge_upsert(spark, path, upd_rows, ["o_orderkey"])

    after_df = spark.read.parquet(path)
    after = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in after_df.select("o_orderkey", "o_totalprice").collect()
    }
    assert after_df.count() == len(before)
    for k, v in before.items():
        if k in upd_keys:
            assert after[k] == pytest.approx(v * 1.02)
        else:
            assert after[k] == v


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

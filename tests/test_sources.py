"""CSV source parity (reference CSVScan, csv_scan_plan_node.h:30-84) and
DML semantics (insert/update/delete/merge translators, SURVEY.md §2.1)."""

import pytest

from pyspark.sql import functions as F

from terrier_spark.sources import oltp
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

    before = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in spark.read.parquet(path)
        .select("o_orderkey", "o_totalprice").collect()
    }
    n_read = oltp.point_mix(
        spark, path, "o_orderkey", read_keys, upd_keys, "o_totalprice", 1.02
    )
    assert n_read == len(read_keys)

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


def test_smallbank_ops_conserve_and_apply(spark, sf_dir, tmp_path):
    """SmallBank analog semantics (reference nightly flight,
    nightly.json:24-33): Balance = checking + savings per key;
    DepositChecking moves total funds by exactly n*amount; Amalgamate
    conserves total funds while zeroing the amalgamated savings."""
    check_p, save_p = str(tmp_path / "check"), str(tmp_path / "save")
    customer = load_table(spark, sf_dir, "customer").limit(200)
    oltp.smallbank_setup(customer, check_p, save_p)

    keys = [r[0] for r in customer.select("c_custkey").limit(20).collect()]

    def total(path):
        return spark.read.parquet(path).agg(F.sum("bal")).collect()[0][0]

    c0, s0 = total(check_p), total(save_p)

    # Balance reads both tables
    bal = {
        r["custid"]: r["total_bal"]
        for r in oltp.smallbank_balance(spark, check_p, save_p, keys).collect()
    }
    cmap = {
        r["custid"]: r["bal"]
        for r in spark.read.parquet(check_p).collect()
    }
    smap = {
        r["custid"]: r["bal"]
        for r in spark.read.parquet(save_p).collect()
    }
    assert set(bal) == set(keys)
    for k in keys:
        assert bal[k] == pytest.approx(cmap[k] + smap[k])

    # DepositChecking adds exactly n*amount to checking, savings untouched
    oltp.smallbank_deposit_checking(spark, check_p, keys[:5], 10.0)
    assert total(check_p) == pytest.approx(c0 + 5 * 10.0)
    assert total(save_p) == pytest.approx(s0)

    # Amalgamate conserves the grand total and zeroes savings for its keys
    g_before = total(check_p) + total(save_p)
    oltp.smallbank_amalgamate(spark, check_p, save_p, keys[5:10])
    assert total(check_p) + total(save_p) == pytest.approx(g_before)
    zeroed = (
        spark.read.parquet(save_p)
        .filter(F.col("custid").isin(keys[5:10]))
        .agg(F.sum(F.abs(F.col("bal")))).collect()[0][0]
    )
    assert zeroed == pytest.approx(0.0)

    # WriteCheck is a negative deposit
    cw = total(check_p)
    oltp.smallbank_write_check(spark, check_p, keys[10:12], 7.5)
    assert total(check_p) == pytest.approx(cw - 2 * 7.5)


def test_smallbank_mix_fused_equals_sequential(spark, sf_dir, tmp_path):
    """smallbank_mix fuses the four disjoint-key write transactions
    into one MERGE per table; the result must equal applying the
    per-transaction functions sequentially on an identical copy."""
    customer = load_table(spark, sf_dir, "customer").limit(100)
    a_c, a_s = str(tmp_path / "ac"), str(tmp_path / "as")
    b_c, b_s = str(tmp_path / "bc"), str(tmp_path / "bs")
    oltp.smallbank_setup(customer, a_c, a_s)
    oltp.smallbank_setup(customer, b_c, b_s)

    keys = [r[0] for r in customer.select("c_custkey").limit(50).collect()]
    n = oltp.smallbank_mix(spark, a_c, a_s, keys)
    assert n == len(keys)

    cut = [int(len(keys) * f) for f in (0.6, 0.7, 0.8, 0.9)]
    oltp.smallbank_deposit_checking(spark, b_c, keys[cut[0]: cut[1]], 1.30)
    oltp.smallbank_transact_savings(spark, b_s, keys[cut[1]: cut[2]], 20.20)
    oltp.smallbank_write_check(spark, b_c, keys[cut[2]: cut[3]], 5.00)
    oltp.smallbank_amalgamate(spark, b_c, b_s, keys[cut[3]:])

    for pa, pb in ((a_c, b_c), (a_s, b_s)):
        da = {r["custid"]: r["bal"] for r in spark.read.parquet(pa).collect()}
        db = {r["custid"]: r["bal"] for r in spark.read.parquet(pb).collect()}
        assert set(da) == set(db)
        for k in da:
            assert da[k] == pytest.approx(db[k]), k


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

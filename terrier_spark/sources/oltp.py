"""OLTP workload analogs over the parquet DML layer — the reference's
nightly OLTP-Bench flight (tatp, smallbank, tpcc, noop, ycsb at
/root/reference/script/testing/oltpbench/configs/nightly/nightly.json:11-60)
re-expressed as Spark microbatches.

Spark is a batch engine, so the honest analog of an OLTP transaction
mix is the microbatched form a streaming upsert sink would execute: one
batch groups the mix's point reads into a single broadcast-semi-join
and its point writes into one MERGE per written table.  Reported ops/s
is the batch's op count over the batch wall time — the same
transactions/sec framing the reference's oltpbench runner prints, at
batch (not per-row) latency.

Workloads:

- ``point_mix``     — YCSB-B (95/5) and TATP (80/20) are both
  keyed point read/update mixes over one table; the mix ratio and
  update expression are parameters.
- ``smallbank_*``   — the two-table SAVINGS/CHECKING schema with the
  published transaction set (Balance, DepositChecking, TransactSavings,
  WriteCheck, Amalgamate), each a join-read or MERGE batch.
- ``noop_floor``    — the reference's noop benchmark measures pure
  harness overhead per transaction; the Spark analog is the per-action
  scheduling floor (empty one-task job), the fixed cost under any
  microbatch rate.
"""

from __future__ import annotations

import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrier_spark.sources.dml import create_table, merge_upsert


def point_mix(
    spark: SparkSession,
    path: str,
    key_col: str,
    read_keys: Sequence[int],
    upd_keys: Sequence[int],
    upd_col: str,
    factor: float,
) -> int:
    """One microbatch of a keyed point read/update mix (YCSB-B at
    95/5, TATP at 80/20): broadcast-semi-join point read of the read
    keys + one MERGE of the updated rows.  Returns the number of read
    hits (point reads that found their row)."""
    tbl = spark.read.parquet(path)
    read_df = spark.createDataFrame(
        [(int(k),) for k in read_keys], f"{key_col} bigint"
    )
    n_read = tbl.join(F.broadcast(read_df), key_col, "left_semi").count()
    # broadcast-join key selection, not isin(): the key set is a
    # DataFrame either way, and a 10^6-key batch would otherwise become
    # a 10^6-element In expression on the driver.
    upd_df = spark.createDataFrame(
        [(int(k),) for k in upd_keys], f"{key_col} bigint"
    )
    upd_rows = tbl.join(F.broadcast(upd_df), key_col, "left_semi").withColumn(
        upd_col, F.col(upd_col) * factor
    )
    merge_upsert(spark, path, upd_rows, [key_col])
    return n_read


# ---------------------------------------------------------------------------
# SmallBank (H-Store / OLTP-Bench schema: SAVINGS(custid, bal),
# CHECKING(custid, bal); reference nightly.json:24-33)
# ---------------------------------------------------------------------------


def smallbank_setup(
    customer: DataFrame, checking_path: str, savings_path: str
) -> None:
    """Derive the two-table SmallBank schema from the TPC-H customer
    table: custid = c_custkey, checking = c_acctbal, savings = a
    deterministic function of the key (so balances are reproducible)."""
    base = customer.select(
        F.col("c_custkey").alias("custid"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    create_table(base, checking_path)
    create_table(
        base.withColumn(
            "bal", F.round((F.col("custid") % 1000) * 1.5 + 100.0, 2)
        ),
        savings_path,
    )


def smallbank_balance(
    spark: SparkSession, checking_path: str, savings_path: str,
    keys: Sequence[int],
) -> DataFrame:
    """Balance: total funds per customer — the read-both-tables
    transaction, batched as one broadcast-semi read + join."""
    kdf = spark.createDataFrame([(int(k),) for k in keys], "custid bigint")
    c = spark.read.parquet(checking_path).join(
        F.broadcast(kdf), "custid", "left_semi"
    )
    s = spark.read.parquet(savings_path).join(
        F.broadcast(kdf), "custid", "left_semi"
    )
    return (
        c.alias("c")
        .join(s.alias("s"), "custid")
        .select(
            "custid",
            (F.col("c.bal") + F.col("s.bal")).alias("total_bal"),
        )
    )


def smallbank_deposit_checking(
    spark: SparkSession, checking_path: str, keys: Sequence[int], amount: float
) -> None:
    """DepositChecking: checking(k) += amount for each key."""
    t = spark.read.parquet(checking_path)
    upd = t.filter(F.col("custid").isin(list(keys))).withColumn(
        "bal", F.col("bal") + F.lit(amount)
    )
    merge_upsert(spark, checking_path, upd, ["custid"])


def smallbank_transact_savings(
    spark: SparkSession, savings_path: str, keys: Sequence[int], amount: float
) -> None:
    """TransactSavings: savings(k) += amount (negative = withdrawal)."""
    t = spark.read.parquet(savings_path)
    upd = t.filter(F.col("custid").isin(list(keys))).withColumn(
        "bal", F.col("bal") + F.lit(amount)
    )
    merge_upsert(spark, savings_path, upd, ["custid"])


def smallbank_write_check(
    spark: SparkSession, checking_path: str, keys: Sequence[int], amount: float
) -> None:
    """WriteCheck: checking(k) -= amount (overdraft permitted, as in
    the published workload's default isolation-anomaly mode)."""
    smallbank_deposit_checking(spark, checking_path, keys, -amount)


def smallbank_amalgamate(
    spark: SparkSession, checking_path: str, savings_path: str,
    keys: Sequence[int],
) -> None:
    """Amalgamate(k): move ALL of k's savings into k's checking —
    savings(k) = 0, checking(k) += old savings(k).  Total funds are
    conserved (the property the tests pin)."""
    kdf = spark.createDataFrame([(int(k),) for k in keys], "custid bigint")
    s = spark.read.parquet(savings_path)
    moved = s.join(F.broadcast(kdf), "custid", "inner").select(
        "custid", F.col("bal").alias("moved")
    )
    c = spark.read.parquet(checking_path)
    upd_c = (
        c.join(F.broadcast(moved), "custid", "inner")
        .select("custid", (F.col("bal") + F.col("moved")).alias("bal"))
    )
    merge_upsert(spark, checking_path, upd_c, ["custid"])
    upd_s = s.join(F.broadcast(kdf), "custid", "inner").withColumn(
        "bal", F.lit(0.0)
    )
    merge_upsert(spark, savings_path, upd_s, ["custid"])


def smallbank_mix(
    spark: SparkSession,
    checking_path: str,
    savings_path: str,
    keys: Sequence[int],
) -> int:
    """One microbatch of the published 5-transaction SmallBank mix over
    disjoint key ranges: Balance reads on 60% of the keys, the four
    write transactions each on 10%.  Returns the op count.

    Because the write transactions' key ranges are disjoint, they
    commute — the microbatch fuses them into ONE MERGE per table
    (checking: deposit + write_check + amalgamate credit; savings:
    transact + amalgamate zero), the same result as running them
    sequentially (pinned against the per-transaction functions in
    tests/test_sources.py) at two table rewrites instead of five."""
    n = len(keys)
    cut = [int(n * f) for f in (0.6, 0.7, 0.8, 0.9)]
    bal_k = keys[: cut[0]]
    dep_k = keys[cut[0]: cut[1]]
    tx_k = keys[cut[1]: cut[2]]
    wc_k = keys[cut[2]: cut[3]]
    am_k = keys[cut[3]:]
    smallbank_balance(spark, checking_path, savings_path, bal_k).count()

    def kdf(ks, extra=None):
        rows = [(int(k),) + ((extra,) if extra is not None else ()) for k in ks]
        schema = "custid bigint" + (", delta double" if extra is not None else "")
        return spark.createDataFrame(rows, schema)

    c = spark.read.parquet(checking_path)
    s = spark.read.parquet(savings_path)
    am = kdf(am_k)
    moved = s.join(F.broadcast(am), "custid", "inner").select(
        "custid", F.col("bal").alias("delta")
    )
    c_deltas = kdf(dep_k, 1.30).unionByName(kdf(wc_k, -5.00)).unionByName(moved)
    upd_c = c.join(F.broadcast(c_deltas), "custid", "inner").select(
        "custid", (F.col("bal") + F.col("delta")).alias("bal")
    )
    merge_upsert(spark, checking_path, upd_c, ["custid"])
    upd_s = (
        s.join(F.broadcast(kdf(tx_k, 20.20).unionByName(am.withColumn(
            "delta", F.lit(None).cast("double")))), "custid", "inner")
        .select(
            "custid",
            F.when(F.col("delta").isNull(), F.lit(0.0))
            .otherwise(F.col("bal") + F.col("delta")).alias("bal"),
        )
    )
    merge_upsert(spark, savings_path, upd_s, ["custid"])
    return n


def noop_floor(spark: SparkSession, n_actions: int = 20) -> float:
    """Per-action scheduling floor: wall seconds per empty one-task
    job, median over n_actions (the noop benchmark's
    harness-overhead-per-transaction, reference nightly.json:51-59)."""
    walls = []
    for _ in range(n_actions):
        t0 = time.monotonic()
        spark.range(1, numPartitions=1).count()
        walls.append(time.monotonic() - t0)
    walls.sort()
    return walls[len(walls) // 2]

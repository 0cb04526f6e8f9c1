"""Relational operator inventory as DataFrame plans (SURVEY.md §2).

Every function takes (spark, sf_dir) and returns a DataFrame whose column
names/aliases match the DuckDB oracle SQL in plans/oracles.py exactly
(driver compares sorted-by-name columns + value hashes).

Coverage map (reference → here):
  SeqScan + fused filter     → q6, every scan (§2.1/2.2)
  Hash join inner/semi/anti  → q3, q5, q_semi, q_anti (§2.3)
  NL/outer join              → q_outer (§2.3)
  Hash agg grouped + HAVING  → q1, q_having (§2.4)
  Static agg                 → q6 (§2.4)
  DISTINCT                   → q_distinct (§2.4)
  Sort / TopK / limit+offset → q_topk, q_limit_offset (§2.5)
  Set ops                    → q_setops (§2.6, parsed-only in reference)
  Window functions           → q_window_rank, q_sessionize (§2.7, absent
                               in reference — Spark superset)
  Scalar string/date/case    → q_case_string, q_date_extract (§2.8)
  IN / scalar subqueries     → q_in_subquery, q_scalar_subquery (§2.3)
  ROLLUP                     → q_rollup (§2.4, absent in reference)
Plans are intentionally declarative: Catalyst does pushdown, pruning,
join selection (broadcast for the sub-MB dims here), and AQE handles
skew/coalescing — matching SURVEY.md §4.2's "zero custom rules" stance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from terrier_spark.sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog (reference runs Q1: workload.cpp:92)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.bround(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.bround(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.bround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("sum_disc_price"),
            F.bround(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            F.bround(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.bround(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.bround(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: 3-way join + group + top-10."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-06-15"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .withColumn("revenue", F.bround("revenue", 6))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: multiway join (region→nation→(customer,supplier))."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        r.join(n, r["r_regionkey"] == n["n_regionkey"])
        .join(c, n["n_nationkey"] == c["c_nationkey"])
        .join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (s["s_nationkey"] == n["n_nationkey"]),
        )
        .groupBy("n_name")
        .agg(
            F.bround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog: pure filter + static aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.bround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias("revenue"),
        F.count("*").alias("n_rows"),
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (reference TopK §2.5)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT + OFFSET (reference limit_translator.cpp:30-55)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.asc("o_orderkey"))
        .offset(100)
        .limit(20)
    )


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT → GROUP BY rewrite (§2.4)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left_semi (reference LeftSemiHashJoin §2.3)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left_anti (§2.3)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join + null-aware agg (§2.3)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.bround(F.sum("o_totalprice"), 6), F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (aggregate_plan_node.h:61-65)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_items"),
            F.bround(F.sum("l_quantity"), 6).alias("total_qty"),
        )
        .filter(F.col("n_items") > 400)
        .orderBy("l_suppkey")
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (absent in reference §2.7 — Spark superset):
    top-3 orders per customer by price via row_number."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over events: new session when the gap
    from the previous event of the same user exceeds 30 minutes (lag +
    cumulative sum windows)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_flag = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    with_sess = with_flag.withColumn(
        "session_no", F.sum("new_session").over(w)
    )
    return (
        with_sess.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_events"),
            F.bround(F.sum("value"), 6).alias("session_value"),
        )
        .orderBy("user_id", "session_no")
    )


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT (§2.6 — planned-only in reference):
    nation keys with customers vs with suppliers, tagged per set op."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    u = c.union(s).distinct().withColumn("op", F.lit("union"))
    i = c.intersect(s).withColumn("op", F.lit("intersect"))
    x = c.distinct().exceptAll(s.distinct()).withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(x).orderBy("op", "nationkey")


def q_case_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string functions + CASE + LIKE (§2.8: substring, upper,
    lpad, concat, length, like)."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
            F.lpad(F.col("p_brand"), 12, "#").alias("brand_padded"),
            F.length("p_type").alias("type_len"),
            F.when(F.col("p_type").like("%BRASS%"), F.lit("brass"))
            .when(F.col("p_size") > 30, F.lit("large"))
            .otherwise(F.lit("other"))
            .alias("category"),
            F.concat_ws("-", "p_brand", F.col("p_size").cast("string")).alias("brand_size"),
        )
        .orderBy("p_partkey")
    )


def q_date_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_part/EXTRACT (§2.8 DatePart: YEAR/QUARTER/MONTH/DOW)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .groupBy("yr", "qtr")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("yr", "qtr")
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ROLLUP (absent in reference §2.4 — Spark superset)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.bround(F.sum("o_totalprice"), 6).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (SELECT …) — decorrelated to semi join (§2.3 mark joins)."""
    spark_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        )
        ORDER BY o_orderkey
        """
    )


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in predicate (§2.3 single join)."""
    spark_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 6) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation over events — the batch
    equivalent of the Structured Streaming plan in streaming/windows.py."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.bround(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def spark_views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for t in names:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

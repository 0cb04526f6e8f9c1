"""Star Schema Benchmark (SSB) workload — the reference's second query
set (13 queries Q1.1-Q4.3, hand-built plans in
/root/reference/test/test_util/ssb/star_schema_query.cpp, loaded by
/root/reference/test/test_util/tpch/workload.cpp:102-116).

SSB runs on a denormalized star (lineorder + date/part/supplier/customer
dims).  The driver's testdata is TPC-H-shaped, so each SSB concept maps
onto it — the point of carrying the workload is the PLAN SHAPES (a fact
scan with selective dim filters radiating over broadcast star joins,
progressively drilled down within each flight), which survive the
mapping exactly:

  lineorder            → lineitem ⋈ orders (the classic SSB derivation)
  d_year / d_yearmonth → year(l_shipdate) / date_format 'yyyy-MM'
  d_weeknuminyear      → weekofyear(l_shipdate)  (ISO week, both engines)
  s_region / c_region  → supplier/customer → nation → region
  s_city / c_city      → 'D' || (key % 10) district buckets (TPC-H has
                         no city column; a deterministic sub-nation
                         grouping keeps the drill-down granularity)
  p_category / p_brand → p_type / p_brand
  lo_revenue           → l_extendedprice * (1 - l_discount)
  Q1 revenue           → l_extendedprice * l_discount   (SSB's flight-1
                         definition)
  lo_profit            → revenue - l_quantity * p_retailprice / 10
                         (supplycost proxy; partsupp is not in the
                         testdata)

Every query has a DuckDB oracle (SSB_ORACLES) over the same parquet;
tests/test_ssb.py runs all 13 side-by-side value-compared.  Like the
reference's TPC-H flight these are plain declarative DataFrame plans:
Catalyst broadcasts the sub-MB dims and prunes fact columns, giving the
star-join physical shape the reference hand-assembles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrier_spark.sources.tables import load_table


def _fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineorder analog: lineitem ⋈ orders (adds the customer link)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return li.join(o, li["l_orderkey"] == o["o_orderkey"])


def _supp_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(
            "s_suppkey",
            F.col("n_name").alias("s_nation"),
            F.col("r_name").alias("s_region"),
            F.concat(F.lit("D"), F.pmod("s_suppkey", F.lit(10))).alias("s_city"),
        )
    )


def _cust_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select(
            "c_custkey",
            F.col("n_name").alias("c_nation"),
            F.col("r_name").alias("c_region"),
            F.concat(F.lit("D"), F.pmod("c_custkey", F.lit(10))).alias("c_city"),
        )
    )


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _year():
    return F.year("l_shipdate")


# ------------------------------------------------------------- flight 1

def ssb_q1_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (_year() == 1995)
        & F.col("l_discount").between(0.01, 0.03)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias(
            "revenue"
        )
    )


def ssb_q1_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.date_format("l_shipdate", "yyyy-MM") == "1996-01")
        & F.col("l_discount").between(0.04, 0.06)
        & F.col("l_quantity").between(26, 35)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias(
            "revenue"
        )
    )


def ssb_q1_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.weekofyear("l_shipdate") == 6)
        & (_year() == 1996)
        & F.col("l_discount").between(0.05, 0.07)
        & F.col("l_quantity").between(26, 35)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias(
            "revenue"
        )
    )


# ------------------------------------------------------------- flight 2

def _q2(spark, sf_dir, part_pred, region: str) -> DataFrame:
    f = _fact(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(part_pred).select(
        "p_partkey", "p_brand"
    )
    s = _supp_region(spark, sf_dir).filter(F.col("s_region") == region)
    return (
        f.join(p, f["l_partkey"] == p["p_partkey"])
        .join(s, f["l_suppkey"] == s["s_suppkey"])
        .groupBy(_year().alias("d_year"), "p_brand")
        .agg(F.round(F.sum(_rev()), 6).alias("revenue"))
        .orderBy("d_year", "p_brand")
    )


def ssb_q2_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q2(spark, sf_dir, F.col("p_type") == "PROMO", "AMERICA")


def ssb_q2_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q2(
        spark, sf_dir, F.col("p_brand").between("Brand#12", "Brand#18"), "ASIA"
    )


def ssb_q2_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q2(spark, sf_dir, F.col("p_brand") == "Brand#14", "EUROPE")


# ------------------------------------------------------------- flight 3

def _q3(spark, sf_dir, c_pred, s_pred, date_pred, grp_c, grp_s) -> DataFrame:
    f = _fact(spark, sf_dir)
    c = _cust_region(spark, sf_dir).filter(c_pred)
    s = _supp_region(spark, sf_dir).filter(s_pred)
    return (
        f.join(c, f["o_custkey"] == c["c_custkey"])
        .join(s, f["l_suppkey"] == s["s_suppkey"])
        .filter(date_pred)
        .groupBy(F.col(grp_c), F.col(grp_s), _year().alias("d_year"))
        .agg(F.round(F.sum(_rev()), 6).alias("revenue"))
        .orderBy(F.col("d_year").asc(), F.col("revenue").desc())
    )


def ssb_q3_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q3(
        spark, sf_dir,
        F.col("c_region") == "ASIA", F.col("s_region") == "ASIA",
        _year().between(1995, 1997), "c_nation", "s_nation",
    )


def ssb_q3_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q3(
        spark, sf_dir,
        F.col("c_nation") == "NATION_3", F.col("s_nation") == "NATION_3",
        _year().between(1995, 1997), "c_city", "s_city",
    )


def ssb_q3_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q3(
        spark, sf_dir,
        F.col("c_city").isin("D1", "D5"), F.col("s_city").isin("D1", "D5"),
        _year().between(1995, 1997), "c_city", "s_city",
    )


def ssb_q3_4(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q3(
        spark, sf_dir,
        F.col("c_city").isin("D1", "D5"), F.col("s_city").isin("D1", "D5"),
        F.date_format("l_shipdate", "yyyy-MM") == "1997-12", "c_city", "s_city",
    )


# ------------------------------------------------------------- flight 4

def _q4(spark, sf_dir, c_pred, s_pred, p_pred, date_pred, grps) -> DataFrame:
    f = _fact(spark, sf_dir)
    c = _cust_region(spark, sf_dir).filter(c_pred)
    s = _supp_region(spark, sf_dir).filter(s_pred)
    p = load_table(spark, sf_dir, "part").filter(p_pred).select(
        "p_partkey", "p_brand", "p_type", "p_retailprice"
    )
    profit = _rev() - F.col("l_quantity") * F.col("p_retailprice") / 10
    out = (
        f.join(c, f["o_custkey"] == c["c_custkey"])
        .join(s, f["l_suppkey"] == s["s_suppkey"])
        .join(p, f["l_partkey"] == p["p_partkey"])
        .filter(date_pred)
        .groupBy(_year().alias("d_year"), *[F.col(g) for g in grps])
        .agg(F.round(F.sum(profit), 6).alias("profit"))
    )
    return out.orderBy("d_year", *grps)


def ssb_q4_1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA", F.col("s_region") == "AMERICA",
        F.col("p_type").isin("PROMO", "ECONOMY"), F.lit(True), ["c_nation"],
    )


def ssb_q4_2(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA", F.col("s_region") == "AMERICA",
        F.col("p_type").isin("PROMO", "ECONOMY"),
        _year().isin(1997, 1998), ["s_nation", "p_type"],
    )


def ssb_q4_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q4(
        spark, sf_dir,
        F.col("c_region") == "AMERICA", F.col("s_nation") == "NATION_3",
        F.col("p_type") == "PROMO", _year().isin(1997, 1998),
        ["s_city", "p_brand"],
    )


SSB_QUERIES = {
    "ssb_q1_1": ssb_q1_1, "ssb_q1_2": ssb_q1_2, "ssb_q1_3": ssb_q1_3,
    "ssb_q2_1": ssb_q2_1, "ssb_q2_2": ssb_q2_2, "ssb_q2_3": ssb_q2_3,
    "ssb_q3_1": ssb_q3_1, "ssb_q3_2": ssb_q3_2, "ssb_q3_3": ssb_q3_3,
    "ssb_q3_4": ssb_q3_4,
    "ssb_q4_1": ssb_q4_1, "ssb_q4_2": ssb_q4_2, "ssb_q4_3": ssb_q4_3,
}

# DuckDB oracles — one per query, same mapping, same aliases.
_FACT_SQL = "lineitem JOIN orders ON l_orderkey = o_orderkey"
_SUPP_SQL = (
    "(SELECT s_suppkey, n_name AS s_nation, r_name AS s_region, "
    "'D' || (s_suppkey % 10) AS s_city FROM supplier "
    "JOIN nation ON s_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey) sd"
)
_CUST_SQL = (
    "(SELECT c_custkey, n_name AS c_nation, r_name AS c_region, "
    "'D' || (c_custkey % 10) AS c_city FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey "
    "JOIN region ON n_regionkey = r_regionkey) cd"
)

SSB_ORACLES = {
    "ssb_q1_1": """
        SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue
        FROM lineitem
        WHERE year(l_shipdate) = 1995
          AND l_discount BETWEEN 0.01 AND 0.03 AND l_quantity < 25
    """,
    "ssb_q1_2": """
        SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue
        FROM lineitem
        WHERE strftime(l_shipdate, '%Y-%m') = '1996-01'
          AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity BETWEEN 26 AND 35
    """,
    "ssb_q1_3": """
        SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue
        FROM lineitem
        WHERE weekofyear(l_shipdate) = 6 AND year(l_shipdate) = 1996
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity BETWEEN 26 AND 35
    """,
    "ssb_q2_1": f"""
        SELECT year(l_shipdate) AS d_year, p_brand,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        FROM {_FACT_SQL}
        JOIN part ON l_partkey = p_partkey
        JOIN {_SUPP_SQL} ON l_suppkey = sd.s_suppkey
        WHERE p_type = 'PROMO' AND s_region = 'AMERICA'
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ssb_q2_2": f"""
        SELECT year(l_shipdate) AS d_year, p_brand,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        FROM {_FACT_SQL}
        JOIN part ON l_partkey = p_partkey
        JOIN {_SUPP_SQL} ON l_suppkey = sd.s_suppkey
        WHERE p_brand BETWEEN 'Brand#12' AND 'Brand#18' AND s_region = 'ASIA'
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ssb_q2_3": f"""
        SELECT year(l_shipdate) AS d_year, p_brand,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        FROM {_FACT_SQL}
        JOIN part ON l_partkey = p_partkey
        JOIN {_SUPP_SQL} ON l_suppkey = sd.s_suppkey
        WHERE p_brand = 'Brand#14' AND s_region = 'EUROPE'
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ssb_q3_1": f"""
        SELECT c_nation, s_nation, year(l_shipdate) AS d_year,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        FROM {_FACT_SQL}
        JOIN {_CUST_SQL} ON o_custkey = cd.c_custkey
        JOIN {_SUPP_SQL} ON l_suppkey = sd.s_suppkey
        WHERE c_region = 'ASIA' AND s_region = 'ASIA'
          AND year(l_shipdate) BETWEEN 1995 AND 1997
        GROUP BY 1, 2, 3 ORDER BY 3 ASC, 4 DESC
    """,
    "ssb_q3_2": f"""
        SELECT c_city, s_city, year(l_shipdate) AS d_year,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        FROM {_FACT_SQL}
        JOIN {_CUST_SQL} ON o_custkey = cd.c_custkey
        JOIN {_SUPP_SQL} ON l_suppkey = sd.s_suppkey
        WHERE c_nation = 'NATION_3' AND s_nation = 'NATION_3'
          AND year(l_shipdate) BETWEEN 1995 AND 1997
        GROUP BY 1, 2, 3 ORDER BY 3 ASC, 4 DESC
    """,
    "ssb_q3_3": f"""
        SELECT c_city, s_city, year(l_shipdate) AS d_year,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        FROM {_FACT_SQL}
        JOIN {_CUST_SQL} ON o_custkey = cd.c_custkey
        JOIN {_SUPP_SQL} ON l_suppkey = sd.s_suppkey
        WHERE c_city IN ('D1', 'D5') AND s_city IN ('D1', 'D5')
          AND year(l_shipdate) BETWEEN 1995 AND 1997
        GROUP BY 1, 2, 3 ORDER BY 3 ASC, 4 DESC
    """,
    "ssb_q3_4": f"""
        SELECT c_city, s_city, year(l_shipdate) AS d_year,
               round(sum(l_extendedprice * (1 - l_discount)), 6) AS revenue
        FROM {_FACT_SQL}
        JOIN {_CUST_SQL} ON o_custkey = cd.c_custkey
        JOIN {_SUPP_SQL} ON l_suppkey = sd.s_suppkey
        WHERE c_city IN ('D1', 'D5') AND s_city IN ('D1', 'D5')
          AND strftime(l_shipdate, '%Y-%m') = '1997-12'
        GROUP BY 1, 2, 3 ORDER BY 3 ASC, 4 DESC
    """,
    "ssb_q4_1": f"""
        SELECT year(l_shipdate) AS d_year, c_nation,
               round(sum(l_extendedprice * (1 - l_discount)
                         - l_quantity * p_retailprice / 10), 6) AS profit
        FROM {_FACT_SQL}
        JOIN {_CUST_SQL} ON o_custkey = cd.c_custkey
        JOIN {_SUPP_SQL} ON l_suppkey = sd.s_suppkey
        JOIN part ON l_partkey = p_partkey
        WHERE c_region = 'AMERICA' AND s_region = 'AMERICA'
          AND p_type IN ('PROMO', 'ECONOMY')
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ssb_q4_2": f"""
        SELECT year(l_shipdate) AS d_year, s_nation, p_type,
               round(sum(l_extendedprice * (1 - l_discount)
                         - l_quantity * p_retailprice / 10), 6) AS profit
        FROM {_FACT_SQL}
        JOIN {_CUST_SQL} ON o_custkey = cd.c_custkey
        JOIN {_SUPP_SQL} ON l_suppkey = sd.s_suppkey
        JOIN part ON l_partkey = p_partkey
        WHERE c_region = 'AMERICA' AND s_region = 'AMERICA'
          AND p_type IN ('PROMO', 'ECONOMY')
          AND year(l_shipdate) IN (1997, 1998)
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "ssb_q4_3": f"""
        SELECT year(l_shipdate) AS d_year, s_city, p_brand,
               round(sum(l_extendedprice * (1 - l_discount)
                         - l_quantity * p_retailprice / 10), 6) AS profit
        FROM {_FACT_SQL}
        JOIN {_CUST_SQL} ON o_custkey = cd.c_custkey
        JOIN {_SUPP_SQL} ON l_suppkey = sd.s_suppkey
        JOIN part ON l_partkey = p_partkey
        WHERE c_region = 'AMERICA' AND s_nation = 'NATION_3'
          AND p_type = 'PROMO' AND year(l_shipdate) IN (1997, 1998)
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
}

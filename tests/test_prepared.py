"""Prepared / parameterized query surface (plans/prepared.py).

Reference: PARSE/BIND/EXECUTE extended-protocol loop,
src/network/postgres/postgres_network_commands.cpp:221-485.
"""

import datetime

import pytest

from pyspark.sql import functions as F

from terrier_spark.plans.prepared import prepare, prepare_sql

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_prepare_sql_rebind(spark, lineitem):
    """Same statement text, two bindings → two different results, each
    equal to the directly-built DataFrame plan."""
    stmt = prepare_sql(
        spark,
        "SELECT count(*) AS n FROM {li} WHERE l_quantity < :qmax",
        tables={"li": lineitem},
    )
    for qmax in (10, 30):
        got = stmt.execute(qmax=qmax).collect()[0]["n"]
        want = lineitem.filter(F.col("l_quantity") < qmax).count()
        assert got == want


def test_prepare_sql_defaults_override(spark, lineitem):
    stmt = prepare_sql(
        spark,
        "SELECT count(*) AS n FROM {li} WHERE l_quantity < :qmax",
        tables={"li": lineitem},
        qmax=10,
    )
    n_default = stmt.execute().collect()[0]["n"]
    n_override = stmt.execute(qmax=30).collect()[0]["n"]
    assert n_default == lineitem.filter(F.col("l_quantity") < 10).count()
    assert n_override > n_default


def test_prepare_sql_no_injection(spark, lineitem):
    """A hostile string parameter binds as a literal, never splices into
    the statement — the extended protocol's core guarantee."""
    stmt = prepare_sql(
        spark,
        "SELECT count(*) AS n FROM {li} WHERE l_returnflag = :flag",
        tables={"li": lineitem},
    )
    hostile = "' OR '1'='1"
    assert stmt.execute(flag=hostile).collect()[0]["n"] == 0
    assert stmt.execute(flag="R").collect()[0]["n"] > 0


def test_prepare_sql_typed_timestamp_binding(spark, lineitem):
    """date parameters bind as typed literals and still reach the scan
    as pushed filters (not a post-scan cast barrier)."""
    stmt = prepare_sql(
        spark,
        "SELECT count(*) AS n FROM {li} WHERE l_shipdate >= :lo",
        tables={"li": lineitem},
    )
    df = stmt.execute(lo=datetime.date(1996, 1, 1))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1].split("]")[0]
    n = df.collect()[0]["n"]
    assert 0 < n < lineitem.count()


def test_prepare_plan_builder(spark, lineitem):
    """PreparedPlan: bind-time args become plan literals over a
    DataFrame-building function."""

    def builder(s, flag, qmax):
        return (
            lineitem.filter(
                (F.col("l_returnflag") == flag) & (F.col("l_quantity") < qmax)
            )
            .groupBy("l_linestatus")
            .agg(F.count("*").alias("n"))
        )

    p = prepare(spark, builder, qmax=50)
    a = {r["l_linestatus"]: r["n"] for r in p.execute(flag="R").collect()}
    b = {r["l_linestatus"]: r["n"] for r in p.execute(flag="N").collect()}
    assert a and b and a != b


def test_q_prepared_entry(spark):
    """Driver entry: two bindings, tagged union, deterministic order."""
    from terrier_spark.plans.relational import q_prepared

    rows = q_prepared(spark, SF_DIR).collect()
    assert [r["binding"] for r in rows] == ["y1996", "y1998_99"]
    for r in rows:
        assert r["n_rows"] > 0 and r["revenue"] > 0

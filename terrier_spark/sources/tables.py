"""Loaders for the driver's testdata layout (TESTDATA.md) and generic
parquet/CSV sources.

At cluster scale these would be Iceberg catalog tables; the loader layer
is the one place that changes (spark.read.parquet → spark.table), every
operator above is storage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so spark.sql works."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    header: bool = True,
) -> DataFrame:
    """CSV source with delimiter/quote/escape — parity with the
    reference's CSVScan (csv_scan_plan_node.h:30-84)."""
    reader = spark.read.option("header", header).option("sep", sep)
    reader = reader.option("quote", quote).option("escape", escape)
    if schema:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)

"""DML over parquet table directories — the reference's
Insert/InsertSelect/Update/Delete operators (SURVEY.md §2.1:
/root/reference/src/execution/compiler/operator/{insert,update,delete}_translator.cpp)
re-expressed as Spark batch rewrites.

On a cluster these are one-liners against Iceberg (`INSERT INTO`,
`MERGE INTO`, `UPDATE`, `DELETE` with snapshot isolation and file-level
pruning); the sandbox has no Iceberg runtime, so this module implements
the same semantics as atomic directory swaps over parquet — read-modify-
write with a staging dir and rename, which is also the correct mental
model for what Iceberg's copy-on-write mode does per file group.

All operations are expression-driven (Column predicates / assignment
maps), so Catalyst plans the scan+filter and only matching data is
rewritten.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def create_table(df: DataFrame, path: str) -> None:
    """CREATE TABLE AS SELECT."""
    df.write.mode("errorifexists").parquet(path)


def insert_into(spark: SparkSession, path: str, rows: DataFrame) -> None:
    """INSERT INTO ... SELECT (append; schema matched by name)."""
    existing = spark.read.parquet(path)
    rows.select(*existing.columns).write.mode("append").parquet(path)


def _swap_write(spark: SparkSession, path: str, new_df: DataFrame) -> None:
    """Materialize new_df then atomically replace the table dir.

    new_df must be fully materialized BEFORE the old dir is removed
    (it reads from that dir), hence the staging write."""
    staging = tempfile.mkdtemp(prefix="dml_staging_", dir=os.path.dirname(path) or ".")
    try:
        new_df.write.mode("overwrite").parquet(staging)
        # Unique .old target per swap: a leftover dir from a previously
        # interrupted run must not make the rename fail.
        old = tempfile.mkdtemp(prefix=os.path.basename(path) + ".old_",
                               dir=os.path.dirname(path) or ".")
        os.rmdir(old)
        os.rename(path, old)
        # Crash window: between these two renames there is no table at
        # `path` (data is intact under `old`).  Iceberg closes this gap
        # with an atomic metadata-pointer swap; recovery here is manual
        # (rename the .old_* dir back).
        os.rename(staging, path)
        shutil.rmtree(old)
    except Exception:
        shutil.rmtree(staging, ignore_errors=True)
        raise


def delete_where(spark: SparkSession, path: str, predicate: Column) -> int:
    """DELETE FROM t WHERE p. Returns number of rows deleted.

    SQL DELETE semantics: only rows where p is TRUE are removed — rows
    where p evaluates to NULL (e.g. comparisons against NULL columns)
    are retained, hence the coalesce to FALSE before negating."""
    t = spark.read.parquet(path)
    cond = F.coalesce(predicate, F.lit(False))
    n_del = t.filter(cond).count()
    if n_del:
        _swap_write(spark, path, t.filter(~cond))
    return n_del


def update_where(
    spark: SparkSession, path: str, predicate: Column, assignments: dict[str, Column]
) -> int:
    """UPDATE t SET col=expr, ... WHERE p. Returns number of rows updated."""
    t = spark.read.parquet(path)
    n_upd = t.filter(predicate).count()
    if n_upd:
        cols = [
            F.when(predicate, assignments[c]).otherwise(F.col(c)).alias(c)
            if c in assignments
            else F.col(c)
            for c in t.columns
        ]
        _swap_write(spark, path, t.select(*cols))
    return n_upd


def merge_upsert(
    spark: SparkSession, path: str, source: DataFrame, key_cols: list[str]
) -> None:
    """MERGE INTO t USING s ON keys WHEN MATCHED UPDATE * WHEN NOT
    MATCHED INSERT * — implemented as anti-join + union (the classic
    copy-on-write merge; Iceberg's MERGE INTO plans the same shape with
    file-group pruning on the join keys)."""
    t = spark.read.parquet(path)
    kept = t.join(source.select(*key_cols), key_cols, "left_anti")
    merged = kept.unionByName(source.select(*t.columns))
    _swap_write(spark, path, merged)

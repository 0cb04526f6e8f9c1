"""Statistics operators — the reference's ANALYZE family (SURVEY.md §2.9).

Reference semantics mined from:
- TopKAggregate (Count-Min-backed top-k frequent values):
  /root/reference/src/include/execution/sql/aggregators.h:372-380
- HistogramAggregate: aggregators.h:469
- HyperLogLog distinct: /root/reference/src/optimizer/statistics/hyperloglog.h:23
- ANALYZE pipeline: /root/reference/src/execution/compiler/operator/analyze_translator.cpp

Spark-first split:
- Exact, driver-verifiable plans (heavy hitters, equi-width histogram,
  per-column stats) — these are what the optimizer/skew-detection
  actually consumes at test scale, and they hash-match a DuckDB oracle.
- Approximate sketches (``approx_count_distinct`` HLL, a Count-Min
  sketch built from xxhash64 bucketing) — hash-seeded, so they are
  pytest-verified by their mathematical guarantees (CMS overestimates
  by at most eps*N; HLL within rsd) rather than by value equality.

At 100 TB the exact paths stay shuffle-light: heavy hitters is a
partial-agg groupBy on the value (same shape at any scale) followed by
a k-row TakeOrdered; the histogram is one static agg (min/max) plus one
partial-agg groupBy on a 16-value key; CMS is a groupBy on (depth,
bucket) — depth*width cells total, independent of N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, col: str, k: int = 20) -> DataFrame:
    """Exact top-k most frequent values of ``col`` with a deterministic
    tie-break (count desc, value asc) — TopKAggregate's contract,
    computed exactly: partial-agg groupBy + TakeOrderedAndProject.

    The rank column is derived from the (≤ k-row) sorted take on the
    driver rather than an unpartitioned Window.orderBy — that pattern is
    a single-task trap if ever reused before the limit."""
    counted = df.groupBy(F.col(col).alias("value")).agg(F.count("*").alias("cnt"))
    rows = counted.orderBy(F.desc("cnt"), F.asc("value")).limit(k).collect()
    val_t = dict(counted.dtypes)["value"]
    return df.sparkSession.createDataFrame(
        [(r["value"], int(r["cnt"]), i + 1) for i, r in enumerate(rows)],
        schema=f"value {val_t}, cnt long, rank long",
    )


def equi_width_histogram(df: DataFrame, col: str, bins: int = 16) -> DataFrame:
    """Exact equi-width histogram: (bin, lo, hi, cnt) with every bin
    present (zero-filled).  Two jobs: one static agg for [min, max]
    (a 2-double collect), one partial-agg groupBy on the bin id."""
    spark = df.sparkSession
    r = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).collect()[0]
    if r["lo"] is None or r["hi"] is None:
        # Entirely-NULL column or empty table: a zero-filled grid with
        # NULL bounds (no range exists to bin over).
        return spark.range(bins).select(
            F.col("id").alias("bin"),
            F.lit(None).cast("double").alias("bin_lo"),
            F.lit(None).cast("double").alias("bin_hi"),
            F.lit(0).cast("long").alias("cnt"),
        )
    lo, hi = float(r["lo"]), float(r["hi"])
    width = (hi - lo) or 1.0
    bin_col = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width) * bins), F.lit(bins - 1)
    ).cast("long")
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_col.alias("bin"))
        .agg(F.count("*").alias("cnt"))
    )
    grid = spark.range(bins).select(F.col("id").alias("bin"))
    return (
        grid.join(counts, "bin", "left")
        .select(
            "bin",
            F.bround(F.lit(lo) + F.col("bin") * F.lit(width / bins), 6).alias("bin_lo"),
            F.bround(F.lit(lo) + (F.col("bin") + 1) * F.lit(width / bins), 6).alias("bin_hi"),
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
        .orderBy("bin")
    )


def column_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact per-column ANALYZE row: (col_name, n_rows, n_distinct,
    n_nulls, min_str, max_str) — the pg_statistic projection computed
    exactly.  One job; all columns aggregate in a single pass."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count_distinct(F.col(c)).alias(f"{c}__ndv"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    parts = []
    for c in cols:
        parts.append(
            row.select(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__rows").alias("n_rows"),
                F.col(f"{c}__ndv").alias("n_distinct"),
                F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col_name")


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.05) -> int:
    """HLL distinct count (approx_count_distinct — the reference's
    hyperloglog.h).  Hash-seeded: verified in pytest by |approx-exact|
    <= 4*rsd*exact, not by oracle equality."""
    return int(
        df.agg(F.approx_count_distinct(F.col(col), rsd).alias("a")).collect()[0]["a"]
    )


def count_min_sketch(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch table: (d, bucket, cnt) with depth*width cells —
    the reference's count_min_sketch.h as a tiny groupBy.  Deterministic
    given xxhash64; estimates via :func:`cms_estimate`."""
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width)).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("c")
    ).select("c.d", "c.bucket")
    return rows.groupBy("d", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    cms: DataFrame, values: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point estimates for ``values[col]``: min over depths of the
    bucket counts (classic CMS upper-bound estimate)."""
    keyed = values.select(
        F.col(col).alias("value"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    F.pmod(F.xxhash64(F.col(col), F.lit(d)), F.lit(width)).alias("bucket"),
                )
                for d in range(depth)
            ])
        ).alias("c"),
    ).select("value", "c.d", "c.bucket")
    return (
        keyed.join(F.broadcast(cms), ["d", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("estimate"))
    )

"""Explicit skew salting (north rule: "explicit salting/repartitioning
to tame hot-term skew (e.g., 'int', 'return')"; SURVEY.md §7.6).

Reference analog: the 512-way radix overflow partitions of the parallel
aggregation (/root/reference/src/include/execution/sql/
aggregation_hash_table.h:62, TransferMemoryAndPartitions :209) — a hot
group is split across partitions in phase 1 and recombined in phase 2.

Two forms:

- ``salted_agg``: two-phase aggregation — groupBy(key, salt) partials,
  then groupBy(key) finals.  For algebraic aggregates (sum/count/min/
  max) the result is IDENTICAL to the direct groupBy; the salt only
  changes the shuffle layout, bounding any single reducer's share of a
  hot key to ~1/n_salts.  (Spark's partial aggregation already does
  map-side combine; explicit salting additionally protects the REDUCE
  side when one key's combined partials still overwhelm one task —
  e.g. high-cardinality payloads per key, or collect_list-style
  aggregates that cannot partial-combine.)
- ``salted_hot_join``: broadcast-free skew join — hot keys (from the
  heavy-hitter stats pass, operators/sketch.py) are replicated on the
  small side once per salt, while big-side rows get a random-but-
  deterministic salt, so a hot key's rows spread over n_salts reducers.

The index build itself uses the structural variant of the same idea:
posting lists are stored as (term, bucket) blocks with bucket =
docno-range salt (operators/index_build.py), so a term in 30% of all
docs is millions of bounded rows, never one reducer's problem.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_col: Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max}.  Phase 1 groups by (keys..., salt) and
    computes partials; phase 2 merges partials per key (count merges
    with sum).  Result equals the direct groupBy exactly.

    ``salt_col`` defaults to a deterministic hash of the whole row
    (xxhash64 of all columns mod n_salts) so re-runs shuffle
    identically; pass e.g. ``F.floor(F.rand(seed)*n)`` if hash
    collisions on duplicate rows matter for balance.
    """
    allowed = {"sum", "count", "min", "max"}
    for out, (_, fn) in aggs.items():
        if fn not in allowed:
            raise ValueError(f"{out}: {fn} is not algebraic-mergeable here")
    if salt_col is None:
        salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))

    phase1 = df.withColumn("__salt", salt_col).groupBy(*key_cols, "__salt").agg(
        *[
            getattr(F, fn)(col).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    merged = phase1.groupBy(*key_cols).agg(
        *[
            (F.sum(out) if fn in ("sum", "count") else getattr(F, fn)(out)).alias(out)
            for out, (_, fn) in aggs.items()
        ]
    )
    return merged


def salted_hot_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: list,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join where ``hot_keys`` of ``big`` are salted.

    Hot big-side rows get salt = xxhash64(row) % n_salts; the small
    side is replicated n_salts times FOR HOT KEYS ONLY (cold keys keep
    one copy with salt 0), and the join runs on (key, salt).  Output
    equals big ⋈ small exactly; the hot keys' rows are spread over
    n_salts reducers instead of one.  ``hot_keys`` comes from the
    heavy-hitter stats pass (sketch.heavy_hitters) — the reference's
    TopKAggregate feeding its partition decision."""
    hot_lit = F.array(*[F.lit(k) for k in hot_keys])
    big_s = big.withColumn(
        "__salt",
        F.when(
            F.array_contains(hot_lit, F.col(key)),
            F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)),
        ).otherwise(F.lit(0)),
    )
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    small_s = (
        small.join(salts, F.array_contains(hot_lit, F.col(key)) | (salts["__salt"] == 0))
    )
    joined = big_s.join(small_s, [key, "__salt"])
    return joined.drop("__salt")

"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``          : brute-force exact top-k vs a query vector.
  The dot product / norms are JVM built-ins (F.aggregate / F.zip_with) —
  no Python in the scan; top-k is TakeOrderedAndProject (per-partition
  heaps + merge, the reference's SorterSortTopKParallel,
  /root/reference/src/execution/sql/sorter.cpp:153-315).
- ``cosine_topk_pandas``   : same semantics through a vectorized Arrow
  kernel (numpy matmul per batch) — the faster path when k and dim are
  large; used to cross-check the built-in path.
- ``ivf_topk``             : IVF-style ANN — k-means-lite centroids
  (deterministic seeded sample, Lloyd iterations in numpy on a sample),
  vectors bucketed to nearest centroid at index time; queries probe the
  ``nprobe`` nearest centroids only.  The scale path: scan cost drops
  to nprobe/C of the corpus; bucket assignment is a broadcast of C
  centroids, never a shuffle of the vectors.
- ``embedding_neardup_pairs``: all-pairs cosine ≥ threshold via LSH
  (random-hyperplane signatures, banded) verified exactly.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity. Returns (vec_id, cos) ordered by
    cos desc, vec_id asc; cos rounded to 1e-9 for a stable tie-break.

    Zero-norm vectors (cosine undefined; a plain division would THROW
    under ANSI mode, Spark 4's default, and yield NULL otherwise) are
    pinned to -Infinity via try_divide+coalesce so they rank LAST
    deterministically on every config — the same contract as the pandas
    twin, whose numpy 0/0 would otherwise yield NaN, which Spark orders
    ABOVE every double and would rank FIRST (review finding r4)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    qcol = F.array(*[F.lit(float(x)) for x in q])
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cos = F.coalesce(
        F.bround(F.try_divide(_dot(vec_d, qcol), _norm(vec_d) * F.lit(qn)), 9),
        F.lit(float("-inf")),
    )
    return (
        df.select(F.col(id_col).alias("vec_id"), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_pandas(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same as cosine_topk via a numpy matmul Arrow kernel: per input
    partition emit only its local top-k, then global TakeOrdered.
    Zero-norm vectors score -Infinity (rank last) exactly like the JVM
    twin — a raw numpy 0/0 would yield NaN, which pandas sorts LAST in
    the local head(k) but Spark's final orderBy ranks FIRST, silently
    promoting e.g. an all-zeros padding row to rank 1 (review finding
    r4)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum())

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for b in it:
            m = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            denom = np.linalg.norm(m, axis=1) * qn
            cos = np.divide(
                m @ q,
                denom,
                out=np.full(len(m), -np.inf),
                where=denom > 0,
            )
            part = pd.DataFrame({"vec_id": b[id_col], "cos": np.round(cos, 9)})
            best = part if best is None else pd.concat([best, part])
            best = best.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        if best is not None:
            yield best

    idt = dict(df.dtypes)[id_col]
    local = df.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"vec_id {idt}, cos double"
    )
    return local.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


# ------------------------------------------------------------------ IVF

def train_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    sample: int = 2048,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> np.ndarray:
    """Lloyd's k-means on a deterministic sample (driver-side numpy).
    At 100 TB the sample is still tiny; the expensive part (assignment)
    stays distributed in ivf_assign.  The sample key hashes the ID
    column (xxhash64 + seed) — partition-order-independent and far
    cheaper than hashing the vectors themselves; TakeOrdered keeps it
    from ever being a full sort."""
    rows = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(sample)
        .collect()
    )
    x = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cluster`` column: nearest centroid (broadcast, Arrow kernel)."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for b in it:
            m = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            d = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            b = b[[id_col, vec_col]].copy()
            b["cluster"] = d.argmin(axis=1).astype(np.int32)
            yield b

    vt = dict(df.dtypes)[vec_col]
    idt = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} {idt}, {vec_col} {vt}, cluster int"
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k probing the nprobe nearest clusters.  When ``assigned``
    was read from a write_ivf_index layout (hive-partitioned by
    cluster), the isin filter becomes PartitionFilters on the scan and
    only nprobe/C of the FILES are read — asserted in
    tests/test_similarity.py.  On an in-memory assigned frame it's an
    ordinary filter (full scan, pruned rows)."""
    q = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d)[:nprobe]]
    cand = assigned.filter(F.col("cluster").isin(probe))
    return cosine_topk_pandas(cand, query_vec, k, id_col, vec_col)


def write_ivf_index(
    assigned: DataFrame, centroids: np.ndarray, path: str
) -> None:
    """Persist the IVF layout that makes the nprobe/C scan-cost claim
    physical: vectors hive-partitioned BY CLUSTER (one cluster=K
    directory each, so a probe's isin predicate prunes whole
    directories at planning time) plus the centroid table.  Mirrors
    write_index's partitionBy for postings blocks."""
    assigned.write.partitionBy("cluster").mode("overwrite").parquet(
        f"{path}/vectors"
    )
    spark = assigned.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf_index(spark, path: str) -> tuple[DataFrame, np.ndarray]:
    """(partition-pruned-capable vectors DataFrame, centroids array)."""
    vecs = spark.read.parquet(f"{path}/vectors")
    crows = spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    cents = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in crows])
    return vecs, cents


# ------------------------------------------------- embedding near-dup LSH

def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    bits_per_band: int = 8,
    n_bands: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine ≥ threshold via random-hyperplane LSH, verified
    exactly — so the output has no false positives and equals the
    brute-force scan whenever the band curve's recall reaches 1.

    Banding is corpus-sizable (the round-1 fixed two-8-bit-bucket layout
    capped the space at 256 buckets and went quadratic within buckets):
    n_planes = bits_per_band × n_bands sign bits; band i's key is its
    bits_per_band bits, so each band has 2^bits_per_band buckets.  With
    p = 1 - acos(threshold)/π the per-pair detect probability is
    1 - (1 - p^bits)^bands: size bits_per_band ≈ log2(N / target bucket
    size) at scale (e.g. 20-24 bits for 10⁹+ vectors) and spend bands
    for recall.  At test scale the driver entry uses bits=2, bands=32:
    recall ≈ 1 - 9e-8 at threshold 0.4, which the exact DuckDB oracle
    confirms as equality.

    Candidates carry only ids through the bucket join; vectors are
    re-attached for the exact verify afterwards."""
    idt = dict(df.dtypes)[id_col]
    first = df.select(vec_col).first()
    if first is None:  # empty input: no pairs, not a TypeError
        return df.sparkSession.createDataFrame(
            [], f"id1 {idt}, id2 {idt}, cos double"
        )
    dim = len(first[vec_col])
    n_planes = bits_per_band * n_bands
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    spark = df.sparkSession
    bp = spark.sparkContext.broadcast(planes)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bp.value
        weights = 1 << np.arange(bits_per_band, dtype=np.int64)
        for b in it:
            if not len(b):
                continue
            mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ pl.T) > 0  # (rows, n_planes)
            keys = (
                bits.reshape(len(b), n_bands, bits_per_band) * weights
            ).sum(axis=2)  # (rows, n_bands)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(b[id_col].to_numpy(), n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), len(b)),
                    "bkey": keys.reshape(-1).astype(np.int64),
                }
            )

    sig = df.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"vec_id {idt}, band int, bkey long"
    )

    cand = (
        sig.alias("x")
        .join(sig.alias("y"), ["band", "bkey"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("id1"), F.col("y.vec_id").alias("id2"))
        .dropDuplicates(["id1", "id2"])
    )
    vecs = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    pairs = cand.join(
        vecs.select(F.col("vid").alias("id1"), F.col("v").alias("v1")), "id1"
    ).join(vecs.select(F.col("vid").alias("id2"), F.col("v").alias("v2")), "id2")

    v1 = F.transform("v1", lambda x: x.cast("double"))
    v2 = F.transform("v2", lambda x: x.cast("double"))
    # try_divide: a zero-norm side has undefined cosine — NULL, which
    # the threshold filter drops (a plain / would throw under ANSI)
    cos = F.bround(F.try_divide(_dot(v1, v2), _norm(v1) * _norm(v2)), 9)
    return (
        pairs.withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )

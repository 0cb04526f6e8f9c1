"""Deduplication operators for training-data pipelines (driver brief).

Four families, all shuffle-conscious:

- exact          : groupBy(md5(normalized text)) — one shuffle on a
                   16-byte key, survivor = min(doc_id).
- ngram Jaccard  : exact all-pairs similarity via an inverted index on
                   shingles (join on shingle, groupBy pair) — the
                   classic "similarity join via prefix index" shape;
                   candidate space is bounded because only docs sharing
                   a shingle ever meet (no cartesian).
- MinHash + LSH  : per-doc signatures from xxhash64 (JVM built-in — the
                   whole signature pipeline is codegen'd, no Python),
                   banded into buckets; docs colliding in ≥1 band become
                   candidate pairs, verified with exact Jaccard.  This is
                   the 100 TB path: cost ~ O(docs × perms) + bucket joins.
- SimHash        : 64-bit signatures via a vectorized pandas UDF (numpy
                   bit matrix), near-dup = Hamming distance ≤ d, banded
                   on 4×16-bit chunks so candidates collide on ≥1 chunk
                   (sound for d ≤ 3 by pigeonhole).

Reference analog: dedup is DISTINCT/groupBy in the reference
(/root/reference/src/optimizer/query_to_operator_transformer.cpp:110-122
rewrites SELECT DISTINCT to GROUP BY; hash-agg runtime
src/execution/sql/aggregation_hash_table.cpp) — these operators are the
content-aware generalizations.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from terrier_spark.functions.text_stats import fingerprint, ws_tokens


# ---------------------------------------------------------------- exact

def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct normalized content: (fingerprint, survivor
    doc_id = min, dup_count)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count("*").alias("dup_count"),
        )
    )


# ------------------------------------------------------- shingles / jaccard

def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the (whitespace) token stream.
    Docs with fewer than n tokens yield an empty set."""
    toks = ws_tokens(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact all-pairs Jaccard ≥ threshold over n-gram shingle SETS.

    Inverted-index join: explode shingles, self-join on shingle with
    id1 < id2, count shared shingles per pair, then
    jaccard = inter / (|A| + |B| - inter).  Only docs sharing ≥1 shingle
    are ever paired.  Output: (id1, id2, jaccard).
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"), shingles(text_col, n).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select("doc_id", "n_sh", F.explode("sh").alias("shingle"))
    a = ex.select(
        F.col("doc_id").alias("id1"), F.col("n_sh").alias("n1"), "shingle"
    )
    b = ex.select(
        F.col("doc_id").alias("id2"), F.col("n_sh").alias("n2"), "shingle"
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2", "n1", "n2")
        .agg(F.count("*").alias("inter"))
    )
    jac = pairs.withColumn(
        "jaccard",
        F.round(F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")), 9),
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id1", "id2", "jaccard")


# ------------------------------------------------------------ minhash LSH

def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via MinHash LSH, verified with exact Jaccard.

    bands × rows_per_band = num_perm; collision in any band → candidate.
    Candidates are verified against the true shingle sets, so output has
    no false positives (recall depends on the band curve).
    Output: (id1, id2, jaccard).
    """
    assert num_perm % bands == 0
    rows_per = num_perm // bands
    base = df.select(
        F.col(id_col).alias("doc_id"),
        shingles(text_col, n).alias("sh"),
    ).filter(F.size("sh") > 0).persist()

    # Signature via explode + groupBy: each exploded (doc, shingle) row
    # computes all num_perm hashes in one codegen'd projection and the
    # partial-aggregating min collapses them map-side.  (A transform()
    # lambda per permutation over the shingle array re-walks the array
    # num_perm times through interpreted HigherOrderFunctions — orders of
    # magnitude slower and not partially aggregated.)
    ex = base.select("doc_id", F.explode("sh").alias("shingle"))
    sig = ex.groupBy("doc_id").agg(
        *[F.min(F.xxhash64("shingle", F.lit(j))).alias(f"h{j}") for j in range(num_perm)]
    )

    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.col(f"h{bi * rows_per + r}").cast("string") for r in range(rows_per)]
                            )
                        ).alias("bhash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bhash")

    cand = (
        band_rows.alias("x")
        .join(band_rows.alias("y"), ["band", "bhash"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id1"), F.col("y.doc_id").alias("id2")
        )
        .distinct()
    )
    sh1 = base.select(F.col("doc_id").alias("id1"), F.col("sh").alias("sh1"))
    sh2 = base.select(F.col("doc_id").alias("id2"), F.col("sh").alias("sh2"))
    verified = (
        cand.join(sh1, "id1")
        .join(sh2, "id2")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh1", "sh2"))
                / F.size(F.array_union("sh1", "sh2")),
                9,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )
    return verified


# --------------------------------------------------------------- simhash

def simhash_df(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash:long) — 64-bit SimHash over whitespace tokens.

    Vectorized pandas UDF: per Arrow batch, hash all tokens (numpy via
    pandas hashing), accumulate a ±1 bit matrix, sign → bits.
    """
    from pandas.util import hash_array

    tok_df = df.select(F.col(id_col).alias("doc_id"), ws_tokens(text_col).alias("toks"))

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(64, dtype=np.uint64)
        for b in it:
            out = np.zeros(len(b), dtype=np.uint64)
            for i, toks in enumerate(b["toks"]):
                if toks is None or len(toks) == 0:
                    continue
                h = hash_array(np.asarray(toks, dtype=object))  # uint64 per token
                bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                v = (2 * bits - 1).sum(axis=0)
                out[i] = ((v > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            yield pd.DataFrame(
                {"doc_id": b["doc_id"], "simhash": out.view(np.int64)}
            )

    id_type = dict(tok_df.dtypes)["doc_id"]
    return tok_df.mapInPandas(kernel, schema=f"doc_id {id_type}, simhash long")


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via 4×16-bit banding.

    Sound for max_hamming ≤ 3: two signatures within distance 3 agree
    exactly on ≥1 of the 4 chunks (pigeonhole)."""
    sig = simhash_df(df, id_col, text_col).persist()
    chunks = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cval"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk", "cc.cval")
    cand = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["chunk", "cval"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id1"),
            F.col("y.doc_id").alias("id2"),
            F.col("x.simhash").alias("s1"),
            F.col("y.simhash").alias("s2"),
        )
        .distinct()
    )
    ham = cand.withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
    return ham.filter(F.col("hamming") <= max_hamming).select("id1", "id2", "hamming")

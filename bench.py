"""Driver benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "index_build": {"n_docs": ..., "docs_per_sec": ...}}

The headline set covers every engine layer: relational operators
(scan/filter/agg/join/window/top-k), the IR pipeline (tokenize →
inverted-index build → BM25 top-10, both the exploded and the
compressed-block path), dedup (exact + MinHash-LSH), similarity
search, and text analysis.  index_build additionally reports docs/sec
on the synthetic source-code corpus (BASELINE.json metric).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# docs for the synthetic-corpus index-build throughput probe
BENCH_CORPUS_DOCS = int(os.environ.get("BENCH_CORPUS_DOCS", "20000"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_revenue",
    "q_topk_limit_offset",
    "q_window_rank",
    "q_sessionize",
    "q_rollup",
    "ir_term_stats",
    "ir_bm25_topk",
    "text_stats",
    "dedup_exact_docs",
    "dedup_minhash_pairs",
    "emb_cosine_topk",
    "emb_knn_per_label",
]


def main() -> None:
    from terrier_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="terrier_spark_bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the session (codegen, parquet reader, shuffle machinery)
    # before timing — otherwise the first query absorbs one-time JIT
    # cost that isn't attributable to any plan.
    from pyspark.sql import functions as _F

    warm = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    warm.groupBy("l_returnflag").agg(_F.count("*")).collect()

    # Pre-fork the Python workers too (numpy/pyarrow import + Arrow IPC
    # setup, ~0.5s per worker): the first Arrow-kernel query otherwise
    # absorbs one spawn wave — session cost, not plan cost.  One tiny
    # batch per core.
    def _noop(batches):
        yield from batches

    cores = spark.sparkContext.defaultParallelism
    spark.range(cores, numPartitions=cores).mapInArrow(
        _noop, "id long"
    ).count()

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.monotonic()
        n = fn(spark, SF_DIR).count()
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    # Index-build throughput on the north-rule corpus shape
    # (repo/path/commit/lang/content, 50-2000 tokens per doc).
    from terrier_spark.corpus import corpus_df, doc_id_of
    from terrier_spark.operators.index_build import build_index

    from pyspark.sql import functions as F

    docs = corpus_df(spark, BENCH_CORPUS_DOCS).withColumn(
        "doc_id", F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256)
    )
    # Materialize the synthetic corpus BEFORE the timed region (the cli
    # bench reads pre-written parquet; counting generation as build time
    # understated throughput by ~3x at this size).
    docs = docs.persist()
    docs.count()
    t0 = time.monotonic()
    idx = build_index(docs, id_col="doc_id", text_col="content")
    # force the full build incl. compressed blocks + lexicon
    n_blocks = idx.blocks.count()
    n_terms = idx.lexicon.count()
    build_s = time.monotonic() - t0
    docs_per_sec = BENCH_CORPUS_DOCS / build_s
    timings["ir_index_build_20k"] = round(build_s, 3)
    total += build_s
    print(
        f"# index build: {BENCH_CORPUS_DOCS} docs in {build_s:.2f}s = "
        f"{docs_per_sec:.0f} docs/s ({n_terms} terms, {n_blocks} blocks)",
        file=sys.stderr,
    )

    # BM25 top-10 latency over a warm index (query-path latency, separate
    # from build): mean over the reference-style query mix.
    from terrier_spark.operators.score import bm25_topk_blocks, bm25_topk_exploded

    idx.postings.persist().count()
    idx.blocks.persist().count()
    queries = ["int return", "foo_bar baz", "template namespace std", "func defer chan", "idx ptr val buf"]
    lat = []
    for q in queries:
        t0 = time.monotonic()
        bm25_topk_exploded(idx, q, 10).collect()
        lat.append(time.monotonic() - t0)
    bm25_mean = sum(lat) / len(lat)
    timings["ir_bm25_query_warm"] = round(bm25_mean, 3)
    total += bm25_mean
    t0 = time.monotonic()
    bm25_topk_blocks(idx, "int return foo_bar", 10).collect()
    timings["ir_bm25_blocks_warm"] = round(time.monotonic() - t0, 3)
    total += timings["ir_bm25_blocks_warm"]
    print(f"# bm25 warm query mean: {bm25_mean:.3f}s", file=sys.stderr)

    # Whole-query-set batch evaluation: the SAME 5 queries in ONE pass
    # (shared scan/decode, one window for all top-ks) — compare against
    # 5 × ir_bm25_query_warm for the amortization factor.
    from terrier_spark.operators.score import bm25_topk_batch

    t0 = time.monotonic()
    bm25_topk_batch(idx, {f"q{i}": q for i, q in enumerate(queries)}, 10).collect()
    batch_s = time.monotonic() - t0
    timings["ir_bm25_batch5_warm"] = round(batch_s, 3)
    total += batch_s
    print(
        f"# bm25 batch (5 queries, one pass): {batch_s:.3f}s = "
        f"{batch_s / len(queries):.3f}s/query vs {bm25_mean:.3f}s sequential",
        file=sys.stderr,
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline query wall-clock (relational + IR + dedup + similarity) & index-build throughput",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "index_build": {
            "n_docs": BENCH_CORPUS_DOCS,
            "seconds": round(build_s, 3),
            "docs_per_sec": round(docs_per_sec, 1),
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

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

# Shuffle + scratch on tmpfs when available: this sandbox's one shared
# virtio disk exhibits multi-minute stall windows (loadavg 5-10 of
# D-state tasks with the CPUs 99.9% idle, measured), which put a serial,
# externally-timed floor under every shuffle write and scratch
# materialization.  Cluster executors shuffle to node-local NVMe, so the
# tmpfs stand-in is the truer model of the 100 TB deployment; the
# scaling harnesses (scripts/scaling_*.py) already default to it.
# Both knobs stay env-overridable.
if os.path.isdir("/dev/shm"):
    # Per-user path: a shared fixed name is created 0755 by the first
    # user and is then unwritable for every other user's blockmgr dirs.
    _shm = f"/dev/shm/spark-tmp-{os.getuid()}"
    os.makedirs(_shm, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", _shm)   # spark.local.dir
    os.environ.setdefault("TMPDIR", _shm)                  # scratch parquet

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

    # Absorb whole-stage-codegen/JIT for the build+score plan shapes on
    # a 64-doc corpus (same principle as above: the first index build
    # otherwise pays several seconds of one-time JVM compilation that
    # is session cost, not plan cost — measured 7.2 -> 3.1 s across
    # cache-cleared repeats of the identical cold build+query).  The
    # timed rows below still do ALL their own data work: this corpus is
    # three orders of magnitude smaller and every cache is dropped.
    from terrier_spark.corpus import corpus_df as _cdf
    from terrier_spark.operators.index_build import build_index as _bi
    from terrier_spark.operators.score import (
        bm25_topk_blocks as _btb,
        bm25_topk_exploded as _bte,
    )

    _wd = _cdf(spark, 64).withColumn(
        "doc_id", _F.sha2(_F.concat_ws("\x00", "repo", "path", "commit"), 256)
    )
    _widx = _bi(_wd, text_col="content", positions=True)
    _bte(_widx, "int return", 3).count()
    _btb(_widx, "int return", 3).count()
    for _h in (_widx.blocks, _widx.lexicon, _widx.docmap):
        if _h is not None:
            _h.unpersist()

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
    from terrier_spark.corpus import corpus_df
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
    # from build): mean over the reference-style query mix, through the
    # single-query batch-kernel path (bm25_topk — one Spark action with
    # the driver lexicon cache hot; VERDICT r3 item 7).
    from terrier_spark.operators.score import (
        bm25_topk, bm25_topk_blocks, bm25_topk_exploded,
    )

    # Only blocks are cached: every scorer routes through _term_postings,
    # which decodes postings_from_blocks(blocks.filter(term IN ...)) — the
    # cached blocks table IS a subtree of that plan, while a cached FULL
    # exploded postings table never matches it (the filter sits under the
    # decode).  The old idx.postings.persist().count() eagerly decoded
    # ~2M rows nothing ever read and pressured executor memory through
    # every timed query (review finding r4).
    idx.blocks.persist().count()
    queries = ["int return", "foo_bar baz", "template namespace std", "func defer chan", "idx ptr val buf"]
    # warm the path once: fills the per-index driver lexicon cache and
    # the Python workers for the batch kernel (session cost, not plan
    # cost — every later query benefits identically)
    bm25_topk(idx, "int warmup", 10).collect()
    lat = []
    for q in queries:
        t0 = time.monotonic()
        bm25_topk(idx, q, 10).collect()
        lat.append(time.monotonic() - t0)
    bm25_mean = sum(lat) / len(lat)
    timings["ir_bm25_query_warm"] = round(bm25_mean, 3)
    total += bm25_mean
    # the exploded-postings plan, tracked separately (round-over-round
    # comparability with r1-r3, where ir_bm25_query_warm measured it)
    lat_ex = []
    for q in queries:
        t0 = time.monotonic()
        bm25_topk_exploded(idx, q, 10).collect()
        lat_ex.append(time.monotonic() - t0)
    timings["ir_bm25_exploded_warm"] = round(sum(lat_ex) / len(lat_ex), 3)
    total += sum(lat_ex) / len(lat_ex)
    t0 = time.monotonic()
    bm25_topk_blocks(idx, "int return foo_bar", 10).collect()
    timings["ir_bm25_blocks_warm"] = round(time.monotonic() - t0, 3)
    total += timings["ir_bm25_blocks_warm"]
    print(
        f"# bm25 warm query mean: {bm25_mean:.3f}s single-action path, "
        f"{timings['ir_bm25_exploded_warm']:.3f}s exploded",
        file=sys.stderr,
    )

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

    # 20-query batch: the amortization curve the 100x-scale story rests
    # on (VERDICT r4 item 6) — per-query cost should keep falling as the
    # batch widens, because the scan/decode of the term-union postings
    # is shared and only the per-query masked sums grow.
    base_terms = (
        "int return foo_bar baz template namespace std func defer "
        "chan idx ptr val buf"
    ).split()
    queries20 = [
        f"{base_terms[i % len(base_terms)]} {base_terms[(i * 7 + 3) % len(base_terms)]}"
        for i in range(20)
    ]
    t0 = time.monotonic()
    bm25_topk_batch(idx, {f"b{i}": q for i, q in enumerate(queries20)}, 10).collect()
    batch20_s = time.monotonic() - t0
    timings["ir_bm25_batch20_warm"] = round(batch20_s, 3)
    total += batch20_s
    print(
        f"# bm25 batch (20 queries, one pass): {batch20_s:.3f}s = "
        f"{batch20_s / 20:.3f}s/query (5-query batch: "
        f"{batch_s / len(queries):.3f}s/query)",
        file=sys.stderr,
    )

    # Positional build + phrase-query rows (the r3 flagship feature was
    # previously untracked round-over-round — VERDICT r3 item 5): build
    # the SAME corpus with positions=True and run a phrase + proximity
    # query warm over it.
    from terrier_spark.operators.phrase import (
        phrase_match_indexed, proximity_match_indexed,
    )

    # The plain index's caches (blocks persists, lexicon, docmap, the
    # scorer's lexicon driver cache) are dead weight from here on — drop
    # them BEFORE the timed positional build so the row isn't charged
    # GC/heap pressure from the previous rows' working set (the row is
    # meant to track the BUILD, not the session's history; an isolated
    # warm positional build measures ~1.1-1.3x the plain build, while
    # this row intermittently read 2-6x inside the full bench session).
    for h in (idx.blocks, idx.lexicon, idx.docmap):
        if h is not None:
            h.unpersist()

    t0 = time.monotonic()
    pidx = build_index(docs, id_col="doc_id", text_col="content", positions=True)
    pidx.blocks.count()
    pidx.lexicon.count()
    pos_build_s = time.monotonic() - t0
    timings["ir_index_build_pos_20k"] = round(pos_build_s, 3)
    total += pos_build_s
    print(
        f"# positional build: {BENCH_CORPUS_DOCS} docs in {pos_build_s:.2f}s = "
        f"{BENCH_CORPUS_DOCS / pos_build_s:.0f} docs/s "
        f"({pos_build_s / build_s:.2f}x the plain build)",
        file=sys.stderr,
    )
    phrase_match_indexed(pidx, "int return").count()  # warm the kernel
    t0 = time.monotonic()
    n_ph = phrase_match_indexed(pidx, "int return").count()
    timings["ir_phrase_warm"] = round(time.monotonic() - t0, 3)
    total += timings["ir_phrase_warm"]
    t0 = time.monotonic()
    proximity_match_indexed(pidx, "int return", 8).count()
    timings["ir_proximity_warm"] = round(time.monotonic() - t0, 3)
    total += timings["ir_proximity_warm"]
    print(
        f"# phrase warm: {timings['ir_phrase_warm']:.3f}s ({n_ph} docs), "
        f"proximity warm: {timings['ir_proximity_warm']:.3f}s",
        file=sys.stderr,
    )
    for h in (pidx.blocks, pidx.lexicon, pidx.docmap):
        if h is not None:
            h.unpersist()

    # End-to-end content-sha256 integrity (the north-rule invariant,
    # operators/integrity.py): fingerprint the 20k corpus and verify
    # per-row equality — one codegen sha projection per side plus the
    # violations-only full-outer join.  Tracked so regressions in the
    # enforcement path are visible round-over-round.
    from terrier_spark.operators import integrity

    t0 = time.monotonic()
    fps = integrity.content_fingerprints(docs, text_col="content")
    n_viol = integrity.verify_content(docs, fps, text_col="content").count()
    integ_s = time.monotonic() - t0
    timings["integrity_verify_20k"] = round(integ_s, 3)
    total += integ_s
    if n_viol:
        print(f"# integrity: UNEXPECTED {n_viol} violations", file=sys.stderr)
    print(
        f"# integrity verify: {BENCH_CORPUS_DOCS} docs in {integ_s:.2f}s "
        f"({n_viol} violations)",
        file=sys.stderr,
    )

    # DML throughput (the reference's TPC-C items/sec analog,
    # benchmark/integration/tpcc_benchmark.cpp:153-155 — VERDICT r3 item
    # 10): MERGE upsert + UPDATE + DELETE through sources/dml.py over a
    # scratch copy of orders; rows/s = table rows rewritten per second.
    import shutil as _shutil

    from terrier_spark.plans.relational import _scratch_dir
    from terrier_spark.sources import dml

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_orders = orders.count()
    dml_path = _scratch_dir("bench_dml_orders")
    _shutil.rmtree(dml_path, ignore_errors=True)
    dml.create_table(orders, dml_path)
    upd_src = orders.limit(n_orders // 10).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.01
    )
    t0 = time.monotonic()
    dml.merge_upsert(spark, dml_path, upd_src, ["o_orderkey"])
    dml.update_where(
        spark, dml_path, F.col("o_orderstatus") == "F",
        {"o_totalprice": F.col("o_totalprice") * 0.99},
    )
    dml.delete_where(spark, dml_path, F.col("o_orderpriority") == "5-LOW")
    dml_s = time.monotonic() - t0
    timings["dml_merge_update_delete"] = round(dml_s, 3)
    total += dml_s
    print(
        f"# dml merge+update+delete over {n_orders} rows x3 ops: "
        f"{dml_s:.2f}s = {3 * n_orders / dml_s:.0f} rows/s",
        file=sys.stderr,
    )
    _shutil.rmtree(dml_path, ignore_errors=True)

    # YCSB-B analog (95% point reads / 5% point updates — the
    # reference's remaining OLTP nightly flight besides TPC-C,
    # script/testing/oltpbench/configs/nightly/nightly.json; VERDICT r4
    # item 9).  Spark is a batch engine, so the honest analog is the
    # microbatched form a streaming upsert sink would execute: one
    # 10,000-op batch = one broadcast-semi-join point-read of the 9,500
    # read keys + one merge_upsert of the 500 updated rows.  ops/s is
    # the batch op count over the batch wall time.
    from terrier_spark.sources import oltp

    ycsb_path = _scratch_dir("bench_ycsb_orders")
    _shutil.rmtree(ycsb_path, ignore_errors=True)
    dml.create_table(orders, ycsb_path)
    n_ops = 10_000
    keys = [r[0] for r in orders.select("o_orderkey").limit(n_ops).collect()]
    t0 = time.monotonic()
    n_read = oltp.point_mix(
        spark, ycsb_path, "o_orderkey",
        keys[: int(n_ops * 0.95)], keys[int(n_ops * 0.95):],
        "o_totalprice", 1.02,
    )
    ycsb_s = time.monotonic() - t0
    timings["dml_ycsb_b_mix"] = round(ycsb_s, 3)
    total += ycsb_s
    print(
        f"# ycsb-b mix: {n_ops} ops ({n_read} reads hit, "
        f"{n_ops - int(n_ops * 0.95)} updates) in {ycsb_s:.2f}s = "
        f"{n_ops / ycsb_s:.0f} ops/s",
        file=sys.stderr,
    )
    _shutil.rmtree(ycsb_path, ignore_errors=True)

    # TATP analog (80% point reads / 20% point updates by subscriber
    # key — reference nightly.json:11-19) over customer; same
    # microbatched point_mix, the mix ratio is the workload.
    tatp_path = _scratch_dir("bench_tatp_customer")
    _shutil.rmtree(tatp_path, ignore_errors=True)
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    dml.create_table(customer, tatp_path)
    tatp_ops = 10_000
    ckeys = [
        r[0] for r in customer.select("c_custkey").limit(tatp_ops).collect()
    ]
    t0 = time.monotonic()
    oltp.point_mix(
        spark, tatp_path, "c_custkey",
        ckeys[: int(tatp_ops * 0.8)], ckeys[int(tatp_ops * 0.8):],
        "c_acctbal", 1.01,
    )
    tatp_s = time.monotonic() - t0
    timings["dml_tatp_mix"] = round(tatp_s, 3)
    total += tatp_s
    print(
        f"# tatp mix: {tatp_ops} ops (80/20) in {tatp_s:.2f}s = "
        f"{tatp_ops / tatp_s:.0f} ops/s",
        file=sys.stderr,
    )
    _shutil.rmtree(tatp_path, ignore_errors=True)

    # SmallBank analog (reference nightly.json:24-33): two-table
    # SAVINGS/CHECKING schema, the published 5-transaction mix as one
    # microbatch (Balance 60%, the four write txns 10% each).
    sb_check = _scratch_dir("bench_sb_checking")
    sb_save = _scratch_dir("bench_sb_savings")
    for p in (sb_check, sb_save):
        _shutil.rmtree(p, ignore_errors=True)
    oltp.smallbank_setup(customer, sb_check, sb_save)
    t0 = time.monotonic()
    sb_ops = oltp.smallbank_mix(spark, sb_check, sb_save, ckeys)
    sb_s = time.monotonic() - t0
    timings["dml_smallbank_mix"] = round(sb_s, 3)
    total += sb_s
    print(
        f"# smallbank mix: {sb_ops} ops (60/10/10/10/10) in {sb_s:.2f}s "
        f"= {sb_ops / sb_s:.0f} ops/s",
        file=sys.stderr,
    )
    for p in (sb_check, sb_save):
        _shutil.rmtree(p, ignore_errors=True)

    # NoOp analog (reference nightly.json:51-59): per-action scheduling
    # floor — the fixed harness overhead under any microbatch rate.
    # Reported as its own field, NOT added to the headline total (it is
    # a latency floor, not work).
    noop_s = oltp.noop_floor(spark, n_actions=20)
    print(
        f"# noop floor: {noop_s * 1000:.1f} ms/action (median of 20 "
        f"empty one-task jobs)",
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
            "positional_seconds": round(pos_build_s, 3),
            "positional_docs_per_sec": round(BENCH_CORPUS_DOCS / pos_build_s, 1),
        },
        "dml": {
            "n_rows": n_orders,
            "ops": 3,
            "seconds": round(dml_s, 3),
            "rows_per_sec": round(3 * n_orders / dml_s, 1),
        },
        "ycsb_b": {
            "n_ops": n_ops,
            "read_frac": 0.95,
            "seconds": round(ycsb_s, 3),
            "ops_per_sec": round(n_ops / ycsb_s, 1),
        },
        "tatp": {
            "n_ops": tatp_ops,
            "read_frac": 0.8,
            "seconds": round(tatp_s, 3),
            "ops_per_sec": round(tatp_ops / tatp_s, 1),
        },
        "smallbank": {
            "n_ops": sb_ops,
            "seconds": round(sb_s, 3),
            "ops_per_sec": round(sb_ops / sb_s, 1),
        },
        "noop_floor_ms": round(noop_s * 1000, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

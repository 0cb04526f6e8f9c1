"""spark-submit entry points (north rule: "run via spark-submit
--py-files on a multi-executor cluster at two cluster sizes").

Usage (plain python or spark-submit — under spark-submit set
SPARK_GRAFT_MASTER or pass --master and the session respects it;
spark-submit takes a SCRIPT path as its primary resource, not -m, so
hand it this file):

  # build (resumable) and write an index
  spark-submit --master spark://host:7077 --py-files terrier_spark.zip \
      terrier_spark/cli.py build-index --n-docs 20000 --out /tmp/idx
  python -m terrier_spark.cli build-index --n-docs 20000 --out /tmp/idx
  python -m terrier_spark.cli query --index /tmp/idx --query "int return" -k 10
  python -m terrier_spark.cli verify-index --index /tmp/idx --corpus-parquet src.parquet
  python -m terrier_spark.cli bench --n-docs 20000 --cores 8,32

`bench` runs the identical build at each parallelism level in a FRESH
JVM (subprocess) and reports docs/sec per level plus scaling
efficiency = (T_high/T_low)/(c_high/c_low) — the sandbox stand-in for
N vs 4N executors (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _corpus(spark, n_docs: int):
    from pyspark.sql import functions as F

    from terrier_spark.corpus import corpus_df

    return corpus_df(spark, n_docs).withColumn(
        "doc_id", F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256)
    )


def cmd_gen_corpus(args) -> None:
    """Materialize the synthetic corpus to parquet (bench input prep)."""
    from terrier_spark.session import get_spark

    spark = get_spark(app_name="terrier_spark_gen", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    _corpus(spark, args.n_docs).write.mode("overwrite").parquet(args.out)
    print(json.dumps({"op": "gen-corpus", "n_docs": args.n_docs, "out": args.out}))
    spark.stop()


def cmd_build_index(args) -> None:
    from terrier_spark.session import get_spark
    from terrier_spark.operators.index_build import build_index, write_index

    spark = get_spark(app_name="terrier_spark_build", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    if args.corpus_parquet:
        docs = spark.read.parquet(args.corpus_parquet).persist()
    else:
        docs = _corpus(spark, args.n_docs).persist()
    n = docs.count()  # corpus generation excluded from build timing
    if args.warmup:
        # Warm JIT, shuffle machinery, and the Python worker pool so the
        # timed run measures steady-state throughput (the reference's
        # benchmark harness warms per-worker for 20s the same way,
        # /root/reference/benchmark/runner/tpch_runner.cpp:85-100).
        w = build_index(
            _corpus(spark, 2000), id_col="doc_id", text_col="content",
            positions=args.positions,
        )
        w.blocks.count()
        # release the warm-up caches before timing: the warm index's
        # persisted blocks/docmap/lexicon otherwise stay pinned in
        # executor memory through every timed rep (review finding r4)
        w.release()
    times = []
    idx = None
    for _ in range(max(args.reps, 1)):
        if idx is not None:  # drop previous rep's caches
            for df in (idx.blocks, idx.docmap, idx.lexicon):
                df.unpersist()
        t0 = time.monotonic()
        idx = build_index(
            docs, id_col="doc_id", text_col="content",
            positions=args.positions,
        )
        if args.out:
            # Persisted builds always carry the content-sha sidecar
            # (operators/integrity.py): the north rule's per-row
            # sha256 invariant is enforced on every CLI-written index.
            write_index(idx, args.out, fingerprint_docs=docs)
        else:
            idx.lexicon.count()
            idx.blocks.count()
        times.append(time.monotonic() - t0)
    dt = min(times)  # steady-state (first reps still JIT-warming)
    print(
        json.dumps(
            {
                "op": "build-index",
                "n_docs": n,
                "cores": args.cores,
                "seconds": round(dt, 3),
                "all_reps_seconds": [round(t, 3) for t in times],
                "docs_per_sec": round(n / dt, 1),
                "num_tokens": idx.num_tokens,
                "avgdl": round(idx.avgdl, 6),
                "out": args.out,
            }
        )
    )
    spark.stop()


def cmd_verify_index(args) -> None:
    """Audit a written index against its source: per-row sha256(content)
    equality (operators/integrity.py).  Works on both batch-written
    indexes (content_sha sidecar) and stream-built index dirs (per-
    segment sidecars unioned via the manifest).  Prints a JSON line with
    the violation count and up to --show sample violations; exits 1 if
    the invariant is broken."""
    from terrier_spark.session import get_spark
    from terrier_spark.operators import integrity

    # An implicit source would make a forgotten --corpus-parquet verify
    # a real index against the SYNTHETIC corpus and report a false
    # CORRUPT — require the operator to say which source they mean.
    if args.corpus_parquet is None and args.n_docs is None:
        print(
            "verify-index: pass --corpus-parquet PATH (the indexed source) "
            "or --n-docs N (synthetic corpus builds)",
            file=sys.stderr,
        )
        sys.exit(2)
    spark = get_spark(app_name="terrier_spark_verify", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    source = (
        spark.read.parquet(args.corpus_parquet)
        if args.corpus_parquet
        else _corpus(spark, args.n_docs)
    )
    # Validate the source schema up front: a real corpus with different
    # column names used to die in a raw AnalysisException deep inside
    # the verify join despite this being the operator-facing audit
    # entry point (ADVICE r4) — name the missing column and the flag
    # that fixes it instead.
    for col, flag in ((args.id_col, "--id-col"), (args.text_col, "--text-col")):
        if col not in source.columns:
            print(
                f"verify-index: source has no column {col!r} "
                f"(columns: {source.columns}); pass {flag} to name it",
                file=sys.stderr,
            )
            sys.exit(2)
    if os.path.exists(os.path.join(args.index, "manifest.json")):
        from terrier_spark.streaming import ingest

        fps = ingest.live_fingerprints(spark, args.index)
    else:
        if not integrity.has_fingerprints(args.index):
            print(
                f"verify-index: no content_sha sidecar under {args.index}; "
                "build with write_index(..., fingerprint_docs=...) or the CLI",
                file=sys.stderr,
            )
            sys.exit(2)
        fps = integrity.read_fingerprints(spark, args.index)
    fps = fps.persist()
    # ONE evaluation of the expensive verify join: count from the
    # persisted violations, slice the sample from the same frame.
    violations = integrity.verify_content(
        source, fps, id_col=args.id_col, text_col=args.text_col
    ).persist()
    n_bad = violations.count()
    sample = violations.limit(args.show).collect() if n_bad else []
    print(
        json.dumps(
            {
                "op": "verify-index",
                "index": args.index,
                "violations": n_bad,
                "status": "OK" if n_bad == 0 else "CORRUPT",
                "collection_sha_digest": integrity.collection_sha_digest(fps),
                # binding multiset digest (LtHash-16): adversarially
                # collision-resistant and homomorphic — per-segment
                # digests compose to this value via lthash_combine
                "collection_lthash": integrity.lthash_digest(fps),
                "sample": [
                    {"doc_id": r["doc_id"], "status": r["status"]} for r in sample
                ],
            }
        )
    )
    spark.stop()
    if n_bad:
        sys.exit(1)


def cmd_query(args) -> None:
    from terrier_spark.session import get_spark
    from terrier_spark.operators.index_build import load_index
    from terrier_spark.operators.score import bm25_topk_blocks

    spark = get_spark(app_name="terrier_spark_query", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    idx = load_index(spark, args.index)
    t0 = time.monotonic()
    if args.phrase:
        from terrier_spark.operators.phrase import phrase_topk

        rows = phrase_topk(idx, args.query, args.k).collect()
        results = [
            {"doc_id": r["doc_id"], "n_occ": r["n_occ"], "score": r["score"]}
            for r in rows
        ]
    else:
        rows = bm25_topk_blocks(idx, args.query, args.k).collect()
        results = [
            {"doc_id": r["doc_id"], "docno": r["docno"], "score": r["score"]}
            for r in rows
        ]
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "op": "query",
                "query": args.query,
                "phrase": bool(args.phrase),
                "k": args.k,
                "seconds": round(dt, 3),
                "results": results,
            }
        )
    )
    spark.stop()


def cmd_replica_ship(args) -> None:
    """One replication round (pure manifest/segment file ops — no
    SparkSession needed; see streaming/replica.py for the model)."""
    from terrier_spark.streaming.replica import ship_result_json, ship_segments

    res = ship_segments(args.primary, args.replica)
    print(ship_result_json(res))


def cmd_replica_verify(args) -> None:
    """Local audit of a replica against its own manifest: recompute each
    segment's LtHash from the replica-local content-sha sidecar and
    compare to the ship-time value recorded from the primary's bytes —
    transit corruption / bit rot shows up as a mismatch.  Exit 1 on any
    mismatch.  No SparkSession needed."""
    from terrier_spark.streaming.replica import verify_replica_digests

    out = verify_replica_digests(args.replica)
    out["op"] = "replica-verify"
    out["status"] = "OK" if not out["mismatches"] else "CORRUPT"
    print(json.dumps(out))
    if out["mismatches"]:
        sys.exit(1)


def cmd_replica_query(args) -> None:
    """Serve a BM25 top-k from a REPLICA's committed segments — a
    second reader session (fresh process / SparkSession) independent of
    the writer, the Spark analog of replica-served reads."""
    from terrier_spark.session import get_spark
    from terrier_spark.operators.score import bm25_topk_blocks
    from terrier_spark.streaming.ingest import open_live_index
    from terrier_spark.streaming.replica import replica_lag

    spark = get_spark(app_name="terrier_spark_replica", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    idx = open_live_index(spark, args.replica)
    t0 = time.monotonic()
    rows = bm25_topk_blocks(idx, args.query, args.k).collect()
    dt = time.monotonic() - t0
    out = {
        "op": "replica-query",
        "query": args.query,
        "k": args.k,
        "seconds": round(dt, 3),
        "num_docs": idx.num_docs,
        "results": [
            {"doc_id": r["doc_id"], "docno": r["docno"], "score": r["score"]}
            for r in rows
        ],
    }
    if args.primary:
        out["lag"] = replica_lag(args.primary, args.replica)
    print(json.dumps(out))
    spark.stop()


def cmd_bench(args) -> None:
    """Same input, two parallelism levels, fresh JVM per run → scaling.

    Runs are INTERLEAVED across levels (L1, L2, L1, L2, ...) so both
    levels sample the same background-load windows of a shared host,
    and the per-level minimum over reps is the steady-state figure."""
    levels = [int(c) for c in args.cores.split(",")]
    times: dict[int, list[float]] = {c: [] for c in levels}
    import tempfile

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    staged = tempfile.mkdtemp(prefix="ts_bench_")
    # reclaim the generated corpus at exit: each bench run wrote a full
    # n-docs parquet into a fresh mkdtemp and left it there (tmpfs RAM
    # under a /dev/shm TMPDIR — review finding r4)
    import atexit
    import shutil

    atexit.register(shutil.rmtree, staged, ignore_errors=True)
    corpus_dir = os.path.join(staged, "corpus")
    subprocess.run(
        [sys.executable, "-m", "terrier_spark.cli", "gen-corpus",
         "--n-docs", str(args.n_docs), "--out", corpus_dir],
        check=True, capture_output=True, text=True, cwd=repo_root,
    )
    from terrier_spark.benchenv import pinned_child_env, require_full_pin

    for rep in range(max(args.reps, 1)):
        for c in levels:
            # tmpfs shuffle dir + top-of-range taskset pin (shared
            # protocol — rationale in terrier_spark/benchenv.py)
            pin, env, chosen = pinned_child_env(c)
            require_full_pin(c, chosen)
            env["SPARK_GRAFT_CPUS"] = str(c)
            p = subprocess.run(
                pin
                + [
                    sys.executable,
                    "-m",
                    "terrier_spark.cli",
                    "build-index",
                    "--n-docs",
                    str(args.n_docs),
                    "--corpus-parquet",
                    corpus_dir,
                    "--cores",
                    str(c),
                    "--reps",
                    "2",  # 2nd in-JVM rep is past the worst JIT warmup
                ],
                capture_output=True,
                text=True,
                env=env,
                cwd=repo_root,
            )
            if p.returncode != 0:
                raise RuntimeError(
                    f"build-index child failed (rc={p.returncode}):\n{p.stderr[-4000:]}"
                )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            times[c].append(r["seconds"])
            print(f"# rep{rep} cores={c}: {r['seconds']}s "
                  f"(in-JVM reps: {r['all_reps_seconds']})", file=sys.stderr)
    results = [
        {
            "op": "build-index",
            "n_docs": args.n_docs,
            "cores": c,
            "seconds": min(times[c]),
            "all_runs_seconds": times[c],
            "docs_per_sec": round(args.n_docs / min(times[c]), 1),
        }
        for c in levels
    ]
    out = {"op": "bench-scaling", "n_docs": args.n_docs, "levels": results}
    if len(results) >= 2:
        lo, hi = results[0], results[-1]
        speedup = lo["seconds"] / hi["seconds"]
        ratio = hi["cores"] / lo["cores"]
        out["speedup"] = round(speedup, 3)
        out["scaling_efficiency"] = round(speedup / ratio, 3)
    print(json.dumps(out))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="terrier_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build-index")
    b.add_argument("--n-docs", type=int, default=20000)
    b.add_argument("--out", default=None)
    b.add_argument("--cores", type=int, default=None)
    b.add_argument("--warmup", action=argparse.BooleanOptionalAction, default=True)
    b.add_argument("--reps", type=int, default=1)
    b.add_argument("--corpus-parquet", default=None)
    b.add_argument(
        "--positions", action="store_true",
        help="store per-occurrence token positions (phrase queries)",
    )
    b.set_defaults(fn=cmd_build_index)

    g = sub.add_parser("gen-corpus")
    g.add_argument("--n-docs", type=int, default=20000)
    g.add_argument("--out", required=True)
    g.add_argument("--cores", type=int, default=None)
    g.set_defaults(fn=cmd_gen_corpus)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--query", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--cores", type=int, default=None)
    q.add_argument(
        "--phrase", action="store_true",
        help="quoted-phrase semantics: match consecutive tokens "
             "(requires an index built with --positions)",
    )
    q.set_defaults(fn=cmd_query)

    v = sub.add_parser("verify-index")
    v.add_argument("--index", required=True)
    v.add_argument("--corpus-parquet", default=None)
    v.add_argument("--n-docs", type=int, default=None)
    v.add_argument("--id-col", default="doc_id")
    v.add_argument("--text-col", default="content")
    v.add_argument("--cores", type=int, default=None)
    v.add_argument("--show", type=int, default=5)
    v.set_defaults(fn=cmd_verify_index)

    rs = sub.add_parser("replica-ship")
    rs.add_argument("--primary", required=True)
    rs.add_argument("--replica", required=True)
    rs.set_defaults(fn=cmd_replica_ship)

    rv = sub.add_parser("replica-verify")
    rv.add_argument("--replica", required=True)
    rv.set_defaults(fn=cmd_replica_verify)

    rq = sub.add_parser("replica-query")
    rq.add_argument("--replica", required=True)
    rq.add_argument("--query", required=True)
    rq.add_argument("-k", type=int, default=10)
    rq.add_argument("--primary", default=None,
                    help="also report replication lag vs this primary")
    rq.add_argument("--cores", type=int, default=None)
    rq.set_defaults(fn=cmd_replica_query)

    s = sub.add_parser("bench")
    s.add_argument("--n-docs", type=int, default=20000)
    s.add_argument("--cores", default="8,32")
    s.add_argument("--reps", type=int, default=3)
    s.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

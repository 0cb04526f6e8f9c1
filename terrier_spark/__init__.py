"""terrier_spark — a PySpark-native analytics + full-text retrieval engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference engine (tpan496/terrier, a fork of cmu-db/terrier/NoisePage) on
top of Apache Spark, per SURVEY.md.  The architecture is Spark-first:

- relational operators (scan/filter/join/agg/sort/topk/set-ops/windows)
  are declared with the DataFrame API and optimized by Catalyst
  (reference analog: src/execution/compiler/operator/*, SURVEY.md §2);
- the domain engine is a distributed inverted-index build + BM25 top-k
  scorer (reference analog: parallel CREATE INDEX,
  src/execution/compiler/operator/index_create_translator.cpp:121-132,
  plus TopK sorter src/execution/sql/sorter.cpp:153-315);
- all Python-side compute is vectorized (numpy / Arrow pandas UDFs),
  mirroring the reference's 2048-tuple vectorized kernels
  (src/execution/sql/vector_operations/).

Subpackages:
    sources    — table loaders / schemas (parquet, testdata layout)
    functions  — scalar/vector function layer (tokenize, text stats)
    operators  — index build, compression, BM25 scoring, top-k, dedup,
                 similarity search, checkpoint/resume
    plans      — whole-query plans (TPC-H-ish relational queries)
    streaming  — Structured Streaming equivalents (windowed aggs)
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75

"""Distributed operators: the custom engine pieces Spark lacks built-in.

index_build  — inverted-index construction (postings, lexicon, stats,
               optional positional stream)
compress     — delta-gap + VByte posting/position codec (numpy)
score        — BM25 top-k scorer (exploded / block-max / batch paths)
phrase       — positional postings, phrase + proximity (#uwN) matching,
               BM25-ranked phrase queries
topk         — generic distributed top-k helpers
dedup        — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
similarity   — embedding cosine top-k (brute force + IVF + LSH)
sketch       — ANALYZE statistics (heavy hitters, histograms, HLL, CMS)
salting      — explicit skew handling (salted agg, hot-key join)
checkpoint   — per-partition build manifest, resume, lineage
integrity    — per-row content-sha256 fingerprints, sidecar, verification
"""

"""Distributed operators: the custom engine pieces Spark lacks built-in.

index_build  — inverted-index construction (postings, lexicon, stats)
compress     — delta-gap + VByte posting codec (numpy-vectorized)
score        — BM25 top-k scorer (exploded-join path + block-max path)
topk         — generic distributed top-k helpers
dedup        — exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
similarity   — embedding cosine top-k (brute force + LSH-bucketed)
checkpoint   — per-partition build manifest, resume, lineage
"""

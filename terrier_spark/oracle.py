"""Pure-Python/numpy reference implementation (the correctness oracle).

Engine-independent: tokenizer, collection statistics, and BM25 top-k are
computed here with plain dict/numpy code and compared against the Spark
engine in tests (golden top-k per FIXTURES.md §3-4).

Pinned semantics (must match terrier_spark.functions.tokenize and
terrier_spark.operators.score EXACTLY):
  - tokens  = lowercase, split on [^a-z0-9_]+, drop empties
  - doclen  = len(tokens); avgdl = total_tokens / num_docs
  - df      = #docs containing term; cf = total term frequency
  - idf     = ln((N - df + 0.5) / (df + 0.5) + 1)          [BM25+-style floor ≥ 0]
  - score   = Σ_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
              with k1=1.2, b=0.75
  - ranking = scores rounded to 1e-9, then (score desc, doc_id asc)

Reference analog: the reference pins its aggregate semantics in
/root/reference/src/include/execution/sql/aggregators.h and tests them
against golden outputs (script/testing/junit/traces/aggregations.test);
this module plays the role of that golden generator.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from dataclasses import dataclass

TOKEN_SPLIT = re.compile(r"[^a-z0-9_]+")


def tokenize(text: str, stem: bool = False) -> list[str]:
    toks = [t for t in TOKEN_SPLIT.split(text.lower()) if t]
    if stem:
        from terrier_spark.functions.stem import stem_token

        toks = [stem_token(t) for t in toks]
    return toks


@dataclass
class OracleIndex:
    num_docs: int
    num_tokens: int
    avgdl: float
    doclen: dict[str, int]            # doc_id -> dl
    postings: dict[str, dict[str, int]]  # term -> {doc_id: tf}
    df: dict[str, int]
    cf: dict[str, int]
    stem: bool = False


def build_index(docs: list[tuple[str, str]], stem: bool = False) -> OracleIndex:
    """docs: [(doc_id, content)] -> full in-memory index.  With stem,
    terms are Porter-lite-stemmed (doclen keeps the raw token count,
    matching the engine)."""
    doclen: dict[str, int] = {}
    postings: dict[str, dict[str, int]] = {}
    for doc_id, content in docs:
        toks = tokenize(content, stem=stem)
        doclen[doc_id] = len(toks)
        for term, tf in Counter(toks).items():
            postings.setdefault(term, {})[doc_id] = tf
    num_docs = len(doclen)
    num_tokens = sum(doclen.values())
    avgdl = num_tokens / num_docs if num_docs else 0.0
    df = {t: len(p) for t, p in postings.items()}
    cf = {t: sum(p.values()) for t, p in postings.items()}
    return OracleIndex(num_docs, num_tokens, avgdl, doclen, postings, df, cf, stem)


def idf(num_docs: int, df: int) -> float:
    return math.log((num_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_topk(
    index: OracleIndex,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[tuple[str, float]]:
    """Top-k (doc_id, score); ranking = round(score,1e-9) desc, doc_id asc.

    Duplicate query terms are deduplicated (each unique term scored once),
    matching the engine's join-on-distinct-terms plan.
    """
    terms = sorted(set(tokenize(query, stem=index.stem)))
    scores: dict[str, float] = {}
    for t in terms:
        plist = index.postings.get(t)
        if not plist:
            continue
        w = idf(index.num_docs, index.df[t])
        for doc_id, tf in plist.items():
            dl = index.doclen[doc_id]
            denom = tf + k1 * (1.0 - b + b * dl / index.avgdl)
            scores[doc_id] = scores.get(doc_id, 0.0) + w * tf * (k1 + 1.0) / denom
    ranked = sorted(
        ((round(s, 9), d) for d, s in scores.items()),
        key=lambda x: (-x[0], x[1]),
    )
    return [(d, s) for s, d in ranked[:k]]


def bm25_topk_and(
    index: OracleIndex,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[tuple[str, float]]:
    """Conjunctive top-k: only docs containing EVERY query term (empty if
    any term is absent from the collection); scores = same BM25 sums."""
    terms = sorted(set(tokenize(query, stem=index.stem)))
    if not terms or any(t not in index.postings for t in terms):
        return []
    docs = set.intersection(*(set(index.postings[t]) for t in terms))
    full = bm25_topk(index, query, k=len(index.doclen), k1=k1, b=b)
    return [(d, s) for d, s in full if d in docs][:k]

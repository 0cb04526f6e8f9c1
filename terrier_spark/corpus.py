"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema (authoritative shape from BASELINE.json input_hint):
    repo:string, path:string, commit:string, lang:string, content:string

Every row is a pure function of its document index ``i`` and the global
seed, so the corpus is identical whether generated:
  - locally in pandas (used by the oracle / golden generators), or
  - distributed via ``spark.range(n).mapInPandas`` (used at scale —
    each partition generates only its own rows, no driver bottleneck,
    no shuffle).

Skew requirement (FIXTURES.md): ≥5 hot terms in >30% of docs — the HOT
keywords below are injected into every doc with high probability, giving
the Zipf-shaped term skew the salting path (operators/index_build.py)
must handle.

Reference analog: the reference generates test tables via
table_generator (/root/reference/src/execution/sql/table_generator/) with
fixed distributions; this module is the IR-corpus counterpart.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

SEED = 42

CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

LANGS = ["python", "java", "c", "cpp", "go", "js"]
LANG_WEIGHTS = np.array([0.3, 0.2, 0.15, 0.15, 0.1, 0.1])
LANG_EXT = {"python": "py", "java": "java", "c": "c", "cpp": "cc", "go": "go", "js": "js"}

# Hot terms: appear in nearly every doc, many times (Zipf head).
HOT = ["int", "return", "if", "for", "the"]
# Warm per-language keywords.
KEYWORDS = {
    "python": ["def", "class", "import", "self", "none", "lambda", "yield"],
    "java": ["public", "static", "void", "class", "final", "new", "throws"],
    "c": ["struct", "char", "void", "static", "sizeof", "typedef", "const"],
    "cpp": ["template", "namespace", "class", "const", "auto", "virtual", "std"],
    "go": ["func", "var", "defer", "chan", "range", "interface", "package"],
    "js": ["function", "var", "let", "const", "async", "await", "this"],
}

_VOCAB_SIZE = 4096


def _identifier_vocab() -> list[str]:
    """Seeded identifier vocabulary (same on driver and every executor)."""
    rng = np.random.default_rng(SEED)
    syll = ["foo", "bar", "baz", "qux", "tmp", "idx", "ptr", "val", "buf",
            "len", "cnt", "node", "list", "map", "key", "item", "ctx", "err",
            "req", "res", "cfg", "obj", "arg", "pos", "row", "col", "acc"]
    parts = rng.integers(1, 4, size=_VOCAB_SIZE)
    out = []
    for k, n in enumerate(parts):
        picks = rng.integers(0, len(syll), size=n)
        out.append("_".join(syll[p] for p in picks) + (str(k % 100) if k % 7 == 0 else ""))
    return out


VOCAB = _identifier_vocab()


def doc_id_of(repo: str, path: str, commit: str) -> str:
    """Stable primary key: sha256(repo || '\\x00' || path || '\\x00' || commit)."""
    h = hashlib.sha256()
    h.update(repo.encode())
    h.update(b"\x00")
    h.update(path.encode())
    h.update(b"\x00")
    h.update(commit.encode())
    return h.hexdigest()


def _gen_row(i: int) -> tuple[str, str, str, str, str]:
    """One corpus row as a pure function of (SEED, i)."""
    rng = np.random.default_rng(SEED * 1_000_003 + i)
    repo = f"org{i % 97}/repo{i % 913}"
    lang = LANGS[int(rng.choice(len(LANGS), p=LANG_WEIGHTS))]
    name = VOCAB[int(rng.integers(0, _VOCAB_SIZE))]
    path = f"src/{VOCAB[int(rng.integers(0, _VOCAB_SIZE))]}/{name}.{LANG_EXT[lang]}"
    commit = "".join(np.char.mod("%x", rng.integers(0, 16, size=40)).tolist())

    n_tokens = int(rng.integers(50, 2001))
    # Zipf over the identifier vocabulary (alpha=1.3), clipped to vocab.
    ids = np.minimum(rng.zipf(1.3, size=n_tokens) - 1, _VOCAB_SIZE - 1)
    toks = np.asarray(VOCAB, dtype=object)[ids]
    # Inject hot terms: ~20% of positions become one of HOT (so each hot
    # term lands in >>30% of docs), plus per-lang keywords at ~15%.
    r = rng.random(n_tokens)
    hot_pick = rng.integers(0, len(HOT), size=n_tokens)
    kw = KEYWORDS[lang]
    kw_pick = rng.integers(0, len(kw), size=n_tokens)
    toks = np.where(r < 0.20, np.asarray(HOT, dtype=object)[hot_pick], toks)
    toks = np.where((r >= 0.20) & (r < 0.35), np.asarray(kw, dtype=object)[kw_pick], toks)
    # Mixed-case forms to exercise tokenizer normalization.
    caps = rng.random(n_tokens) < 0.05
    toks = np.where(caps, np.char.capitalize(toks.astype(str)), toks).astype(object)
    # Sprinkle code punctuation as separators.
    seps = np.asarray([" ", " ", " ", "(", ") ", "; ", " = ", ".", ",\n"], dtype=object)
    sep_pick = seps[rng.integers(0, len(seps), size=n_tokens)]
    content = "".join(np.char.add(toks.astype(str), sep_pick.astype(str)).tolist())
    return repo, path, commit, lang, content


def _rows_pdf(indices: np.ndarray) -> pd.DataFrame:
    rows = [_gen_row(int(i)) for i in indices]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def corpus_pandas(n_docs: int) -> pd.DataFrame:
    """Local (oracle-side) corpus with doc_id column included."""
    pdf = _rows_pdf(np.arange(n_docs))
    pdf["doc_id"] = [
        doc_id_of(r, p, c) for r, p, c in zip(pdf["repo"], pdf["path"], pdf["commit"])
    ]
    return pdf


def corpus_df(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Distributed corpus: spark.range → mapInPandas, no driver materialization.

    At 10^12-file scale this is the pattern: each task generates (or in
    production, reads from Iceberg) only its slice.
    """
    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _rows_pdf(b["id"].to_numpy())

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )

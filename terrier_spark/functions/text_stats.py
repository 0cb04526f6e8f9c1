"""Text-analysis functions for training-data pipelines.

All JVM-side built-in expressions (whole-stage codegen) so they hold up
at 100 TB: language ID (stopword-vote n-gram heuristic), quality scoring
(length / punctuation / stopword ratios), token counting (whitespace and
word-regex), and document fingerprinting (md5 of normalized text).

Reference analog: the scalar string-function layer of the reference
(/root/reference/src/execution/sql/string_functions.cpp and the
vectorized LIKE kernel src/execution/sql/vector_operations/like.cpp) —
re-expressed as Catalyst expressions instead of hand-written kernels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker vocabularies (public common stopwords).  The
# language with the most marker hits wins; ties broken alphabetically.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ich"],
    "en": ["the", "and", "is", "of", "to", "in", "it"],
    "es": ["el", "la", "los", "que", "y", "es", "de"],
    "fr": ["le", "la", "les", "et", "est", "que", "je"],
    "zh": ["de0", "shi4", "le0", "zai4", "wo3", "you3", "he2"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def ws_tokens(col: Column | str) -> Column:
    """Whitespace tokens (lowercased), for natural-language text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: x != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(ws_tokens(col))


def word_token_count(col: Column | str) -> Column:
    """BPE-ish word-regex token count: runs of word chars or single
    non-space punctuation — closer to subword tokenizer pre-splitting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(
            F.split(c, r"(?<=\W)|(?=\W)"),
            lambda x: (x != F.lit("")) & (x.rlike(r"\S")),
        )
    )


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(col: Column | str) -> Column:
    """n-gram/stopword-vote language guess over LANG_MARKERS."""
    toks = ws_tokens(col)
    pairs = [
        F.struct(_marker_hits(toks, ms).alias("hits"), F.lit(lang).alias("lang"))
        for lang, ms in sorted(LANG_MARKERS.items())
    ]
    arr = F.array(*pairs)
    # Sort by hits desc, lang asc (ties → alphabetically first), take head.
    ordered = F.array_sort(
        arr,
        lambda l, r: F.when(l["hits"] > r["hits"], F.lit(-1))
        .when(l["hits"] < r["hits"], F.lit(1))
        .when(l["lang"] < r["lang"], F.lit(-1))
        .when(l["lang"] > r["lang"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    return ordered[0]["lang"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + a composite score in [0,1]."""
    c = F.col(text_col)
    toks = ws_tokens(text_col)
    n_chars = F.length(c)
    n_toks = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    out = df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_toks,
            "avg_token_len": F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0)),
            "stopword_ratio": F.when(n_toks > 0, n_stop / n_toks).otherwise(F.lit(0.0)),
            "punct_ratio": F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        }
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3
    )
    return out.withColumn("quality_score", F.round(score, 9))


def fingerprint(col: Column | str) -> Column:
    """Deterministic doc fingerprint: md5 of whitespace-normalized,
    lowercased text (stable across formatting-only edits)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")))


def winnowing_fingerprints(
    df, k: int = 8, w: int = 16, id_col: str = "doc_id", text_col: str = "text"
):
    """MOSS-style winnowing fingerprints (rolling-hash document
    fingerprinting, Schleimer/Wilkerson/Aiken 2003): hash every char
    k-gram of the normalized text, keep the MINIMUM hash of each
    w-position sliding window, emit the distinct kept hashes.  Any two
    docs sharing a run of ≥ w+k-1 chars share ≥ 1 fingerprint — the
    guarantee plagiarism/near-dup pipelines rely on.

    The k-gram hash is the first 15 hex chars of md5 (a hash both Spark
    and DuckDB expose), so the whole pipeline — posexplode positions →
    substring → hash → sliding-window min → distinct — is JVM built-ins
    with an exact SQL oracle.  One narrow pass, shuffle only for the
    per-doc window/distinct, identical at any scale.
    Output: (doc_id, fp long) ordered rows."""
    from pyspark.sql import Window

    c = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    base = df.select(F.col(id_col).alias("doc_id"), c.alias("t")).filter(
        F.length("t") >= k
    )
    grams = base.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(1), F.length("t") - (k - 1))).alias("idx", "pos"),
        F.col("t"),
    ).select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5(F.expr(f"substring(t, pos, {k})")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.withColumn("fp", F.min("h").over(win))
        .select("doc_id", "fp")
        .distinct()
        .orderBy("doc_id", "fp")
    )

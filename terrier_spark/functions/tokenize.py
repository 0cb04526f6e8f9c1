"""Code tokenizer (SURVEY.md §7.2).

Pinned semantics shared with the oracle (terrier_spark/oracle.py) and the
DuckDB oracle SQL: lowercase, split on [^a-z0-9_]+, drop empty tokens.

Primary implementation is pure Spark built-ins (split/lower/filter) so it
runs JVM-side inside whole-stage codegen — faster than any Python UDF and
exactly the discipline the reference applies with its vectorized string
kernels (/root/reference/src/execution/sql/string_functions.cpp).  An
Arrow pandas UDF variant is provided for parity testing and as the
fallback shape for tokenizers Spark expressions can't express (stemming,
camelCase splitting).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

TOKEN_PATTERN = "[^a-z0-9_]+"
_PY_SPLIT = re.compile(TOKEN_PATTERN)


def tokens(col: Column | str) -> Column:
    """array<string> of normalized tokens — JVM-side, codegen-friendly."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_PATTERN), lambda x: x != F.lit(""))


def tokenize_df(df: DataFrame, text_col: str = "content", out_col: str = "tokens") -> DataFrame:
    return df.withColumn(out_col, tokens(text_col))


@F.pandas_udf(ArrayType(StringType()))
def tokens_pandas_udf(texts: pd.Series) -> pd.Series:
    """Arrow-vectorized parity tokenizer (no per-row Python in the hot
    path of the engine — this exists for cross-checking and as the
    template for non-regex tokenizers)."""
    return texts.str.lower().str.split(TOKEN_PATTERN).map(
        lambda toks: [t for t in toks if t] if toks is not None else None
    )


def explode_terms(
    df: DataFrame, text_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term) pairs — one row per token occurrence."""
    return df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )


def py_tokenize_iter(texts: Iterator[str]) -> Iterator[list[str]]:
    """Driver-side helper mirroring the pinned semantics."""
    for t in texts:
        yield [x for x in _PY_SPLIT.split(t.lower()) if x]

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

import numpy as np
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


# ------------------------------------------------------ Arrow hot path

# Cache-resident slice size: a 10k-doc batch's flat token arrays run to
# hundreds of MB and go DRAM-bandwidth-bound (measured 5x slower per doc
# than 2k-doc slices, and concurrency then scales badly because all
# cores share one memory bus).  2k docs ≈ 2M tokens ≈ 30 MB working set
# — mostly LLC-resident.
ARROW_SLICE_DOCS = 2048


def _tokenize_encode_slice(content, stem: bool = False):
    """Shared tokenize/encode prefix of both slice kernels: lowercase →
    RE2 split → flatten → dictionary-encode → drop empty tokens
    (→ stem-remap codes when asked).  Returns (doc_idx, codes, dl,
    vocab): one entry per KEPT token occurrence, in document order,
    plus per-doc kept-token counts and the (possibly stemmed) term
    dictionary."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(content)
    content = pc.coalesce(content, pa.scalar("", pa.string()))
    toks = pc.split_pattern_regex(pc.utf8_lower(content), TOKEN_PATTERN)
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    # doc index of every flat token, before filtering empties
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary
    doc_idx = doc_idx[keep]
    codes = codes[keep]
    dl = np.bincount(doc_idx, minlength=n).astype(np.int64)
    if stem and len(vocab):
        from terrier_spark.functions.stem import stem_vocab_codes

        vocab, code_map = stem_vocab_codes(vocab)
        codes = code_map[codes]
    return doc_idx, codes, dl, vocab


def tokenize_count_slice(content, stem: bool = False):
    """Tokenize + per-doc term-frequency aggregation for ONE content
    array slice (the shared Arrow hot-path core):

      _tokenize_encode_slice (RE2 + dictionary encode, stem-remapped)
      → Arrow hash group_by on (doc index, code) → tf

    Doc lengths keep the raw kept-token count (stemming merges terms,
    it doesn't delete tokens).

    Returns (u_doc, u_code, tf, dl, vocab): one entry per distinct
    (doc, term) pair (u_doc indexes into the slice), per-doc token
    counts dl (len == slice size), and the term dictionary.
    """
    import pyarrow as pa

    doc_idx, codes, dl, vocab = _tokenize_encode_slice(content, stem=stem)
    # per-(doc, term) tf via Arrow's single-pass C++ hash aggregation
    # (measured 3x faster than the sort inside np.unique)
    agg = (
        pa.table({"d": doc_idx, "c": codes})
        .group_by(["d", "c"], use_threads=False)
        .aggregate([([], "count_all")])
    )
    u_doc = agg.column("d").to_numpy(zero_copy_only=False)
    u_code = agg.column("c").to_numpy(zero_copy_only=False)
    tf = agg.column("count_all").to_numpy(zero_copy_only=False)
    return u_doc, u_code, tf, dl, vocab


def tokenize_count_slice_pos(content, stem: bool = False):
    """Positional variant of :func:`tokenize_count_slice` for ONE
    content array slice.

    Returns (u_doc, u_code, tf, dl, vocab, pos_flat): identical
    contract plus ``pos_flat`` — the concatenated, per-posting ascending
    0-based KEPT-token positions, in the same row order as
    (u_doc, u_code); posting j's positions are
    ``pos_flat[cum_tf[j-1]:cum_tf[j]]`` (cum_tf = np.cumsum(tf)).

    The per-(doc, term) aggregation here is a lexsort over
    (doc, code, pos) + run-length grouping rather than the hash
    aggregation of the non-positional path — positions force a total
    order anyway, so the sort does both jobs in one pass.  With
    ``stem=True`` codes are remapped to stemmed vocab BEFORE the sort
    (inside the shared prefix), which merge-sorts the position runs of
    terms the stemmer conflates (positions always index RAW kept
    tokens).
    """
    return _tokenize_pos_sorted(content, stem=stem, doc_major=True)


def tokenize_count_slice_pos_coded(content, stem: bool = False):
    """:func:`tokenize_count_slice_pos` with posting rows in
    **(code, doc)** order instead of (doc, code).

    This is the order the positional block encoder needs (blocks group
    by term code, docnos ascending within a term), so the index build
    consumes the sort output directly — no second posting-row sort and
    no variable-length position-run permutation gather downstream
    (those two steps were the bulk of the positional build's overhead
    over the plain build).  ``pos_flat`` stays ascending within every
    posting run: positions are stream-ordered within a doc and the
    packed-key sort is stable."""
    return _tokenize_pos_sorted(content, stem=stem, doc_major=False)


def _tokenize_pos_sorted(content, stem: bool, doc_major: bool):
    doc_idx, codes, dl, vocab = _tokenize_encode_slice(content, stem=stem)
    if len(doc_idx) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, dl, vocab, z
    # kept-token position within each doc (doc_idx ascending by
    # construction: docs are contiguous in the flattened token stream)
    doc_offs = np.concatenate(([0], np.cumsum(dl)[:-1]))
    pos = np.arange(len(doc_idx), dtype=np.int64) - doc_offs[doc_idx]
    # ONE stable radix sort on a packed int64 key instead of a 3-key
    # lexsort: pos is ascending in stream order within each doc, so
    # stability alone keeps positions ascending within every
    # (doc, code) run — measured 4-7x faster (numpy's stable int sort is
    # LSD radix; lexsort is one mergesort per key).  Packing is exact:
    # doc_idx is a slice-local index and codes are non-negative
    # dictionary indices, both < 2^31.
    # Key width matters: numpy's stable int sort is LSD radix, so a
    # 32-bit packed key sorts ~2x faster than a 64-bit one.  Minor bits
    # get exactly enough room for the minor key's range; fall back to
    # 64-bit packing when (vocab size x slice docs) overflows int32.
    n_docs = len(dl)
    if doc_major:
        minor_bits = int(len(vocab)).bit_length()
        hi, lo = doc_idx, codes
    else:
        minor_bits = int(n_docs).bit_length()
        hi, lo = codes, doc_idx
    hi_max = n_docs if doc_major else len(vocab)
    if (int(hi_max) << minor_bits) < (1 << 31):
        key = (hi.astype(np.int32) << np.int32(minor_bits)) | lo.astype(np.int32)
    else:
        key = (hi.astype(np.int64) << np.int64(minor_bits)) | lo.astype(np.int64)
    order = np.argsort(key, kind="stable")
    d_s, c_s, p_s = doc_idx[order], codes[order], pos[order]
    grp = np.empty(len(d_s), dtype=bool)
    grp[0] = True
    np.logical_or(d_s[1:] != d_s[:-1], c_s[1:] != c_s[:-1], out=grp[1:])
    starts = np.flatnonzero(grp)
    tf = np.diff(np.concatenate((starts, [len(d_s)]))).astype(np.int64)
    return d_s[starts], c_s[starts], tf, dl, vocab, p_s


def tokenize_postings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
    docno_ids_bc=None,
    stem: bool = False,
) -> DataFrame:
    """(doc_id, term, tf, dl) pre-aggregated per document, via mapInArrow.

    This is the index build's hot path.  Spark's JVM ``split()`` walks
    java.util.regex and allocates a String per token — measured ~40x
    slower than Arrow's RE2 kernels on source code.  Here the whole
    tokenize→count pipeline stays in C++/numpy per Arrow batch:

      utf8_lower → split_pattern_regex (RE2) → list_flatten
      → dictionary_encode (term → int32 code, no Python strings)
      → np.unique over packed (doc_idx << 32 | code) int64 keys → tf

    i.e. the per-doc term-frequency aggregation happens map-side inside
    the kernel (the reference's thread-local agg before merge,
    /root/reference/src/execution/sql/aggregation_hash_table.cpp:673),
    so Spark never shuffles one row per token occurrence — only one row
    per distinct (doc, term).

    Every document additionally emits one (doc_id, term=NULL, tf=0, dl)
    row so zero-token docs survive into the docmap; callers split on
    ``term IS NULL``.

    ``docno_ids_bc`` (optional): a Spark broadcast of the SORTED doc_id
    array (numpy 'S' bytes).  When given, the kernel resolves each doc's
    dense docno AS ITS RANK via np.searchsorted and the output schema
    becomes (docno long, term, tf, dl) — eliminating the downstream
    JVM docmap join and keeping 64-byte id strings out of the posting
    shuffle entirely.  Only valid when the full sorted id array fits in
    a broadcast (caller gates on corpus size; the join path remains the
    10^12-doc fallback).
    """
    import pyarrow as pa

    SLICE = ARROW_SLICE_DOCS

    def _ids_to_docnos(doc_ids: pa.Array) -> np.ndarray:
        sorted_ids = docno_ids_bc.value
        batch = np.asarray(doc_ids.to_pylist(), dtype=sorted_ids.dtype)
        return np.searchsorted(sorted_ids, batch)

    def _emit(doc_ids: pa.Array, content: pa.Array) -> pa.RecordBatch:
        n = len(content)
        u_doc, u_code, tf, dl, vocab = tokenize_count_slice(content, stem=stem)
        if docno_ids_bc is not None:
            docnos = _ids_to_docnos(doc_ids)
            out_id = pa.array(np.concatenate([docnos[u_doc], docnos]))
            id_name = "docno"
        else:
            out_id = pa.concat_arrays([doc_ids.take(pa.array(u_doc)), doc_ids])
            id_name = "doc_id"
        out_term = pa.concat_arrays(
            [
                vocab.take(pa.array(u_code)).cast(pa.string()),
                pa.nulls(n, pa.string()),
            ]
        )
        out_tf = pa.array(
            np.concatenate([tf.astype(np.int64), np.zeros(n, np.int64)])
        )
        out_dl = pa.array(np.concatenate([dl[u_doc], dl]))
        return pa.RecordBatch.from_arrays(
            [out_id, out_term, out_tf, out_dl],
            names=[id_name, "term", "tf", "dl"],
        )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        i_id = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            if i_id is None:
                i_id = rb.schema.get_field_index(id_col)
                i_tx = rb.schema.get_field_index(text_col)
            for s in range(0, rb.num_rows, SLICE):
                sl = rb.slice(s, SLICE)
                yield _emit(sl.column(i_id), sl.column(i_tx))

    if docno_ids_bc is not None:
        out_schema = "docno long, term string, tf long, dl long"
    else:
        id_type = df.schema[id_col].dataType.simpleString()
        out_schema = f"doc_id {id_type}, term string, tf long, dl long"
    return df.select(
        F.col(id_col).alias(id_col), F.col(text_col)
    ).mapInArrow(kernel, out_schema)


def doc_lengths(df: DataFrame, id_col: str = "doc_id", text_col: str = "content") -> DataFrame:
    """(doc_id, doclen) via a minimal Arrow pass (split + count only — no
    dictionary encode, no per-term rows).  Used to build the docmap
    without materializing the full postings kernel twice."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            doc_ids = rb.column(rb.schema.get_field_index(id_col))
            content = rb.column(rb.schema.get_field_index(text_col))
            content = pc.coalesce(content, pa.scalar("", pa.string()))
            toks = pc.split_pattern_regex(pc.utf8_lower(content), TOKEN_PATTERN)
            lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
            flat = pc.list_flatten(toks)
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
            dl = np.bincount(doc_idx[keep], minlength=n).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [doc_ids, pa.array(dl)], names=["doc_id", "doclen"]
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInArrow(
        kernel, f"doc_id {id_type}, doclen long"
    )

"""Per-row content-sha256 integrity, enforced end-to-end.

North rule: "per-row content sha256 equality is enforced end-to-end" —
every document that enters the index build is fingerprinted with
sha256(content) at the ingest boundary, the fingerprint travels with
the index as a sidecar table, and any later holder of the index can
prove (or refute) that what was indexed is byte-identical to the
source rows, per row, with one distributed anti-join — no trust in
lineage metadata required.

Reference analog: the reference guards tuple payloads with per-block
checksums in its checkpoint/recovery path
(/root/reference/src/storage/write_ahead_log/, recovery_manager.cpp);
here the unit is the document row and the digest is sha256 so it can
be recomputed by ANY engine (DuckDB's sha256(), Python's hashlib, a
different Spark cluster) — the equality check is engine-portable by
construction, which is what makes it an end-to-end invariant rather
than an internal consistency check.

Scale notes (10^12 rows):
  - Fingerprinting is one narrow JVM projection (`sha2`, whole-stage
    codegen) — no Python, no shuffle.  At cluster scale it rides the
    same scan that feeds the tokenizer.
  - The sidecar is (doc_id, content_sha): ~96 B/row — 2 columns,
    written partitioned like any other index table.
  - `verify_content` is one full-outer join keyed on doc_id returning
    ONLY violations; on a clean corpus the result is empty and the
    join degenerates to a streaming zip of two sorted scans under AQE.
  - The order-independent collection digest (XOR over rows of
    sha256(doc_id || '\\n' || content_sha), folded as eight 32-bit
    words) lets two sides compare an entire corpus with O(1) exchanged
    state — the same trick the checkpoint manifest uses with xxhash64,
    but recomputable off-platform.

Threat model — what each layer actually guarantees:
  - ``verify_content`` (the per-row anti-join) is the ENFORCEMENT: it
    compares recomputed sha256 per row, so any change an adversary can
    make to the content is detected (up to sha256 collision).
  - The XOR set digest is a DRIFT DETECTOR for accidental corruption,
    replication lag, or lost/duplicated rows — NOT an adversarially
    binding commitment.  An XOR fold of per-row hashes is forgeable by
    an adversary who controls row contents: with ~256 rows of chosen
    terms the digest is a solvable GF(2) linear system
    (Bellare–Micciancio, "A new paradigm for collision-free hashing:
    incrementality at reduced cost", EUROCRYPT '97, §attack on XHASH).
    When tamper-evidence against a malicious writer is required, run
    the per-row verify — or compare ``lthash_digest`` below, the
    BINDING order-independent digest (round-5 upgrade of this advice
    item): a lattice multiset hash in the Bellare–Micciancio AdHash
    family with the LtHash-16 parameterization (1024 lanes × 16 bits,
    lane-wise sum mod 2^16 — Lewi/Kim/Maykov/Weis, "Securing Update
    Propagation with Homomorphic Hashing", 2019).  Forging it requires
    solving a random modular subset-sum in dimension 1024 (SIS-hard),
    not a GF(2) linear system, and it keeps everything the XOR fold
    had: order/partition independence, O(1) exchanged state, and
    homomorphic combine/remove so per-segment digests compose to the
    collection digest without a rescan.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FINGERPRINT_DIRNAME = "content_sha"


def content_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "content"
) -> DataFrame:
    """(doc_id, content_sha) — lowercase hex sha256 of the row's content
    (UTF-8 bytes; `sha2` on a string column matches hashlib/DuckDB).
    Pure projection: stays inside whole-stage codegen."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("content_sha"),
    )


def digest_word_aggs(id_col: str = "doc_id", sha_col: str = "content_sha") -> list:
    """The eight 32-bit XOR word aggregates of the set digest — the ONE
    definition shared by collection_sha_digest and the checkpoint
    lineage (operators/checkpoint.py), so the two can never drift.

    Per-row term: sha256(doc_id || '\\n' || coalesce(content_sha, '')).
    Binding the row's sha to its doc_id makes the digest injective over
    row SETS in practice — a bare XOR of content shas would cancel
    duplicate contents (two identical docs XOR to nothing) and could
    not tell a NULL-content row from an absent one.  A 16-hex chunk can
    exceed Long range under `conv`, so the fold uses 8-hex words."""
    h = F.sha2(
        F.concat_ws("\n", F.col(id_col), F.coalesce(F.col(sha_col), F.lit(""))),
        256,
    )
    return [
        F.bit_xor(F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")).alias(
            f"w{i}"
        )
        for i in range(8)
    ]


def fold_digest_row(row) -> str:
    """Reassemble the 64-hex digest from a row of w0..w7 word aggregates
    (empty input leaves every word NULL → the all-zeros identity)."""
    return "".join(format(int(row[f"w{i}"] or 0) & 0xFFFFFFFF, "08x") for i in range(8))


def collection_sha_digest(fps: DataFrame, sha_col: str = "content_sha") -> str:
    """Order-independent 256-bit digest of a fingerprint set: XOR over
    rows of sha256(doc_id || '\\n' || content_sha), folded JVM-side as
    eight 32-bit words.  Recomputable by ANY engine that has sha256 and
    XOR (DuckDB, hashlib — see tests/test_integrity.py's off-platform
    twin).  Empty input → 64 zeros (the identity).

    Guarantee: equal digests ⇒ equal {(doc_id, sha)} sets against
    ACCIDENTAL divergence (corruption, lost/duplicated/reordered rows)
    with overwhelming probability.  It is NOT adversarially binding —
    XOR set-hashes are forgeable via GF(2) linear algebra
    (Bellare–Micciancio '97); use verify_content for tamper-evidence.
    See the module docstring's threat model."""
    row = fps.agg(*digest_word_aggs("doc_id", sha_col)).collect()[0]
    return fold_digest_row(row)


# ------------------------------------------------------------------
# Binding order-independent multiset digest (LtHash-16 construction)
#
# Per-row expansion stays in the string-sha256 domain on purpose so the
# digest is recomputable by ANY engine with sha256 over strings (DuckDB
# SQL twin in tests/test_integrity.py, hashlib twin below):
#   base     = sha256_hex(doc_id || '\n' || coalesce(content_sha, ''))
#              — the SAME per-row term the XOR digest binds, so the two
#              digests commit to the same row identity
#   block_i  = sha256_hex(base || ':' || i)   for i in 0..63
#   lanes    = the 64 blocks' bytes as 1024 big-endian uint16 values
#   digest   = lane-wise sum over all rows, each lane mod 2^16
#
# State is 2048 bytes (4096 hex chars).  Scale notes: the expansion is
# ~65 short sha256 calls per row inside an Arrow-batched numpy kernel —
# an audit-path cost (~60 µs/row/core), not a hot-path one; partials
# are one 1024-long vector per PARTITION, so the driver merges
# O(partitions), never O(rows).  combine/remove are lane-wise modular
# add/subtract, which is what lets a replica check that shipped
# segments compose to the primary's collection digest with zero data
# movement (test_lthash_segment_composition).

LTHASH_BLOCKS = 64
LTHASH_LANES = LTHASH_BLOCKS * 16  # 1024 × 16-bit lanes = 2048 bytes
LTHASH_IDENTITY = "0" * (LTHASH_LANES * 4)


def _lthash_row_lanes(doc_id, content_sha) -> np.ndarray:
    """uint64[1024] lane vector for one (doc_id, content_sha) row —
    the hashlib twin of the Spark kernel AND of the DuckDB SQL oracle."""
    key = f"{'' if doc_id is None else doc_id}\n" + (
        "" if content_sha is None else str(content_sha)
    )
    base = hashlib.sha256(key.encode("utf-8")).hexdigest()
    blocks = b"".join(
        hashlib.sha256(f"{base}:{i}".encode()).digest()
        for i in range(LTHASH_BLOCKS)
    )
    return np.frombuffer(blocks, dtype=">u2").astype(np.uint64)


def _lanes_to_hex(lanes: np.ndarray) -> str:
    return (lanes.astype(np.uint64) % 65536).astype(">u2").tobytes().hex()


def _hex_to_lanes(digest: str) -> np.ndarray:
    if len(digest) != LTHASH_LANES * 4:
        raise ValueError(
            f"lthash digest must be {LTHASH_LANES * 4} hex chars, got {len(digest)}"
        )
    return np.frombuffer(bytes.fromhex(digest), dtype=">u2").astype(np.uint64)


def lthash_combine(a: str, b: str) -> str:
    """Digest of the multiset UNION: lane-wise sum mod 2^16."""
    return _lanes_to_hex(_hex_to_lanes(a) + _hex_to_lanes(b))


def lthash_remove(a: str, b: str) -> str:
    """Digest of the multiset DIFFERENCE (inverse of combine): removing
    b's rows from a.  Only meaningful when b's rows are a sub-multiset
    of a's."""
    return _lanes_to_hex(_hex_to_lanes(a) + (65536 - (_hex_to_lanes(b) % 65536)))


def _lthash_partials_df(
    fps: DataFrame, id_col: str = "doc_id", sha_col: str = "content_sha"
) -> DataFrame:
    """The distributed leg of lthash_digest: one partial-sum lane vector
    per non-empty Arrow batch, as a DataFrame — exposed so the no-shuffle
    claim is plan-assertable (tests/test_integrity.py pins the physical
    plan Exchange-free: scan → project → mapInPandas, nothing else)."""

    def kernel(it: Iterator) -> Iterator:
        import pandas as pd

        for batch in it:
            if not len(batch):
                continue
            acc = np.zeros(LTHASH_LANES, dtype=np.uint64)
            for did, sha in zip(batch[id_col].to_numpy(), batch[sha_col].to_numpy()):
                acc += _lthash_row_lanes(did, sha)
            yield pd.DataFrame({"partial": [(acc % 65536).astype("int64")]})

    return (
        # id cast to string JVM-side: pandas would float-ify a nullable
        # int column and hash "5.0" where every twin hashes "5"
        fps.select(F.col(id_col).cast("string").alias(id_col), sha_col)
        .mapInPandas(kernel, schema="partial array<long>")
    )


def lthash_digest(
    fps: DataFrame, id_col: str = "doc_id", sha_col: str = "content_sha"
) -> str:
    """BINDING order-independent digest of a fingerprint multiset.
    Equal digests ⇒ equal {(doc_id, sha)} multisets, adversarially:
    finding two distinct multisets with one digest is a random modular
    subset-sum / SIS instance in dimension 1024, unlike the forgeable
    XOR fold (see module threat model).  Empty input → LTHASH_IDENTITY.

    One mapInPandas pass emits a single partial-sum vector per
    non-empty Arrow batch; the driver folds the partials.  No shuffle
    (plan-pinned)."""
    rows = _lthash_partials_df(fps, id_col, sha_col).collect()
    total = np.zeros(LTHASH_LANES, dtype=np.uint64)
    for r in rows:
        total += np.asarray(r["partial"], dtype=np.uint64)
    return _lanes_to_hex(total)


def verify_content(
    source: DataFrame,
    fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """Per-row enforcement: recompute sha256 from ``source`` and compare
    against the recorded fingerprints.  Returns ONLY violations —
    (doc_id, status, expected_sha, recorded_sha) with status one of
    MISSING (source row has no fingerprint), EXTRA (fingerprint for a
    row no longer in the source), MISMATCH (content changed).  An empty
    result is the invariant holding."""
    exp = content_fingerprints(source, id_col, text_col).select(
        "doc_id",
        F.col("content_sha").alias("expected_sha"),
        F.lit(True).alias("_in_source"),
    )
    rec = fps.select(
        "doc_id",
        F.col("content_sha").alias("recorded_sha"),
        F.lit(True).alias("_recorded"),
    )
    # Presence flags, not sha NULL-ness, drive MISSING/EXTRA: sha2(NULL)
    # is NULL, so a faithfully round-tripped NULL-content row carries a
    # NULL sha on BOTH sides and must verify clean — only genuinely
    # absent rows (flag NULL after the outer join) are violations, and
    # MISMATCH uses null-safe equality for the same reason.
    joined = exp.join(rec, "doc_id", "full_outer")
    return (
        joined.withColumn(
            "status",
            F.when(F.col("_recorded").isNull(), F.lit("MISSING"))
            .when(F.col("_in_source").isNull(), F.lit("EXTRA"))
            .when(
                ~F.col("expected_sha").eqNullSafe(F.col("recorded_sha")),
                F.lit("MISMATCH"),
            ),
        )
        .filter(F.col("status").isNotNull())
        .select("doc_id", "status", "expected_sha", "recorded_sha")
    )


def write_fingerprints(fps: DataFrame, index_dir: str) -> None:
    """Persist the sidecar under ``<index_dir>/content_sha/`` next to the
    docmap/blocks/lexicon tables written by write_index."""
    fps.select("doc_id", "content_sha").write.mode("overwrite").parquet(
        os.path.join(index_dir, FINGERPRINT_DIRNAME)
    )


def read_fingerprints(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(index_dir, FINGERPRINT_DIRNAME))


def has_fingerprints(index_dir: str) -> bool:
    return os.path.isdir(os.path.join(index_dir, FINGERPRINT_DIRNAME))


def verify_index_content(
    spark: SparkSession,
    index_dir: str,
    source: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "content",
) -> DataFrame:
    """End-to-end check for a written index: violations between the
    current source rows and the fingerprints captured at build time.
    Raises if the index was written without a fingerprint sidecar."""
    if not has_fingerprints(index_dir):
        raise FileNotFoundError(
            f"no content fingerprints at {index_dir}/{FINGERPRINT_DIRNAME}; "
            "pass source docs to write_index(..., fingerprint_docs=...) at build time"
        )
    return verify_content(source, read_fingerprints(spark, index_dir), id_col, text_col)

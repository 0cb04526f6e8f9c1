"""Delta-gap + VByte posting-list codec, numpy-vectorized (SURVEY.md §7.4).

Posting lists store strictly-increasing docnos. We encode:
    gaps = [docno[0], docno[1]-docno[0], ...]    (first value absolute)
then VByte each gap: little-endian 7-bit groups, HIGH BIT SET ON THE LAST
byte of each value (classic Scholer et al. variable-byte convention).
Term frequencies are VByte-encoded in a parallel stream.

All encode/decode paths are numpy array programs — no per-value Python
loops — matching the reference's vectorized-kernel discipline
(/root/reference/src/execution/sql/vector_operations/, 2048-tuple
batches).  Encoding runs inside Arrow pandas UDFs, so the per-batch cost
is one numpy pass.
"""

from __future__ import annotations

import numpy as np

_MAX_VBYTE_LEN = 10  # 64 bits / 7


def vbyte_encode_raw(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a uint64 array → (uint8 byte stream, per-value byte length).

    The per-value lengths let callers slice the stream at any value
    boundary (used to cut one big encoded run into per-block blobs
    without re-encoding — one numpy pass for an entire Arrow batch).
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.int64)
    vmax = int(v.max())
    if vmax < (1 << 7):
        # All single-byte (the common case for position/docno gap
        # streams): the whole encode is ONE vectorized op.  The generic
        # path below costs ~6x more in nbytes scans + masked scatters.
        return (v.astype(np.uint8) | np.uint8(0x80)), np.ones(
            v.size, dtype=np.int64
        )
    if vmax < (1 << 14):
        # <=2-byte values: skip the per-shift nbytes loop and the
        # per-byte-position scatter loop; two scatters total.
        nbytes = np.ones(v.size, dtype=np.int64)
        two = v >= np.uint64(1 << 7)
        nbytes += two
        ends = np.cumsum(nbytes)
        starts = ends - nbytes
        out = np.empty(int(ends[-1]), dtype=np.uint8)
        b0 = (v & np.uint64(0x7F)).astype(np.uint8)
        out[starts] = np.where(two, b0, b0 | np.uint8(0x80))
        out[starts[two] + 1] = (v[two] >> np.uint64(7)).astype(np.uint8) | np.uint8(0x80)
        return out, nbytes
    # Byte length of each value: 1 + number of 7-bit shifts still nonzero.
    nbytes = np.ones(v.size, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while shifted.any():
        nbytes += (shifted > 0).astype(np.int64)
        shifted >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    work = v.copy()
    for k in range(_MAX_VBYTE_LEN):
        mask = nbytes > k
        if not mask.any():
            break
        pos = starts[mask] + k
        byte = (work[mask] & np.uint64(0x7F)).astype(np.uint8)
        is_last = (nbytes[mask] - 1) == k
        out[pos] = byte | np.where(is_last, np.uint8(0x80), np.uint8(0))
        work[mask] >>= np.uint64(7)
    return out, nbytes


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array; returns the byte stream."""
    out, _ = vbyte_encode_raw(values)
    return out.tobytes()


def vbyte_decode(buf: bytes) -> np.ndarray:
    """Decode a VByte stream back to uint64."""
    a = np.frombuffer(buf, dtype=np.uint8)
    if a.size == 0:
        return np.zeros(0, dtype=np.uint64)
    last = (a & 0x80) > 0
    n_vals = int(last.sum())
    gidx = np.cumsum(last) - last  # value index per byte
    ends = np.flatnonzero(last)
    starts = np.empty(n_vals, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    offsets = np.arange(a.size, dtype=np.int64) - starts[gidx]
    contrib = (a & 0x7F).astype(np.uint64) << (offsets.astype(np.uint64) * np.uint64(7))
    vals = np.zeros(n_vals, dtype=np.uint64)
    np.bitwise_or.at(vals, gidx, contrib)
    return vals


def delta_encode(docnos: np.ndarray) -> np.ndarray:
    """Strictly-increasing int array -> gaps (first absolute)."""
    d = np.ascontiguousarray(docnos, dtype=np.uint64)
    if d.size == 0:
        return d
    gaps = np.empty_like(d)
    gaps[0] = d[0]
    gaps[1:] = d[1:] - d[:-1]
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.uint64), dtype=np.uint64)


def encode_posting_list(docnos: np.ndarray, tfs: np.ndarray) -> tuple[bytes, bytes]:
    """(sorted docnos, tfs) -> (docno_blob, tf_blob)."""
    return vbyte_encode(delta_encode(docnos)), vbyte_encode(tfs.astype(np.uint64))


def decode_posting_list(docno_blob: bytes, tf_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    docnos = delta_decode(vbyte_decode(docno_blob))
    tfs = vbyte_decode(tf_blob)
    return docnos, tfs


def decode_positions(pos_blob: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode a per-block positional stream back to absolute positions.

    ``pos_blob`` holds VByte position-GAPS; runs are delimited by ``tfs``
    (posting i owns the next tfs[i] values, its first value absolute).
    Vectorized segmented prefix-sum: one cumsum over the whole stream,
    then subtract each run's preceding total."""
    gaps = vbyte_decode(pos_blob).astype(np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if len(gaps) == 0:
        return gaps
    run_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    cum = np.cumsum(gaps)
    base = cum[run_starts] - gaps[run_starts]
    return cum - np.repeat(base, tfs)

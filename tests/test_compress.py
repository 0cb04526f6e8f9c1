import numpy as np
import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from terrier_spark.operators.compress import (
    decode_posting_list,
    delta_decode,
    delta_encode,
    encode_posting_list,
    vbyte_decode,
    vbyte_encode,
)


def test_vbyte_empty():
    assert vbyte_encode(np.zeros(0, np.uint64)) == b""
    assert vbyte_decode(b"").size == 0


def test_vbyte_known_values():
    # 0 -> one byte with stop bit; 127 -> one byte; 128 -> two bytes
    assert vbyte_encode(np.array([0], np.uint64)) == bytes([0x80])
    assert vbyte_encode(np.array([127], np.uint64)) == bytes([0xFF])
    assert vbyte_encode(np.array([128], np.uint64)) == bytes([0x00, 0x81])


@pytest.mark.parametrize("n", [1, 2, 17, 1000])
def test_vbyte_roundtrip(n):
    rng = np.random.default_rng(n)
    vals = rng.integers(0, 2**63 - 1, size=n).astype(np.uint64)
    assert (vbyte_decode(vbyte_encode(vals)) == vals).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_vbyte_roundtrip_hypothesis(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (vbyte_decode(vbyte_encode(arr)) == arr).all()


def test_delta_roundtrip():
    docnos = np.array([3, 5, 6, 100, 10**12], np.uint64)
    assert (delta_decode(delta_encode(docnos)) == docnos).all()


def test_posting_list_roundtrip():
    rng = np.random.default_rng(7)
    docnos = np.sort(rng.choice(10**9, size=500, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 1000, size=500).astype(np.uint64)
    d, t = encode_posting_list(docnos, tfs)
    dd, tt = decode_posting_list(d, t)
    assert (dd == docnos).all() and (tt == tfs).all()


def test_compression_actually_compresses():
    # dense gaps -> ~1 byte/doc vs 8 raw
    docnos = np.arange(0, 100_000, 3, dtype=np.uint64)
    blob = vbyte_encode(delta_encode(docnos))
    assert len(blob) < docnos.size * 2

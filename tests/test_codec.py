"""Varbyte / delta codec roundtrip tests (including property-based)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_analysis_hashsplitter_spark.functions.codec import (
    decode_counts,
    decode_doc_ids,
    encode_counts,
    encode_doc_ids,
    varbyte_decode,
    varbyte_encode,
)


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0
    assert encode_doc_ids(np.array([], dtype=np.int64)) == b""
    assert decode_doc_ids(b"").size == 0


def test_known_values():
    # single-byte values
    assert varbyte_encode(np.array([0])) == b"\x00"
    assert varbyte_encode(np.array([1])) == b"\x01"
    assert varbyte_encode(np.array([127])) == b"\x7f"
    # two-byte: 128 = 0x80 0x01 (little-endian 7-bit groups)
    assert varbyte_encode(np.array([128])) == b"\x80\x01"
    assert varbyte_encode(np.array([300])) == b"\xac\x02"


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    out = varbyte_decode(varbyte_encode(arr))
    assert np.array_equal(out, arr)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=200
    )
)
@settings(max_examples=200, deadline=None)
def test_doc_ids_roundtrip(vals):
    ids = np.array(sorted(set(vals)), dtype=np.int64)
    out = decode_doc_ids(encode_doc_ids(ids))
    assert np.array_equal(out, ids)


def test_decode_tier_boundaries():
    """The tiered decoder's three paths (all-1-byte, all-2-byte,
    mixed byte-position loop) agree on vectors straddling the tier
    boundaries, including patterns that LOOK like one tier but aren't
    (e.g. an even-length mixed stream whose first byte has the high
    bit set)."""
    cases = [
        [0], [127],                        # 1-byte tier
        [128], [16383], [300, 5000],       # 2-byte tier
        [127, 128], [128, 127],            # adjacent widths (mixed)
        [16384], [2**63 - 1],              # 3+ bytes
        [1, 2**62, 3],                     # width spread in one stream
        [128, 16384, 0],                   # even byte count, mixed
        list(range(120, 140)),             # crosses 1->2 byte boundary
    ]
    for vals in cases:
        arr = np.array(vals, dtype=np.uint64)
        assert np.array_equal(
            varbyte_decode(varbyte_encode(arr)), arr
        ), vals


def test_counts_roundtrip():
    rng = np.random.RandomState(7)
    tfs = rng.randint(1, 1000, size=5000)
    assert np.array_equal(decode_counts(encode_counts(tfs)), tfs)


def test_compression_is_compact():
    # dense sorted ids should take ~1 byte per posting
    ids = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    blob = encode_doc_ids(ids)
    assert len(blob) < ids.size * 1.1 + 10

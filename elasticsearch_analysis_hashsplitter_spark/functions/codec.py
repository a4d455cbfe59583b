"""Posting-list compression: docID delta + varbyte (north_rule requirement).

Vectorized numpy implementation — no per-element Python loops. Varbyte is
the classic 7-bit little-endian scheme: low 7 bits per byte, high bit set
while more bytes follow. DocIDs are sorted and delta-encoded (first value
absolute); tf / dl streams are varbyte without delta.

The reference stores postings inside Lucene segments; this codec is the
engine-native equivalent for ``BinaryType`` posting blobs (SURVEY.md §1.3).
"""

from __future__ import annotations

import numpy as np

_MAX_VARBYTE_LEN = 10  # 64 bits / 7


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int64/uint64 array to varbyte bytes."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= np.uint64(7)
        nz = tmp > 0
    nbytes = np.maximum(nbits, 1)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    shifted = v.copy()
    for j in range(_MAX_VARBYTE_LEN):
        sel = nbytes > j  # values that have a j-th byte
        if not sel.any():
            break
        pos = offsets[:-1][sel] + j
        byte = (shifted[sel] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[sel] - 1) > j
        out[pos] = byte | (more.astype(np.uint8) << 7)
        shifted[sel] >>= np.uint64(7)
    return out.tobytes()


def varbyte_decode(blob: bytes) -> np.ndarray:
    """Decode varbyte bytes back to a uint64 array.

    Tiered by byte-width pattern — decode is the serving hot path (a
    64-hot-query batch at 1M docs decodes ~half a billion values per
    job, measured r5):

    * all 1-byte (hot-term doc deltas — avg delta n_docs/df; tf
      streams): the bytes ARE the values — one astype, 11x the general
      path;
    * all 2-byte (dl streams at avgdl ~350; mid-df deltas): two strided
      views + shift-or, 4-7x;
    * mixed: loop over byte position within value (<= 10 vector ops,
      each touching only values that long), which also avoids the old
      ``np.add.at`` unbuffered scatter — 1.1-2x and far fewer temp
      allocations (less GC churn under a 32-thread local run).
    """
    raw = np.frombuffer(blob, dtype=np.uint8)
    n = raw.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    hi = raw & 0x80
    if not hi.any():
        return raw.astype(np.uint64)
    if n % 2 == 0 and (hi[0::2] == 0x80).all() and not hi[1::2].any():
        lo = (raw[0::2] & 0x7F).astype(np.uint64)
        return lo | (raw[1::2].astype(np.uint64) << np.uint64(7))
    is_last = hi == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (raw & 0x7F).astype(np.uint64)
    out = payload[starts].copy()
    lens = ends - starts  # extra bytes beyond the first, per value
    for j in range(1, int(lens.max()) + 1):
        sel = np.flatnonzero(lens >= j)
        out[sel] |= payload[starts[sel] + j] << np.uint64(7 * j)
    return out


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Delta + varbyte for a *sorted* int64 docID array."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    if ids.size == 0:
        return b""
    deltas = np.empty(ids.size, dtype=np.uint64)
    deltas[0] = np.uint64(ids[0])
    deltas[1:] = np.diff(ids).astype(np.uint64)
    return varbyte_encode(deltas)


def decode_doc_ids(blob: bytes) -> np.ndarray:
    """Inverse of :func:`encode_doc_ids` -> sorted int64 docIDs."""
    deltas = varbyte_decode(blob)
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    return np.cumsum(deltas.astype(np.int64))


def encode_counts(counts: np.ndarray) -> bytes:
    """Varbyte for tf / dl streams (parallel to the docID stream)."""
    return varbyte_encode(np.asarray(counts, dtype=np.uint64))


def decode_counts(blob: bytes) -> np.ndarray:
    return varbyte_decode(blob).astype(np.int64)

"""Posting-list codec: delta + varint (LEB128), vectorized with NumPy.

The reference stores posting chains as fixed 32-byte chunks of raw u32
file ids (/root/reference/src/index2/word_map.rs:13-21). This engine
stores canonical ascending docID runs, delta-encoded and
varint-compressed (the north-star format), packed into Arrow ``binary``
cells. Both encode and decode are vectorized (no per-value Python loop);
the same codec interface would admit SIMD-BP128 later.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)


def varint_encode(vals: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    v = np.ascontiguousarray(vals, dtype=_U64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlength/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= _SEVEN
        nz = tmp > 0
    nbytes = np.maximum(nbits, 1)
    offsets = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(offsets[-1], dtype=np.uint8)
    maxb = int(nbytes.max())
    for k in range(maxb):
        sel = nbytes > k
        idx = offsets[:-1][sel] + k
        byte = ((v[sel] >> _U64(7 * k)) & _MASK7).astype(np.uint8)
        cont = (nbytes[sel] - 1 > k).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes into a uint64 array (vectorized).

    Raises ValueError on a truncated stream (trailing continuation byte):
    a corrupted chunk must fail loudly at decode, not silently drop the
    tail and surface later as wrong query results.
    """
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    if b[-1] >= 0x80:
        raise ValueError("truncated varint stream: last byte has continuation bit set")
    if not (b & 0x80).any():
        # fast path: every value is a single byte (dense docID deltas and
        # small tfs — the overwhelmingly common case)
        return b.astype(_U64)
    ends = np.flatnonzero(b < 0x80)
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    spans = ends - starts + 1
    pos_in_span = np.arange(b.size, dtype=np.int64) - np.repeat(starts, spans)
    parts = (b.astype(_U64) & _MASK7) << (_SEVEN * pos_in_span.astype(_U64))
    return np.add.reduceat(parts, starts)


def delta_encode(sorted_ids: np.ndarray) -> bytes:
    """Delta + varint encode an ascending uint64 array."""
    a = np.ascontiguousarray(sorted_ids, dtype=_U64)
    if a.size == 0:
        return b""
    d = np.empty_like(a)
    d[0] = a[0]
    np.subtract(a[1:], a[:-1], out=d[1:])
    return varint_encode(d)


def delta_decode(buf: bytes) -> np.ndarray:
    d = varint_decode(buf)
    return np.cumsum(d, dtype=_U64)


def encode_tfs(tfs: np.ndarray) -> bytes:
    """Varint-encode term frequencies (no delta; tfs are small)."""
    return varint_encode(tfs)


def decode_tfs(buf: bytes) -> np.ndarray:
    return varint_decode(buf)

"""Property tests for the posting codec: round-trip over arbitrary
uint64 arrays (multi-byte varints included) and loud truncation
failure."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from textindex_ray.index.codec import (
    delta_decode,
    delta_encode,
    decode_tfs,
    encode_tfs,
    varint_decode,
    varint_encode,
)


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert varint_decode(varint_encode(a)).tolist() == vals


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 40) - 1), min_size=1, max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip_sorted(vals):
    a = np.sort(np.array(vals, dtype=np.uint64))
    out = delta_decode(delta_encode(a))
    assert out.tolist() == a.tolist()


@given(st.lists(st.integers(min_value=0, max_value=1 << 20), min_size=1, max_size=100))
@settings(max_examples=100, deadline=None)
def test_tfs_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert decode_tfs(encode_tfs(a)).tolist() == vals


@given(st.lists(st.integers(min_value=128, max_value=(1 << 64) - 1), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_truncated_multibyte_varint_raises(vals):
    """Chopping the last byte off a multi-byte-terminated stream leaves a
    trailing continuation byte -> must raise, not decode short."""
    a = np.array(vals, dtype=np.uint64)
    buf = varint_encode(a)
    assert buf[-1] < 0x80 and buf[-2] >= 0x80  # last value is multi-byte
    with pytest.raises(ValueError):
        varint_decode(buf[:-1])


def test_single_byte_stream_chop_is_structural():
    """A stream of single-byte varints has no redundancy — chopping one
    byte yields a VALID shorter stream. Corruption detection for that
    case is ENFORCED at the chunk layer: the reader compares decoded
    length against each chunk row's stored ``n``
    (engine._decode_chunk_rows / _ChunkCursor._ensure)."""
    buf = varint_encode(np.array([1, 2, 3], dtype=np.uint64))
    assert varint_decode(buf[:-1]).tolist() == [1, 2]


def test_chunk_n_mismatch_raises():
    import pyarrow as pa

    from textindex_ray.query.engine import _decode_chunk_rows

    ids = np.array([1, 2, 3], dtype=np.uint64)
    rows = pa.table(
        {
            "term": pa.array(["t"], pa.string()),
            "first_doc": pa.array([1], pa.uint64()),
            "last_doc": pa.array([3], pa.uint64()),
            "n": pa.array([4], pa.uint32()),  # wrong: claims 4 postings
            "max_tf": pa.array([1], pa.uint32()),
            "min_dl": pa.array([1], pa.uint32()),
            "cf": pa.array([3], pa.uint64()),
            "docs": pa.array([delta_encode(ids)], pa.large_binary()),
            "tfs": pa.array([encode_tfs(np.ones(3, np.uint64))], pa.large_binary()),
        }
    )
    with pytest.raises(ValueError):
        _decode_chunk_rows(rows)

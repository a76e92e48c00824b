"""Content classifier: raw page bytes -> doctype (html / text / ignore).

Behavioral port of the reference content filter
(/root/reference/src/proc3.rs:301-336): only the first 256 bytes are
inspected (proc3.rs:106-110), leading ASCII whitespace is skipped
(proc3.rs:315-321), HTML is recognized by a fixed prefix table
(proc3.rs:302-312), and any control byte in 0-8, 11-12, 14-31 marks the
document as binary -> ignore (proc3.rs:328-335).
"""

from __future__ import annotations

DOCTYPE_HTML = "html"
DOCTYPE_TEXT = "text"
DOCTYPE_IGNORE = "ignore"

# proc3.rs:302-312
HTML_RECOGNIZE = (
    b"<!--ADULTSONLY",
    b"<--",
    b"<head",
    b"<HTML",
    b"<html",
    b"<?xml",
    b"<!DOCTYPE",
    b"<!doctype",
    b"_<!DOCTYPE",
)

SNIFF_LEN = 256  # proc3.rs:106-110

_WS = b" \t\n\r"

# control bytes 0-8, 11-12, 14-31 (proc3.rs:330)
_CTRL = frozenset(list(range(0, 9)) + [11, 12] + list(range(14, 32)))


def classify_bytes(raw: bytes) -> str:
    """Classify raw document bytes into html / text / ignore."""
    buf = raw[:SNIFF_LEN]

    # skip leading whitespace; if all whitespace, start stays 0 (proc3.rs:315-321)
    start = 0
    for i, b in enumerate(buf):
        if b not in _WS:
            start = i
            break
    part = buf[start:]

    if part.startswith(HTML_RECOGNIZE):
        return DOCTYPE_HTML
    for b in part:
        if b in _CTRL:
            return DOCTYPE_IGNORE
    return DOCTYPE_TEXT


def classify_bytes_batch(col) -> "pa.Array":
    """Vectorized :func:`classify_bytes` over an Arrow binary column.

    Row-identical to the scalar kernel (property-tested): Arrow
    binary_slice caps each row at SNIFF_LEN, then numpy computes the
    whitespace skip (segmented min over non-ws positions), the 9-entry
    HTML prefix table (per-pattern byte gathers at start offsets), and
    the control-byte scan (control bytes are never whitespace, so
    scanning the whole sniff window equals scanning from the skip
    point). Falls back to the scalar loop for exotic inputs the slice
    kernel rejects.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        sl = pc.binary_slice(col, 0, SNIFF_LEN)
    except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
        return pa.array([classify_bytes(v) for v in col.to_pylist()], pa.string())
    n = len(sl)
    if n == 0:
        return pa.array([], pa.string())
    odtype = np.int64 if pa.types.is_large_binary(sl.type) else np.int32
    off = (
        np.frombuffer(sl.buffers()[1], odtype)[sl.offset : sl.offset + n + 1]
        .astype(np.int64)
    )
    buf = sl.buffers()[2]
    vals = (
        np.frombuffer(buf, np.uint8) if buf is not None else np.empty(0, np.uint8)
    )
    o = off - off[0]
    v = vals[off[0]:off[-1]]
    lens = np.diff(o)
    ends = o[1:]
    starts_rel = np.zeros(n, np.int64)
    has_ctrl = np.zeros(n, bool)
    nz = lens > 0
    if v.size:
        pos = np.arange(v.size, dtype=np.int64)
        isws = (v == 32) | (v == 9) | (v == 10) | (v == 13)
        seg_starts = o[:-1][nz]
        first_nonws = np.minimum.reduceat(np.where(~isws, pos, v.size), seg_starts)
        sr = first_nonws - seg_starts
        sr[first_nonws >= ends[nz]] = 0  # all-whitespace: start stays 0
        starts_rel[nz] = sr
        isctrl = (v <= 8) | (v == 11) | (v == 12) | ((v >= 14) & (v < 32))
        first_ctrl = np.minimum.reduceat(np.where(isctrl, pos, v.size), seg_starts)
        has_ctrl[nz] = first_ctrl < ends[nz]
    is_html = np.zeros(n, bool)
    for p in HTML_RECOGNIZE:
        pl = len(p)
        rows = np.flatnonzero(~is_html & (lens - starts_rel >= pl))
        if rows.size == 0:
            continue
        base = o[:-1][rows] + starts_rel[rows]
        m = np.ones(rows.size, bool)
        for j, ch in enumerate(p):
            m &= v[base + j] == ch
            if not m.any():
                break
        is_html[rows[m]] = True
    out = np.where(
        is_html, DOCTYPE_HTML, np.where(has_ctrl, DOCTYPE_IGNORE, DOCTYPE_TEXT)
    )
    return pa.array(out.tolist(), pa.string())


def decode_lossy(raw: bytes) -> str:
    """UTF-8 lossy decode, invalid sequences -> U+FFFD.

    Python's ``errors="replace"`` and Rust's ``String::from_utf8_lossy``
    (proc3.rs:136) both substitute maximal subparts per the Unicode
    recommendation; conformance vectors are tested in
    tests/test_classify.py.
    """
    return raw.decode("utf-8", errors="replace")

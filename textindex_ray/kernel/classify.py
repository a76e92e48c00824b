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


def decode_lossy(raw: bytes) -> str:
    """UTF-8 lossy decode, invalid sequences -> U+FFFD.

    Python's ``errors="replace"`` and Rust's ``String::from_utf8_lossy``
    (proc3.rs:136) both substitute maximal subparts per the Unicode
    recommendation; conformance vectors are tested in
    tests/test_classify.py.
    """
    return raw.decode("utf-8", errors="replace")

"""Content classifier conformance (/root/reference/src/proc3.rs:301-336)."""

from textindex_ray.kernel.classify import classify_bytes, decode_lossy


def test_html_prefixes():
    for p in (
        b"<!--ADULTSONLY",
        b"<--",
        b"<head",
        b"<HTML",
        b"<html",
        b"<?xml",
        b"<!DOCTYPE",
        b"<!doctype",
        b"_<!DOCTYPE",
    ):
        assert classify_bytes(p + b" more stuff") == "html", p


def test_leading_whitespace_skipped():
    assert classify_bytes(b"  \t\n\r <html>x") == "html"
    assert classify_bytes(b"\n\n<!DOCTYPE html>") == "html"
    # whitespace is skipped only for the sniff; all-ws doc is text
    assert classify_bytes(b"   \n\t  ") == "text"


def test_binary_detection():
    assert classify_bytes(b"plain old text\nwith lines") == "text"
    assert classify_bytes(b"text with \x00 nul") == "ignore"
    assert classify_bytes(b"text with \x07 bell") == "ignore"
    assert classify_bytes(b"text with \x1f unit sep") == "ignore"
    # \t(9) \n(10) \x0b? 11 IS a control -> ignore; \r(13) ok
    assert classify_bytes(b"a\x0bb") == "ignore"
    assert classify_bytes(b"a\tb\nc\rd") == "text"
    # bytes >= 128 are fine (utf-8 etc.)
    assert classify_bytes("hällo wörld".encode()) == "text"


def test_only_first_256_bytes_sniffed():
    # control byte beyond the 256-byte sniff window is not seen
    assert classify_bytes(b"a" * 256 + b"\x00") == "text"
    assert classify_bytes(b"a" * 255 + b"\x00") == "ignore"
    # html prefix must be within the window (after ws skip)
    assert classify_bytes(b" " * 250 + b"<html>") == "html"


def test_case_sensitivity():
    # the prefix table is case-sensitive: '<Html' is not in it
    assert classify_bytes(b"<Html>") == "text"
    assert classify_bytes(b"<HEAD>") == "text"


def test_decode_lossy_vectors():
    # Rust String::from_utf8_lossy parity (maximal-subpart substitution)
    assert decode_lossy(b"\xf0\x28\x8c\x28") == "�(�("
    assert decode_lossy(b"\xe2\x82") == "�"
    assert decode_lossy(b"\xf4\x90\x80\x80") == "�" * 4
    assert decode_lossy(b"a\xc3b") == "a�b"
    assert decode_lossy(b"\xed\xa0\x80") == "�" * 3
    assert decode_lossy("héllo".encode()) == "héllo"


def test_classify_batch_vectorized_equals_scalar():
    """The Arrow/numpy batch kernel is row-identical to classify_bytes on
    edge inputs and random byte soup (incl. zero-length and all-ws rows,
    prefix-at-boundary, control bytes around the sniff window)."""
    import numpy as np
    import pyarrow as pa

    from textindex_ray.kernel.classify import classify_bytes_batch

    rng = np.random.default_rng(11)
    cases = [
        b"",
        b" ",
        b" \t\n\r",
        b"<html>",
        b"   <html>x",
        b"\t<?xml version",
        b"<Html>",
        b"_<!DOCTYPE html>",
        b"<!--ADULTSONLY",
        b"<!--ADULTSONL",  # one byte short of the longest pattern
        b"a\x00b",
        b"\x00",
        b" " * 256 + b"<html>",  # prefix entirely beyond the window
        b" " * 250 + b"<html>",
        b"a" * 256 + b"\x00",
        b"a" * 255 + b"\x00",
        b"<head",
        b"<hea",
        "hällo wörld".encode(),
        b"<--x",
    ]
    for _ in range(300):
        ln = int(rng.integers(0, 300))
        cases.append(bytes(rng.integers(0, 256, ln, dtype=np.uint8)))
        # ws-prefixed html-ish rows
        cases.append(b" " * int(rng.integers(0, 20)) + b"<htm" + bytes(rng.integers(32, 127, 5, dtype=np.uint8)))
    col = pa.array(cases, pa.binary())
    got = classify_bytes_batch(col).to_pylist()
    want = [classify_bytes(c) for c in cases]
    assert got == want
    # large_binary path too
    got_l = classify_bytes_batch(col.cast(pa.large_binary())).to_pylist()
    assert got_l == want

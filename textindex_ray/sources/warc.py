"""WARC corpus source — Common Crawl's native archive format.

The reference walks directory trees of loose .html/.txt files
(/root/reference/src/proc3/threads.rs:203-315); the web-scale
equivalent input is WARC (ISO 28500): Common Crawl ships ~90k
``.warc.gz`` files per crawl, each ~1 GB of concatenated gzip members,
one HTTP capture per member. This source reads those straight into the
engine's (url:string, html:binary) corpus schema.

Scale shape: one WARC file per read task (``read_binary_files`` — the
standard Common-Crawl sharding granularity; 90k files saturate any
fleet), then a flat map_batches parse that explodes each file into its
response payloads. Parsing is stdlib-only (zlib/gzip) and per-file
sequential — parallelism is across files, like the reference's
per-file extract loop.

Record semantics (WARC/1.0 + WARC/1.1):
- ``response`` records carry a raw HTTP response block: the HTTP
  headers are stripped, ``Transfer-Encoding: chunked`` bodies are
  de-chunked, and ``Content-Encoding: gzip/deflate`` bodies are
  decompressed (best-effort: a payload that fails to decode is kept
  raw — the downstream 256-byte sniff classifier degrades it to an
  empty text doc rather than dropping the url).
- ``resource`` and ``conversion`` (WET) records carry the payload
  directly.
- everything else (request, metadata, warcinfo, revisit) is skipped.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa

import ray.data

_SKIP_TYPES = {b"request", b"metadata", b"warcinfo", b"revisit", b"continuation"}


def warc_paths(path: str) -> list[str]:
    """Deterministic (sorted) listing of .warc/.warc.gz files under
    path (or [path] itself when it's a file)."""
    if os.path.isfile(path):
        return [path]
    out = []
    for dirpath, dirs, files in os.walk(path):
        dirs.sort()
        out.extend(
            os.path.join(dirpath, f)
            for f in sorted(files)
            if f.endswith((".warc", ".warc.gz"))
        )
    return out


def warc_has_records(path: str) -> bool:
    """Driver-side empty-corpus probe: True iff any file's first
    decompressed chunk contains a WARC version line. Never reads more
    than one buffer per file."""
    import zlib

    for p in warc_paths(path):
        try:
            with open(p, "rb") as f:
                head = f.read(1 << 16)
        except OSError:
            continue
        if head[:2] == b"\x1f\x8b":
            try:
                head = zlib.decompressobj(wbits=31).decompress(head, 1 << 16)
            except zlib.error:
                continue
        if b"WARC/" in head:
            return True
    return False


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body. Raises
    ValueError on malformed framing (caller falls back to raw)."""
    out = []
    pos = 0
    while True:
        nl = body.index(b"\r\n", pos)
        size = int(body[pos:nl].split(b";")[0], 16)
        pos = nl + 2
        if size == 0:
            break
        if len(body) < pos + size:
            raise ValueError("truncated chunk")
        out.append(body[pos : pos + size])
        pos = pos + size + 2  # skip trailing CRLF
    return b"".join(out)


def _http_payload(block: bytes) -> bytes:
    """Raw HTTP response block -> entity body (headers stripped,
    chunked framing removed, gzip/deflate content decoded). Blocks
    that are not HTTP at all are returned unchanged."""
    import zlib

    if not block.startswith(b"HTTP/"):
        return block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return b""
    headers = block[:sep].lower()
    body = block[sep + 4 :]
    if b"transfer-encoding:" in headers and b"chunked" in headers:
        try:
            body = _dechunk(body)
        except (ValueError, IndexError):
            pass  # keep raw; the sniff classifier will degrade it
    if b"content-encoding:" in headers:
        if b"gzip" in headers:
            try:
                body = gzip.decompress(body)
            except (OSError, EOFError, zlib.error):
                pass
        elif b"deflate" in headers:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                try:
                    body = zlib.decompress(body, -15)
                except zlib.error:
                    pass
    return body


def parse_warc_bytes(raw: bytes) -> list[tuple[str, bytes]]:
    """One WARC file's bytes -> [(url, payload)] in record order.
    Accepts plain or gzip input (including Common Crawl's concatenated
    per-record gzip members — ``gzip.decompress`` consumes multi-member
    streams). Malformed trailing garbage ends the scan rather than
    raising: a truncated tail loses only its own record."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    out: list[tuple[str, bytes]] = []
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not raw.startswith(b"WARC/", pos):
            break  # not a record boundary: stop at the garbage
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        rtype = b""
        uri = b""
        length = -1
        for line in raw[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            k = k.strip().lower()
            v = v.strip()
            if k == b"warc-type":
                rtype = v.lower()
            elif k == b"warc-target-uri":
                uri = v.strip(b"<>")  # WARC/1.0 writers often bracket it
            elif k == b"content-length":
                try:
                    length = int(v)
                except ValueError:
                    length = -1
        if length < 0:
            break
        block = raw[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if rtype in _SKIP_TYPES or not uri:
            continue
        payload = _http_payload(block) if rtype == b"response" else block
        out.append((uri.decode("utf-8", "replace"), payload))
    return out


def read_warc_corpus(path: str) -> "ray.data.Dataset":
    """WARC file tree -> (url:string, html:binary) corpus Dataset —
    identical downstream to the Parquet/JSONL paths (the
    ExtractTokenize sniff classifies each payload)."""
    paths = warc_paths(path)
    empty = pa.table(
        {"url": pa.array([], pa.string()), "html": pa.array([], pa.binary())}
    )
    if not paths:
        return ray.data.from_arrow(empty)
    ds = ray.data.read_binary_files(paths)

    def explode(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        payloads: list[bytes] = []
        for raw in batch.column("bytes").to_pylist():
            for u, p in parse_warc_bytes(raw):
                urls.append(u)
                payloads.append(p)
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "html": pa.array(payloads, pa.binary())}
        )

    return ds.map_batches(explode, batch_format="pyarrow")

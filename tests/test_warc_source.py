"""WARC source: Common-Crawl-style archives build an index identical
to the Parquet corpus path over the same (url, payload) captures."""

import gzip

import pyarrow as pa
import pyarrow.parquet as pq

from textindex_ray.corpus import generate_corpus
from textindex_ray.index.build import build_index
from textindex_ray.query.engine import IndexReader
from textindex_ray.sources.warc import (
    read_warc_corpus,
    warc_has_records,
)


def _rec(rtype: bytes, uri: bytes | None, block: bytes) -> bytes:
    hdrs = [b"WARC/1.0", b"WARC-Type: " + rtype]
    if uri is not None:
        hdrs.append(b"WARC-Target-URI: " + uri)
    hdrs.append(b"Content-Length: %d" % len(block))
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + block + b"\r\n\r\n"


def _http(body: bytes, extra: bytes = b"") -> bytes:
    return b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" + extra + b"\r\n" + body


def test_warc_build_matches_parquet_build(ray_session, tmp_path):
    corpus = generate_corpus(60)
    urls = corpus.column("url").to_pylist()
    raws = corpus.column("html").to_pylist()

    # shard 0: plain .warc; shard 1: .warc.gz of concatenated
    # per-record gzip members (the Common Crawl layout)
    d = tmp_path / "crawl"
    d.mkdir()
    with open(d / "part-0.warc", "wb") as f:
        for i in range(0, len(urls), 2):
            f.write(_rec(b"response", urls[i].encode(), _http(raws[i])))
    with open(d / "part-1.warc.gz", "wb") as f:
        for i in range(1, len(urls), 2):
            f.write(gzip.compress(
                _rec(b"response", urls[i].encode(), _http(raws[i]))))

    pq_dir = tmp_path / "pqcorpus"
    pq_dir.mkdir()
    pq.write_table(
        pa.table({"url": pa.array(urls, pa.string()),
                  "html": pa.array(raws, pa.binary())}),
        pq_dir / "part.parquet",
    )

    idx_w = str(tmp_path / "idx_warc")
    idx_p = str(tmp_path / "idx_parquet")
    build_index(str(d), idx_w, num_buckets=8, input_format="warc")
    build_index(str(pq_dir), idx_p, num_buckets=8)

    rw, rp = IndexReader(idx_w), IndexReader(idx_p)
    assert rw.n_docs == rp.n_docs
    assert rw._dict.column("term").to_pylist() == rp._dict.column("term").to_pylist()
    assert rw._dict.column("df").to_pylist() == rp._dict.column("df").to_pylist()
    for term in rw._dict.column("term").to_pylist()[::17]:
        ids_w, tf_w = rw.postings(term)
        ids_p, tf_p = rp.postings(term)
        assert ids_w.tolist() == ids_p.tolist(), term
        assert tf_w.tolist() == tf_p.tolist(), term
    qw = rw.bm25_topk(["lorem", "ipsum"], 10)
    qp = rp.bm25_topk(["lorem", "ipsum"], 10)
    assert qw[0].tolist() == qp[0].tolist()
    assert qw[1].tolist() == qp[1].tolist()


def test_warc_record_variants(ray_session, tmp_path):
    """HTTP header stripping, chunked de-framing, content-encoding
    decode, skip types, WET conversion records, bracketed URIs."""
    import zlib

    chunked = b"7\r\nalpha b\r\n3\r\neta\r\n0\r\n\r\n"
    gz_body = gzip.compress(b"gzipped payload")
    recs = [
        _rec(b"warcinfo", None, b"software: test\r\n"),
        _rec(b"request", b"http://x/1", b"GET / HTTP/1.1\r\n\r\n"),
        _rec(b"response", b"http://x/plain", _http(b"plain body")),
        _rec(b"response", b"http://x/chunked",
             _http(chunked, b"Transfer-Encoding: chunked\r\n")),
        _rec(b"response", b"http://x/gz",
             _http(gz_body, b"Content-Encoding: gzip\r\n")),
        _rec(b"response", b"http://x/defl",
             _http(zlib.compress(b"deflated"), b"Content-Encoding: deflate\r\n")),
        _rec(b"conversion", b"<http://x/wet>", b"extracted text only"),
        _rec(b"resource", b"http://x/res", b"raw resource bytes"),
        _rec(b"metadata", b"http://x/meta", b"ignore: me\r\n"),
    ]
    d = tmp_path / "mixed"
    d.mkdir()
    (d / "a.warc").write_bytes(b"".join(recs))

    got = (
        read_warc_corpus(str(d)).to_pandas()
        .sort_values("url").reset_index(drop=True)
    )
    want = {
        "http://x/plain": b"plain body",
        "http://x/chunked": b"alpha beta",
        "http://x/gz": b"gzipped payload",
        "http://x/defl": b"deflated",
        "http://x/wet": b"extracted text only",
        "http://x/res": b"raw resource bytes",
    }
    assert dict(zip(got["url"], got["html"])) == want


def test_warc_empty_and_garbage(ray_session, tmp_path):
    d = tmp_path / "junk"
    d.mkdir()
    (d / "x.warc").write_bytes(b"not a warc at all")
    (d / "y.txt").write_bytes(b"ignored extension")
    assert not warc_has_records(str(d))
    meta = build_index(str(d), str(tmp_path / "idx_empty"),
                       num_buckets=8, input_format="warc")
    assert meta["n_docs"] == 0
    r = IndexReader(str(tmp_path / "idx_empty"))
    assert r.find(["anything"]).size == 0

    # a truncated tail loses only its own record, never raises
    ok = _rec(b"response", b"http://x/ok", _http(b"kept"))
    (d / "z.warc").write_bytes(ok + b"WARC/1.0\r\nWARC-Type: resp")
    got = read_warc_corpus(str(d)).to_pandas()
    assert got["url"].tolist() == ["http://x/ok"]
    assert got["html"].tolist() == [b"kept"]


def test_warc_header_token_matching_and_truncated_length(ray_session, tmp_path):
    """Content-Type: application/gzip must NOT trigger body decode
    (exact header-name+token matching), and a record whose
    Content-Length runs past EOF is dropped, never emitted short."""
    import gzip as _gz

    gz_payload = _gz.compress(b"a crawled archive download")
    recs = [
        # gzip CONTENT, identity encoding: body must stay compressed
        _rec(b"response", b"http://x/download",
             _http(gz_payload,
                   b"Content-Type: application/gzip\r\n"
                   b"Content-Encoding: identity\r\n")),
        # x-gzip token IS a gzip encoding
        _rec(b"response", b"http://x/xgz",
             _http(_gz.compress(b"legacy token"),
                   b"Content-Encoding: x-gzip\r\n")),
    ]
    d = tmp_path / "hdrs"
    d.mkdir()
    (d / "a.warc").write_bytes(b"".join(recs))
    got = (
        read_warc_corpus(str(d)).to_pandas()
        .sort_values("url").reset_index(drop=True)
    )
    assert got["html"].tolist() == [gz_payload, b"legacy token"]

    # Content-Length past EOF: the broken record is dropped entirely
    ok = _rec(b"response", b"http://x/ok", _http(b"kept"))
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://x/bad\r\nContent-Length: 999999"
           b"\r\n\r\npartial")
    d2 = tmp_path / "trunc"
    d2.mkdir()
    (d2 / "b.warc").write_bytes(ok + bad)
    got2 = read_warc_corpus(str(d2)).to_pandas()
    assert got2["url"].tolist() == ["http://x/ok"]


def test_warc_streaming_decompress_and_flush(ray_session, tmp_path):
    """Member-wise streaming decompression parses many concatenated gz
    members without ever calling gzip.decompress on the whole file, and
    a truncated final member loses only its own record."""
    import gzip as _gz

    from textindex_ray.sources.warc import _iter_decompressed, parse_warc_bytes

    raw = b"".join(
        _gz.compress(_rec(b"response", b"http://s/%d" % i,
                          _http(b"body %d" % i)))
        for i in range(50)
    )
    chunks = list(_iter_decompressed(raw))
    assert len(chunks) >= 50  # streamed, not one blob
    assert len(parse_warc_bytes(raw)) == 50

    # truncated last member: 49 records survive
    cut = parse_warc_bytes(raw[:-20])
    assert len(cut) == 49


def test_warc_incremental_update(ray_session, tmp_path):
    """update_index accepts a WARC delta (input_format plumbs through
    read_corpus): the delta appends as a segment and the segmented
    reader sees base + delta docs."""
    from textindex_ray.corpus import write_corpus
    from textindex_ray.index.merge import update_index
    from textindex_ray.query.segmented import open_reader

    write_corpus(str(tmp_path / "c1"), 30, rows_per_file=16)
    idx = str(tmp_path / "idx")
    base = build_index(str(tmp_path / "c1"), idx, num_buckets=8)

    d = tmp_path / "delta"
    d.mkdir()
    with open(d / "p.warc", "wb") as f:
        for i in range(10):
            body = ("zzznew delta doc %d lorem" % i).encode()
            f.write(_rec(b"response", b"http://delta/%d" % i, _http(body)))
    m = update_index(str(d), idx, num_buckets=8, compact_ratio=10.0,
                     input_format="warc")
    assert m["added_docs"] == 10
    r = open_reader(idx)
    # base n_docs may be < 30 (the synthetic corpus dedups by url)
    assert r.n_docs == base["n_docs"] + 10
    assert len(r.find(["zzznew"])) == 10


def test_curate_wet_export_roundtrip(ray_session, tmp_path):
    """curate --format wet exports per-shard .warc.gz conversion
    records that re-ingest through sources/warc.py with the same kept
    documents."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "cur")
    r = subprocess.run(
        [sys.executable, "jobs/curate.py",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--out", out, "--langs", "en,de", "--min-tokens", "5",
         "--format", "wet"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stat = json.loads(r.stdout.strip().splitlines()[-1])
    assert stat["status"] == "ok" and stat["kept_docs"] > 0

    back = read_warc_corpus(out + "/data").to_pandas()
    assert len(back) == stat["kept_docs"]
    assert back["html"].str.len().gt(0).all()
    # urls are the doc_ids; payloads are the curated texts
    assert back["url"].str.isdigit().all()


def test_warc_parser_property(ray_session):
    """Property: any payload bytes (including embedded 'WARC/1.0',
    CRLFs, gzip magic) round-trip through the incremental parser at
    arbitrary chunk boundaries — framing is Content-Length-driven."""
    import random

    from textindex_ray.sources.warc import iter_warc_records

    rng = random.Random(0xC0FFEE)
    alphabet = [b"a", b"\r\n", b"WARC/1.0\r\n", b"\x1f\x8b", b"\r\n\r\n",
                b"Content-Length: 7\r\n", b"\x00", b"zz"]
    for trial in range(50):
        recs = []
        want = []
        for i in range(rng.randint(1, 8)):
            payload = b"".join(
                rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
            uri = ("http://p/%d/%d" % (trial, i)).encode()
            want.append((uri.decode(), payload))
            recs.append(_rec(b"resource", uri, payload))
        raw = b"".join(recs)
        # random chunking of the byte stream
        chunks = []
        pos = 0
        while pos < len(raw):
            n = rng.randint(1, 97)
            chunks.append(raw[pos : pos + n])
            pos += n
        got = list(iter_warc_records(iter(chunks)))
        assert got == want, trial

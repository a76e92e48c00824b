"""Raw web corpus -> documents-shaped table: the ingest bridge.

``index.build.read_corpus`` turns any supported source (parquet
corpus, directory walk, JSONL dumps, WARC/WET archives) into the
``(url, html)`` page relation; this module extracts text with the
byte-identity kernel (classify -> lossy decode -> HTML/txt grammar,
reference behavior per SURVEY §2.2) and emits the ``documents`` table
shape every curation / dedup / textstats operator in this repo
consumes:

    (doc_id:int64, url:string, text:string, lang:string,
     source:string, n_chars:int64)

so a Common-Crawl archive can flow straight into `pipelines.curate`,
`dedup.*`, `textstats.*`, `pack_sequences`, … without bespoke glue:

    ds = ingest_corpus("crawl/", input_format="warc")
    curated = curate(ds, keep_text=True)

Column semantics:

- ``doc_id``: deterministic content-independent id — the low 63 bits
  of md5(url) (cluster-size- and partitioning-independent, stable
  across re-ingests; reproducible in SQL from the url column). The
  documents table keys on doc_id everywhere, so ids must not depend
  on row order.
- ``lang``: the same stopword-marker heuristic as
  ``textstats.lang_id_batch`` (shared marker tables).
- ``source``: the url authority (scheme-less host) — the grouping key
  `source_cap_sample` / `mixture_sample` expect.

Scale: one stateless map_batches over the streamed page relation; the
extract kernel is the same per-row sequential grammar the index build
pays (SURVEY §2.2 — parallelism is across rows). No shuffle, no
driver state; output is written hive-sharded by `jobs/ingest.py`.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

import pyarrow as pa

from textindex_ray.kernel.classify import (
    DOCTYPE_HTML,
    DOCTYPE_IGNORE,
    classify_bytes,
    decode_lossy,
)
from textindex_ray.kernel.html_extract import extract_html_text

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def url_doc_id(url: str) -> int:
    """Low 63 bits of md5(url) as a non-negative int64."""
    return int.from_bytes(hashlib.md5(url.encode("utf-8")).digest()[:8], "big") >> 1


def url_source(url: str) -> str:
    """The url authority (host[:port]); a bare path keys under ''."""
    return urlsplit(url).netloc


def _predict_lang(text: str) -> str:
    from textindex_ray.functions.textstats import LANG_MARKERS, _tokens

    toks = _tokens(text)
    best_lang, best_n = "und", 0
    for lang in ("de", "en", "fr"):  # lang_id_batch's fixed tie-break order
        n = sum(1 for w in toks if w in LANG_MARKERS[lang])
        if n > best_n:
            best_lang, best_n = lang, n
    return best_lang


def extract_documents_batch(batch: pa.Table) -> pa.Table:
    """(url, html[, doctype]) page rows -> documents rows; ignored
    doctypes (binary junk per the reference sniff) are dropped."""
    urls = batch.column("url").to_pylist()
    raws = batch.column("html").to_pylist()
    if "doctype" in batch.column_names:
        doctypes = batch.column("doctype").to_pylist()
    else:
        doctypes = [classify_bytes(r) for r in raws]

    out_id, out_url, out_text = [], [], []
    out_lang, out_src, out_nc = [], [], []
    for url, raw, dt in zip(urls, raws, doctypes):
        if dt == DOCTYPE_IGNORE:
            continue
        s = decode_lossy(raw)
        text = extract_html_text(s) if dt == DOCTYPE_HTML else s
        out_id.append(url_doc_id(url))
        out_url.append(url)
        out_text.append(text)
        out_lang.append(_predict_lang(text))
        out_src.append(url_source(url))
        out_nc.append(len(text))
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "url": pa.array(out_url, pa.string()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n_chars": pa.array(out_nc, pa.int64()),
        }
    )


def ingest_corpus(
    corpus_path: str,
    *,
    input_format: str = "warc",
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """Any raw corpus -> streamed documents-shaped Dataset.

    ``input_format`` is read_corpus's: "parquet" | "files" | "jsonl" |
    "warc".  The extract stage is CPU-bound sequential-per-row kernel
    work, so it runs as a sized actor pool when ``concurrency`` is
    given (jobs/ingest.py passes cpus-2, the build's sizing rule) and
    as stateless tasks otherwise (tests, small corpora).
    """
    from textindex_ray.index.build import read_corpus

    ds = read_corpus(corpus_path, input_format)
    kwargs = {"batch_format": "pyarrow"}
    if concurrency:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(extract_documents_batch, **kwargs)

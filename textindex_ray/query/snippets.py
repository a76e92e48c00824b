"""Matched-line display (O12): re-read hit documents, return the lines
where any whitespace-split token wildcard-matches any query term.

Behavioral port of find_matched_lines
(/root/reference/src/proc3.rs:396-435): per line, tokens are produced by
splitting on ' ' (single spaces, NOT the indexing tokenizer), matching
is OR across terms (proc3.rs:417-424), and the document text is the
lossy-decoded raw bytes (not the extracted text).

Distributed form: a filtered corpus read (url pushdown) + vectorized
line matching inside map_batches.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from textindex_ray.kernel.classify import decode_lossy
from textindex_ray.query.engine import wildcard_to_regex


def _line_matches(line: str, regexes) -> bool:
    for word in line.split(" "):
        for rx in regexes:
            if rx.match(word):
                return True
    return False


def matched_lines(corpus_path: str, urls: list[str], terms: list[str]):
    """[(url, [matching lines...])] for each hit url, in input order."""
    if not urls:
        return []
    regexes = [re.compile(wildcard_to_regex(t)) for t in terms]

    # Push the url membership filter into the parquet read: hit sets are
    # tiny (<= a page of results) while the corpus is the whole crawl, so
    # row-group statistics prune all non-matching row groups at the scan —
    # the stage reads only the hit documents' bytes, not the corpus.
    # NOTE: an OR-of-equalities, not isin() — pyarrow 16 evaluates min/max
    # statistics for comparison expressions but not for is_in, so isin
    # would filter correctly yet read every row group. Pruning requires a
    # url-clustered corpus layout (sorted or bucket-partitioned writes).
    import pyarrow.compute as pc

    flt = None
    for u in urls:
        e = pc.field("url") == u
        flt = e if flt is None else (flt | e)
    ds = ray.data.read_parquet(corpus_path, columns=["url", "html"], filter=flt)

    def scan(batch: pa.Table) -> pa.Table:
        out_url, out_lines = [], []
        for u, raw in zip(batch.column("url").to_pylist(), batch.column("html").to_pylist()):
            txt = decode_lossy(raw)
            lines = [ln for ln in txt.split("\n") if _line_matches(ln, regexes)]
            out_url.append(u)
            out_lines.append(lines)
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "lines": pa.array(out_lines, pa.list_(pa.string())),
            }
        )

    got = {r["url"]: r["lines"] for r in ds.map_batches(scan, batch_format="pyarrow").iter_rows()}
    return [(u, got.get(u, [])) for u in urls]

"""Deterministic synthetic corpus generator (FIXTURES.md §1).

Produces the input-hint Parquet table
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)`` — Common-Crawl-style web pages — at a parameterized row
count with a fixed seed. The content matrix exercises every branch of
the reference grammar (tags, comments, doctype, cdata, bogus, dec/hex/
named charrefs, NUL bytes, bare ``<``/``&``, invalid UTF-8) and the text
specials (keyvalue, pgp, both base64 dialects, pseudo-tags, trilingual
stopwords, >20-byte words), so the byte-identity and index-conformance
suites cover the quirk paths Q1-Q7.

Word characters are restricted to the Rust/Python agreement subset
(FIXTURES.md §5): ASCII letters, Latin-1/Latin-Extended (äöüßéèê...),
Greek, Cyrillic.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pyarrow as pa

# vocabulary: reference test words (tests/test_index2.rs:124-263) + filler in
# the agreement charset; a Zipf-ish tail comes from sampling weights.
_SEED_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon"]
_FILLER = [
    "lorem", "ipsum", "dolor", "amet", "consectetur", "adipiscing", "elit",
    "vulpes", "celer", "fuscus", "saltat", "super", "canem", "pigrum",
    "härte", "müde", "straße", "école", "élève", "fenêtre", "garçon",
    "λόγος", "γράμμα", "πόλις", "слово", "книга", "мир",
    "wort", "buch", "haus", "baum", "wald", "fluss", "berg", "tal",
    "maison", "arbre", "rivière", "montagne", "vallée", "chemin",
    "house", "tree", "river", "mountain", "valley", "path", "stone",
    "zebra", "quill", "jolt", "vexing", "wizard", "sphinx", "quartz",
]
_STOPWORD_SAMPLES = ["the", "and", "der", "die", "das", "und", "le", "la", "les", "et", "a", "in"]
_LONG_WORDS = [
    "abcdefghijklmnopqrsü",          # 19 ascii + 2-byte char: truncation golden
    "übermäßiglangeswortx",          # > 20 utf-8 bytes
    "δικαιοσύνηκαιαλήθεια",          # greek, > 20 bytes
    "internationalization",          # 20 ascii bytes exactly
    "antidisestablishmentarianism",  # 28 ascii
]
_NAMED_ENTS = ["amp;", "lt;", "gt;", "Abreve;", "amp", "lt", "nbsp;", "auml;"]

_LANGS = ["de", "en", "fr"]

_EPOCH = datetime(2024, 1, 1)


def _words(rng: random.Random, n: int) -> str:
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.18:
            out.append(rng.choice(_STOPWORD_SAMPLES))
        elif r < 0.5:
            out.append(rng.choice(_SEED_VOCAB))
        elif r < 0.97:
            out.append(rng.choice(_FILLER))
        else:
            out.append(rng.choice(_LONG_WORDS))
    return " ".join(out)


def _html_body(rng: random.Random, i: int, scale: int = 1) -> bytes:
    """HTML page bytes covering the grammar content matrix."""
    prefix = rng.choice(
        [b"<!DOCTYPE html>", b"<html>", b"<HTML>", b"<head>", b"<?xml version='1.0'?>",
         b"<!doctype html>", b"<--", b"_<!DOCTYPE x>", b"<!--ADULTSONLY-->"]
    )
    parts = [prefix.decode("utf-8", "replace"), "\n"]
    n_frag = rng.randint(3, 12) * scale
    for _ in range(n_frag):
        kind = rng.random()
        if kind < 0.35:
            parts.append("<p class='c%d'>%s</p>\n" % (rng.randint(0, 9), _words(rng, rng.randint(3, 12))))
        elif kind < 0.5:
            parts.append("%s\n" % _words(rng, rng.randint(2, 10)))
        elif kind < 0.58:
            parts.append("<!-- %s -->\n" % _words(rng, 3))
        elif kind < 0.64:
            parts.append("<![CDATA[%s]]\n" % _words(rng, 2))
        elif kind < 0.70:
            parts.append("<?php bogus %d ?>\n" % i)
        elif kind < 0.78:
            parts.append("x &#%d; y &#x%x; z\n" % (65 + rng.randint(0, 25), 0x391 + rng.randint(0, 10)))
        elif kind < 0.84:
            parts.append("bare < and & chars %s\n" % _words(rng, 2))
        elif kind < 0.90:
            parts.append("</div>%s</ NOT_A_TAG>\n" % _words(rng, 2))
        else:
            parts.append("<div id=\"d%d\" data-x='&lt&gt'>%s</div>\n" % (i, _words(rng, rng.randint(2, 8))))
    # quirk rows: deterministic by index
    if i % 17 == 0:
        parts.append("entity &%s tail that will be dropped %s\n" % (rng.choice(_NAMED_ENTS), _words(rng, 4)))
    body = "".join(parts).encode("utf-8")
    if i % 23 == 0:
        # NUL mid-document (Q2): everything after is dropped by the extractor
        cut = len(body) // 2
        body = body[:cut] + b"\x00" + body[cut:]
    if i % 29 == 0:
        # invalid utf-8 bytes (lossy decode -> U+FFFD)
        body += b" tail \xf0\x28\x8c\x28 bytes\n"
    return body


def _text_body(rng: random.Random, i: int, scale: int = 1) -> bytes:
    lines = [_words(rng, rng.randint(4, 10))]  # first line: specials never match
    n_lines = rng.randint(2, 10) * scale
    for _ in range(n_lines):
        kind = rng.random()
        if kind < 0.55:
            lines.append(_words(rng, rng.randint(3, 12)))
        elif kind < 0.65:
            lines.append("Key-Words%s: %s" % (rng.choice(["", "*", "-x"]), _words(rng, 4)))
        elif kind < 0.72:
            lines.append("<%s> %s" % ("tag" + str(rng.randint(0, 99)), _words(rng, 3)))
        elif kind < 0.78:
            lines.append("<%s> %s" % ("x" * 25, _words(rng, 2)))  # >20 chars: not a tag
        else:
            lines.append(_words(rng, rng.randint(2, 8)))
    if i % 13 == 0:
        lines += ["-----BEGIN PGP SIGNATURE-----", "Version: 1", "iQEzBAAB", "-----END PGP SIGNATURE-----"]
    if i % 19 == 0:
        lines += ["begin 644 f.bin", "Mabcd", "M efgh", "`", "end"]
    if i % 31 == 0:
        lines += ["BEGIN data", "payload line", "END data"]
    body = "\n".join(lines) + "\n"
    return body.encode("utf-8")


def _ignore_body(rng: random.Random, i: int) -> bytes:
    return b"BIN\x01\x02\x03" + bytes(rng.randrange(256) for _ in range(32))


def generate_corpus(n_rows: int, seed: int = 42, body_scale: int = 1) -> pa.Table:
    """Build the corpus table deterministically. ~60% html, ~35% text, ~5% ignore.

    body_scale multiplies the fragment/line counts per document (bench
    corpora use larger, more web-page-like bodies; tests use 1).
    """
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_rows):
        rng = random.Random((seed << 20) ^ i)  # per-row rng: order/partition independent
        lang = _LANGS[i % len(_LANGS)]
        r = i % 20
        if r < 12:
            cat, body = "page", _html_body(rng, i, body_scale)
            text = ""
        elif r < 19:
            cat, body = "doc", _text_body(rng, i, body_scale)
            text = body.decode("utf-8", "replace")
        else:
            cat, body = "bin", _ignore_body(rng, i)
            text = ""
        urls.append("https://example.org/%s/%06d.html" % (cat, i))
        tss.append(_EPOCH + timedelta(seconds=i))
        htmls.append(body)
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_corpus(path: str, n_rows: int, seed: int = 42, rows_per_file: int = 4096, body_scale: int = 1) -> None:
    """Write the corpus as a directory of Parquet files (one per shard)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    table = generate_corpus(n_rows, seed, body_scale)
    if n_rows == 0:
        # still write one schema-bearing (empty) file so readers can infer
        pq.write_table(table, os.path.join(path, "corpus-00000.parquet"))
        return
    for start in range(0, n_rows, rows_per_file):
        shard = table.slice(start, rows_per_file)
        pq.write_table(shard, os.path.join(path, "corpus-%05d.parquet" % (start // rows_per_file)))


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/corpus"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    write_corpus(out, n)
    print("wrote %d rows to %s" % (n, out))

"""Text-analysis stages over a documents table: language-ID, quality
scoring, token counting, fingerprinting.

All are vectorized-per-batch ``map_batches`` stages over
``(doc_id:int64, text:string)`` input. Semantics are deliberately
SQL-expressible so the DuckDB oracle can verify them exactly
(__ray_entry__.oracle_sql); the tokenizer used here is the engine
kernel, which coincides with the regex tokenizer on the testdata
charset (plain ASCII, no markup — verified in tests).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from textindex_ray.kernel.txt_tokenize import tokenize_text

# Small per-language stopword marker sets (subsets of the reference
# trilingual list, stop_words.rs, plus Spanish for the testdata's "es").
# Kept small and fixed so the SQL oracle can inline them.
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht", "ist", "ich", "sie", "mit", "ein",
           "eine", "auch", "auf", "aber", "wie", "als", "wir", "nur", "noch", "war"),
    "en": ("the", "and", "not", "is", "you", "they", "with", "one", "also", "on",
           "but", "how", "as", "we", "only", "still", "was", "of", "to", "that"),
    "fr": ("le", "la", "les", "et", "pas", "est", "je", "ils", "avec", "un",
           "une", "aussi", "sur", "mais", "comme", "nous", "seulement", "encore",
           "que", "pour"),
}
_WORD_RE = re.compile(r"[^\W\d_]+")


def _tokens(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Predict language by stopword-marker counts, tie-break de<en<fr,
    'und' (unknown) when no marker hits."""
    texts = batch.column("text").to_pylist()
    preds = []
    for t in texts:
        toks = _tokens(t)
        best_lang, best_n = "und", 0
        for lang in ("de", "en", "fr"):  # fixed tie-break order
            n = sum(1 for w in toks if w in LANG_MARKERS[lang])
            if n > best_n:
                best_lang, best_n = lang, n
        preds.append(best_lang)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds, pa.string())}
    )


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_unique) with the word-run tokenizer."""
    texts = batch.column("text").to_pylist()
    n_tok, n_uni = [], []
    for t in texts:
        toks = _tokens(t)
        n_tok.append(len(toks))
        n_uni.append(len(set(toks)))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_unique": pa.array(n_uni, pa.int64()),
        }
    )


_ALL_STOP_MARKERS = frozenset(w for s in LANG_MARKERS.values() for w in s)


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality heuristics: length, token stats, stopword/punct ratios.

    Ratios are emitted as exact integers in parts-per-million (floor
    division) — float rounding differs between Python (half-even) and
    SQL engines (half-away), so the oracle contract avoids floats.
    """
    texts = batch.column("text").to_pylist()
    n_chars, n_tokens, stop_ppm, punct_ppm, wlen_ppm = [], [], [], [], []
    for t in texts:
        toks = _tokens(t)
        nt = len(toks)
        n_chars.append(len(t))
        n_tokens.append(nt)
        ns = sum(1 for w in toks if w in _ALL_STOP_MARKERS)
        stop_ppm.append(ns * 1_000_000 // nt if nt else 0)
        np_ = sum(1 for c in t if not (c.isalnum() or c.isspace()))
        punct_ppm.append(np_ * 1_000_000 // len(t) if t else 0)
        wlen_ppm.append(sum(len(w) for w in toks) * 1_000_000 // nt if nt else 0)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "stop_ratio_ppm": pa.array(stop_ppm, pa.int64()),
            "punct_ratio_ppm": pa.array(punct_ppm, pa.int64()),
            "mean_word_len_ppm": pa.array(wlen_ppm, pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercase text (SQL: md5(regexp_replace(lower(text), '\\s+', ' ', 'g')))."""
    texts = batch.column("text").to_pylist()
    fps = [
        hashlib.md5(re.sub(r"\s+", " ", t.lower()).encode("utf-8")).hexdigest()
        for t in texts
    ]
    return pa.table(
        {"doc_id": batch.column("doc_id"), "fingerprint": pa.array(fps, pa.string())}
    )

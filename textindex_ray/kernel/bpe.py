"""Byte-pair encoding with a real merge table (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; the
byte-level pretokenizer split follows GPT-2).

Round 4 shipped pretokenizer COUNTS as the training-cost proxy
(textstats.bpe_token_count_batch); this module adds the actual merge
loop:

- :func:`train_bpe`: learn N merges from pretoken frequencies
  (deterministic: ties break to the lexicographically largest byte
  pair), single-process — the "model training" step, run offline and
  committed like a model artifact (``goldens/bpe_merges.txt``).
- :func:`bpe_encode`: apply merges to one pretoken, lowest-rank pair
  first, all occurrences per pass — the exact inverse of training's
  apply order, so encoding a training word reproduces its final symbol
  sequence.
- :func:`bpe_merge_count_batch`: the Ray batch stage — per doc
  (n_bpe_tokens, n_bpe_unique) under the committed merge table, with a
  worker-global pretoken->encoding memo (hot pretokens encode once per
  worker process, the stages/extract cache pattern).

Graded via a golden parquet produced by an INDEPENDENT naive
reimplementation of the same spec (textindex_ray.goldens), plus a
property test driving both over random bytes.
"""

from __future__ import annotations

import os
from collections import Counter

import numpy as np
import pyarrow as pa

from textindex_ray.functions.textstats import _BPE_RE

DEFAULT_MERGES = 256


# ---------------------------------------------------------------------------
# training

def train_bpe(texts, n_merges: int = DEFAULT_MERGES) -> list[tuple[bytes, bytes]]:
    """Learn ``n_merges`` byte-pair merges from the pretoken frequency
    table of ``texts``. Deterministic: the merged pair is the
    (count, pair-bytes)-maximal one, so equal counts resolve to the
    lexicographically largest pair. Pair counts are maintained
    incrementally (only words containing the merged pair are
    re-counted), so training is O(merges x touched-words), not
    O(merges x vocabulary)."""
    pretok: Counter = Counter()
    for t in texts:
        for p in _BPE_RE.findall(t):
            pretok[p.encode("utf-8")] += 1

    words: dict[bytes, tuple] = {
        w: tuple(bytes([b]) for b in w) for w in pretok
    }
    pairs: Counter = Counter()
    where: dict[tuple, set] = {}  # pair -> words currently containing it

    def count_word(w, syms, sign):
        c = pretok[w] * sign
        for pr in zip(syms, syms[1:]):
            pairs[pr] += c
            if sign > 0:
                where.setdefault(pr, set()).add(w)

    for w, syms in words.items():
        count_word(w, syms, +1)

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        live = [(c, pr) for pr, c in pairs.items() if c > 0]
        if not live:
            break
        _, pair = max(live)
        merges.append(pair)
        new = pair[0] + pair[1]
        for w in list(where.get(pair, ())):
            syms = words[w]
            count_word(w, syms, -1)
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == pair[0] and syms[i + 1] == pair[1]:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
            count_word(w, words[w], +1)
        pairs[pair] = 0
        where.pop(pair, None)
    return merges


def save_merges(merges: list[tuple[bytes, bytes]], path: str) -> None:
    """One merge per line, rank-ordered, hex-encoded halves."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for a, b in merges:
            f.write("%s %s\n" % (a.hex(), b.hex()))
    os.replace(tmp, path)


def load_merges(path: str) -> dict[tuple[bytes, bytes], int]:
    """{(a, b): rank} — lower rank merges first."""
    ranks = {}
    with open(path) as f:
        for rank, line in enumerate(f):
            a, b = line.split()
            ranks[(bytes.fromhex(a), bytes.fromhex(b))] = rank
    return ranks


def default_merges_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "goldens", "bpe_merges.txt",
    )


# ---------------------------------------------------------------------------
# encoding

def bpe_encode(b: bytes, ranks: dict) -> tuple:
    """Symbol tuple for one pretoken: repeatedly merge the
    lowest-ranked adjacent pair (all its occurrences in one pass) until
    no mergeable pair remains."""
    syms = [bytes([x]) for x in b]
    while len(syms) > 1:
        best_rank = None
        best = None
        for pr in zip(syms, syms[1:]):
            r = ranks.get(pr)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pr
        if best is None:
            break
        a, c = best
        new = a + c
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == c:
                out.append(new)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return tuple(syms)


# worker-global state (stages/extract pattern): merge table loaded once
# per (path, mtime); pretoken encodings memoized across batches
_RANKS: dict = {}
_MEMO: dict = {}
_MEMO_CAP = 1_000_000


def _ranks_for(path: str) -> dict:
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    r = _RANKS.get(key)
    if r is None:
        _RANKS.clear()  # one live table per worker
        r = load_merges(path)
        _RANKS[key] = r
    return r


def bpe_merge_count_batch(merges_path: str | None = None):
    """Batch fn: (doc_id, text) -> (doc_id, n_bpe_tokens, n_bpe_unique)
    under the committed merge table — the REAL token-count bound the
    pretokenizer proxy (textstats.bpe_token_count_batch) approximates."""
    path = merges_path or default_merges_path()

    def fn(batch: pa.Table) -> pa.Table:
        ranks = _ranks_for(path)
        n_tok, n_uni = [], []
        for t in batch.column("text").to_pylist():
            total = 0
            uniq: set = set()
            for p in _BPE_RE.findall(t):
                pb = p.encode("utf-8")
                enc = _MEMO.get(pb)
                if enc is None:
                    enc = bpe_encode(pb, ranks)
                    if len(_MEMO) < _MEMO_CAP:
                        _MEMO[pb] = enc
                total += len(enc)
                uniq.update(enc)
            n_tok.append(total)
            n_uni.append(len(uniq))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pa.array(np.asarray(n_tok, np.int64), pa.int64()),
                "n_bpe_unique": pa.array(np.asarray(n_uni, np.int64), pa.int64()),
            }
        )

    return fn

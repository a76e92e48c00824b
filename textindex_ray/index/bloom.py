"""Compact url-membership Bloom filter for the incremental anti-join.

The reference skips already-indexed files with an exact in-memory name
scan (have_file, /root/reference/src/index2.rs:435-437). Distributed,
the committed-url set can exceed what a broadcast exact set tolerates;
the Bloom filter is the middle regime:

- committed set small  -> exact set broadcast (update_index default)
- committed set medium -> Bloom bitmap broadcast (~10 bits/url at 1% FP)
  as a PREFILTER: "definitely new" rows skip the join entirely; "maybe
  committed" rows (all committed urls + FP-rate of the new ones) are
  resolved EXACTLY with a partitioned left_anti join — semantics stay
  exact, the join only shuffles the maybe-set.
- committed set huge   -> pure left_anti join (bloom=None degenerates
  to routing every row through the join).

Hashing: Kirsch-Mitzenmacher double hashing — one blake2b(url) digest
yields (h1, h2); probe i uses (h1 + i*h2) mod m. Deterministic across
processes (no Python hash()).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np


class UrlBloom:
    __slots__ = ("m", "k", "words")

    def __init__(self, m: int, k: int, words: np.ndarray | None = None):
        assert m % 64 == 0
        self.m = m
        self.k = k
        self.words = (
            words if words is not None else np.zeros(m // 64, dtype=np.uint64)
        )

    @classmethod
    def sized_for(cls, n_items: int, fp_rate: float = 0.01) -> "UrlBloom":
        n = max(1, n_items)
        m = int(-n * math.log(fp_rate) / (math.log(2) ** 2))
        m = max(64, (m + 63) // 64 * 64)
        k = max(1, round(m / n * math.log(2)))
        return cls(m, k)

    def _positions(self, urls: list[str]) -> np.ndarray:
        """(len(urls), k) probe positions."""
        h = np.empty((len(urls), 2), dtype=np.uint64)
        for i, u in enumerate(urls):
            d = hashlib.blake2b(u.encode("utf-8"), digest_size=16).digest()
            h[i, 0] = int.from_bytes(d[:8], "big")
            h[i, 1] = int.from_bytes(d[8:], "big")
        ks = np.arange(self.k, dtype=np.uint64)
        # h1 + i*h2 with uint64 wraparound, then mod m
        return (h[:, :1] + ks[None, :] * h[:, 1:]) % np.uint64(self.m)

    def add_batch(self, urls: list[str]) -> None:
        if not urls:
            return
        pos = self._positions(urls).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_batch(self, urls: list[str]) -> np.ndarray:
        """bool array: True = maybe present, False = definitely absent."""
        if not urls:
            return np.zeros(0, dtype=bool)
        pos = self._positions(urls)
        bits = (
            self.words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bits.all(axis=1)

    def union_(self, other: "UrlBloom") -> None:
        assert self.m == other.m and self.k == other.k
        np.bitwise_or(self.words, other.words, out=self.words)

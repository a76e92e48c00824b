"""Query engine: boolean retrieval + BM25 top-k over the built index.

Mirrors the reference query surface (SURVEY.md §3.2):

- ``find(terms)``: AND-of-terms with ``*``/``?`` wildcards — per term the
  matching vocabulary entries' posting sets are unioned, then
  intersected across terms, result ordered by docID
  (/root/reference/src/index2.rs:550-582).
- ``find_files(glob)``: wildcard match over the docmap urls
  (index2.rs:447-456).
- ``bm25_topk(terms, k)``: disjunctive BM25(k1=1.2, b=0.75) top-k,
  ordered by (score desc, doc_id asc), float64 scoring — both a
  brute-force term-at-a-time scorer (the oracle path) and a block-max
  WAND scorer over the per-chunk max_impact metadata; the two are
  rank-identical (tested).

The reader is a driver-side library (or a serving actor): the dictionary
is loaded into memory; chunk rows are fetched with Parquet predicate
pushdown on ``term`` (the chunk files are (term, doc_id)-sorted, so
row-group pruning applies).
"""

from __future__ import annotations

import heapq
import json
import math
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from textindex_ray.index.codec import delta_decode, decode_tfs


def wildcard_to_regex(pat: str) -> str:
    """WildMatch ``*``/``?`` -> anchored regex (index2.rs:554)."""
    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def _has_wildcard(pat: str) -> bool:
    return "*" in pat or "?" in pat


class IndexReader:
    def __init__(self, index_path: str):
        self.path = index_path
        with open(os.path.join(index_path, "meta.json")) as f:
            self.meta = json.load(f)
        self.k1 = float(self.meta["k1"])
        self.b = float(self.meta["b"])
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"])
        dict_dir = os.path.join(index_path, "dict", "data")
        try:
            dt = pq.read_table(dict_dir)
        except (FileNotFoundError, pa.ArrowInvalid):
            dt = pa.table({"term": pa.array([], pa.string()),
                           "df": pa.array([], pa.uint64()),
                           "cf": pa.array([], pa.uint64())})
        self._dict = dt
        self._terms = dt.column("term").to_pylist()
        self._df = dict(zip(self._terms, dt.column("df").to_pylist()))
        self._chunks = pads.dataset(os.path.join(index_path, "index", "data"))

    # -- vocabulary ---------------------------------------------------------

    def resolve_terms(self, pattern: str) -> list[str]:
        """Vocabulary entries matching an exact term or wildcard pattern."""
        if not _has_wildcard(pattern):
            return [pattern] if pattern in self._df else []
        rx = re.compile(wildcard_to_regex(pattern))
        return [t for t in self._terms if rx.match(t)]

    def df(self, term: str) -> int:
        return int(self._df.get(term, 0))

    def idf(self, term: str) -> float:
        df = self.df(term)
        # math.log, not np.log: they can differ in the last ulp, and the
        # oracle/rank-identity contract is exact float64 equality
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    # -- postings -----------------------------------------------------------

    def chunk_rows(self, terms: list[str]) -> pa.Table:
        if not terms:
            return self._chunks.head(0)
        t = self._chunks.to_table(filter=pc.field("term").isin(terms))
        return t.take(pc.sort_indices(t, [("term", "ascending"), ("first_doc", "ascending")]))

    def postings(self, term: str):
        """Decoded (doc_ids, tfs) for one exact term, docID-ascending."""
        rows = self.chunk_rows([term])
        if rows.num_rows == 0:
            return np.empty(0, np.uint64), np.empty(0, np.uint64)
        ids = np.concatenate([delta_decode(b.as_py()) for b in rows.column("docs")])
        tfs = np.concatenate([decode_tfs(b.as_py()) for b in rows.column("tfs")])
        return ids, tfs

    def doc_set(self, pattern: str) -> np.ndarray:
        """Union of posting docIDs over vocabulary entries matching pattern."""
        terms = self.resolve_terms(pattern)
        if not terms:
            return np.empty(0, np.uint64)
        rows = self.chunk_rows(terms)
        if rows.num_rows == 0:
            return np.empty(0, np.uint64)
        ids = np.concatenate([delta_decode(b.as_py()) for b in rows.column("docs")])
        return np.unique(ids)

    # -- boolean find (J2) --------------------------------------------------

    def find(self, patterns: list[str]) -> np.ndarray:
        """AND-of-(wildcard-)terms -> ascending docID array (index2.rs:550-582)."""
        result = None
        for p in patterns:
            s = self.doc_set(p)
            result = s if result is None else np.intersect1d(result, s, assume_unique=True)
            if result.size == 0 and p != patterns[-1]:
                # keep reference semantics: later terms cannot revive docs
                return np.empty(0, np.uint64)
        return result if result is not None else np.empty(0, np.uint64)

    # -- docmap / files -----------------------------------------------------

    def docmap(self, columns=None) -> pa.Table:
        return pq.read_table(os.path.join(self.path, "docmap", "data"), columns=columns)

    def find_files(self, glob: str) -> list[str]:
        """Wildcard match over indexed urls (index2.rs:447-456)."""
        urls = self.docmap(columns=["url"]).column("url").to_pylist()
        rx = re.compile(wildcard_to_regex(glob))
        return [u for u in urls if rx.match(u)]

    def urls_for(self, doc_ids: np.ndarray) -> list[str]:
        dm = self.docmap(columns=["doc_id", "url"])
        order = pc.sort_indices(dm.column("doc_id"))
        dm = dm.take(order)
        ids = dm.column("doc_id").to_numpy()
        urls = dm.column("url").to_pylist()
        pos = np.searchsorted(ids, doc_ids)
        return [urls[p] for p in pos]

    def doclens(self) -> dict[int, int]:
        dm = self.docmap(columns=["doc_id", "dl"])
        return dict(zip(dm.column("doc_id").to_pylist(), dm.column("dl").to_pylist()))

    def _dl_lookup(self):
        if not hasattr(self, "_dl_arrs"):
            dm = self.docmap(columns=["doc_id", "dl"])
            ids = dm.column("doc_id").to_numpy()
            dls = dm.column("dl").to_numpy().astype(np.float64)
            order = np.argsort(ids)
            self._dl_arrs = (ids[order], dls[order])
        return self._dl_arrs

    # -- BM25 ---------------------------------------------------------------

    def _term_scores(self, term: str):
        """(doc_ids, per-doc float64 BM25 contribution) for one term."""
        ids, tfs = self.postings(term)
        if ids.size == 0:
            return ids, np.empty(0, np.float64)
        dl_ids, dl_vals = self._dl_lookup()
        dls = dl_vals[np.searchsorted(dl_ids, ids)]
        tf = tfs.astype(np.float64)
        denom = tf + self.k1 * (1.0 - self.b + self.b * dls / max(self.avgdl, 1e-9))
        return ids, self.idf(term) * tf * (self.k1 + 1.0) / denom

    def bm25_scores(self, terms: list[str]):
        """Disjunctive BM25: docID -> total score, term-at-a-time in sorted
        term order (float-stable across runs). Duplicate query terms count
        once (set semantics, matching the oracle SQL)."""
        uniq = sorted(set(terms))
        all_ids, all_scores = [], []
        for t in uniq:
            ids, sc = self._term_scores(t)
            all_ids.append(ids)
            all_scores.append(sc)
        if not all_ids or not sum(x.size for x in all_ids):
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        uids = np.unique(np.concatenate(all_ids))
        # accumulate term-at-a-time in sorted term order: the float64 adds
        # happen left-to-right per doc, identical to the oracle scorer
        totals = np.zeros(uids.size, np.float64)
        for ids, sc in zip(all_ids, all_scores):
            if ids.size:
                totals[np.searchsorted(uids, ids)] += sc
        return uids, totals

    def bm25_topk(self, terms: list[str], k: int = 10):
        """Brute-force top-k: (doc_ids, scores) by (score desc, doc_id asc)."""
        ids, scores = self.bm25_scores(terms)
        if ids.size == 0:
            return ids, scores
        order = np.lexsort((ids, -scores))[:k]
        return ids[order], scores[order]

    # -- block-max WAND -----------------------------------------------------

    def bm25_topk_wand(self, terms: list[str], k: int = 10):
        """Block-max WAND over the per-chunk max_impact metadata.

        Rank-identical to bm25_topk (tested): same float64 formula, the
        block-max bound only prunes chunks that cannot enter the top-k.
        """
        uniq = sorted(set(terms))
        cursors = []
        for t in uniq:
            rows = self.chunk_rows([t])
            if rows.num_rows:
                cursors.append(
                    _TermCursor(t, rows, self.idf(t), self.k1, self.b, self.avgdl)
                )
        if not cursors:
            return np.empty(0, np.uint64), np.empty(0, np.float64)
        dl_ids, dl_vals = self._dl_lookup()
        k1, b, avgdl = self.k1, self.b, max(self.avgdl, 1e-9)

        heap: list[tuple[float, np.uint64]] = []  # min-heap of (score, -?) ; tie handling below
        threshold = -np.inf

        while True:
            live = [c for c in cursors if not c.done]
            if not live:
                break
            live.sort(key=lambda c: c.cur_doc)
            # WAND pivot: smallest prefix whose max-impact sum exceeds threshold
            acc = 0.0
            pivot_idx = -1
            for i, c in enumerate(live):
                acc += c.max_remaining
                # >= so exact score ties can still enter (tie-break: doc asc)
                if acc >= threshold or len(heap) < k:
                    pivot_idx = i
                    break
            if pivot_idx < 0:
                break
            pivot_doc = live[pivot_idx].cur_doc
            # block-max refinement: sum of chunk maxima covering pivot_doc
            # over cursors at or before the pivot
            bm = 0.0
            for c in live:
                if c.cur_doc > pivot_doc:
                    break
                bm += c.chunk_max_at(pivot_doc)
            if len(heap) >= k and bm < threshold:
                # skip: every doc in (pivot, next_doc) is bounded by bm, where
                # next_doc respects both prefix chunk ends and suffix cursors
                nxt_prefix = min(
                    int(c.chunk_end_at(pivot_doc)) + 1
                    for c in live
                    if c.cur_doc <= pivot_doc
                )
                nxt_suffix = min(
                    (int(c.cur_doc) for c in live if c.cur_doc > pivot_doc),
                    default=nxt_prefix,
                )
                nxt = np.uint64(min(nxt_prefix, nxt_suffix))
                for c in live:
                    if c.cur_doc <= pivot_doc:
                        c.advance_to(nxt)
                continue
            # align lagging cursors to the pivot before scoring (they may
            # also contain pivot_doc further along their postings)
            lag = [c for c in live if c.cur_doc < pivot_doc]
            if lag:
                for c in lag:
                    c.advance_to(pivot_doc)
                continue
            # score pivot_doc exactly
            score = 0.0
            dl = dl_vals[np.searchsorted(dl_ids, pivot_doc)]
            for c in live:
                if not c.done and c.cur_doc == pivot_doc:
                    tf = float(c.cur_tf)
                    score += c.idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            for c in live:
                if not c.done and c.cur_doc == pivot_doc:
                    c.next_posting()
            item = (score, -int(pivot_doc))
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
            if len(heap) >= k:
                threshold = heap[0][0]

        out = sorted(heap, key=lambda x: (-x[0], -x[1]))
        ids = np.array([np.uint64(-d) for _, d in out], dtype=np.uint64)
        scores = np.array([s for s, _ in out], dtype=np.float64)
        return ids, scores


class _TermCursor:
    """Cursor over one term's chunk rows with lazy chunk decode.

    The per-chunk upper bound is computed from the stored (max_tf,
    min_dl) pair: impact is increasing in tf and decreasing in dl, so
    idf * max_tf*(k1+1)/(max_tf + k1*(1-b+b*min_dl/avgdl)) bounds every
    posting in the chunk.
    """

    def __init__(self, term: str, rows: pa.Table, idf: float, k1: float, b: float, avgdl: float):
        self.term = term
        self.idf = idf
        self.first = rows.column("first_doc").to_numpy()
        self.last = rows.column("last_doc").to_numpy()
        mtf = rows.column("max_tf").to_numpy().astype(np.float64)
        mdl = rows.column("min_dl").to_numpy().astype(np.float64)
        self.max_impact = idf * mtf * (k1 + 1.0) / (
            mtf + k1 * (1.0 - b + b * mdl / max(avgdl, 1e-9))
        )
        self.docs_bufs = rows.column("docs").to_pylist()
        self.tfs_bufs = rows.column("tfs").to_pylist()
        self.n_chunks = rows.num_rows
        self.max_remaining = float(self.max_impact.max()) if self.n_chunks else 0.0
        self.ci = 0
        self._ids = None
        self._tfs = None
        self._pi = 0
        self.done = self.n_chunks == 0
        if not self.done:
            self._load_chunk(0)

    def _load_chunk(self, ci: int):
        self.ci = ci
        self._ids = delta_decode(self.docs_bufs[ci])
        self._tfs = decode_tfs(self.tfs_bufs[ci])
        self._pi = 0

    @property
    def cur_doc(self):
        return self._ids[self._pi]

    @property
    def cur_tf(self):
        return self._tfs[self._pi]

    def chunk_max_at(self, doc) -> float:
        """Max impact of the chunk that covers/follows doc for this term."""
        ci = int(np.searchsorted(self.last, doc))
        if ci >= self.n_chunks:
            return 0.0
        return float(self.max_impact[ci])

    def chunk_end_at(self, doc):
        ci = int(np.searchsorted(self.last, doc))
        if ci >= self.n_chunks:
            return np.uint64(2**63)
        return self.last[ci]

    def next_posting(self):
        self._pi += 1
        if self._pi >= self._ids.size:
            if self.ci + 1 < self.n_chunks:
                self._load_chunk(self.ci + 1)
            else:
                self.done = True

    def advance_to(self, doc):
        """Advance cursor to first posting with doc_id >= doc."""
        if self.done:
            return
        if doc > self.last[self.n_chunks - 1]:
            self.done = True
            return
        ci = int(np.searchsorted(self.last, doc))
        if ci != self.ci:
            self._load_chunk(ci)
        self._pi = int(np.searchsorted(self._ids, doc))
        if self._pi >= self._ids.size:
            if self.ci + 1 < self.n_chunks:
                self._load_chunk(self.ci + 1)
            else:
                self.done = True

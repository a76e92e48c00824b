"""Single-process oracle: the definitional semantics of the engine.

Runs the same per-document kernels (classify / extract / tokenize) in a
plain Python loop and builds the reference outputs the distributed
pipeline must match exactly (FIXTURES.md §2):

    extracted  (url, doctype, extracted_text)     -- byte-identity artifact
    postings   (term, doc_id, tf)                 -- exact set
    dict       (term, df, cf)                     -- exact
    doclen     (doc_id, url, dl)                  -- exact
    docmap     (url, doc_id)                      -- bijection

plus a brute-force float64 BM25 scorer used as the rank-identity oracle
for the query suite (SURVEY.md §5 items 2-4). DocIDs use the same
deterministic scheme as the pipeline: bucket = md5(url)[:2 bytes] %
num_buckets, doc_id = bucket << 36 | rank-of-url-within-bucket.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa

from textindex_ray.index.build import BUCKET_SHIFT, K1, B
from textindex_ray.kernel.classify import classify_bytes, decode_lossy
from textindex_ray.kernel.html_extract import extract_html_text
from textindex_ray.kernel.txt_tokenize import tokenize_counts
from textindex_ray.stages.extract import url_bucket


class OracleIndex:
    def __init__(self, corpus: pa.Table, num_buckets: int = 64):
        self.num_buckets = num_buckets
        self.extracted = {}      # url -> (doctype, extracted_text)
        self.tf = {}             # url -> Counter(term -> tf)
        self.dl = {}             # url -> dl
        self.n_words = {}        # url -> raw word count
        for url, raw in zip(corpus.column("url").to_pylist(), corpus.column("html").to_pylist()):
            dt = classify_bytes(raw)
            if dt == "ignore":
                continue
            s = decode_lossy(raw)
            text = extract_html_text(s) if dt == "html" else s
            tf, dl, n_words = tokenize_counts(text)
            self.extracted[url] = (dt, text)
            self.tf[url] = tf
            self.dl[url] = dl
            self.n_words[url] = n_words

        # docIDs: same scheme as the pipeline
        urls = sorted(self.tf)
        buckets = url_bucket(urls, num_buckets)
        per_bucket = defaultdict(list)
        for u, b in zip(urls, buckets):
            per_bucket[int(b)].append(u)
        self.doc_id = {}
        for b, us in per_bucket.items():
            for r, u in enumerate(sorted(us)):
                self.doc_id[u] = (b << BUCKET_SHIFT) | r
        self.url_of = {d: u for u, d in self.doc_id.items()}

        # postings / dict
        self.postings = defaultdict(dict)  # term -> {doc_id: tf}
        for u, tf in self.tf.items():
            d = self.doc_id[u]
            for t, c in tf.items():
                self.postings[t][d] = c
        self.df = {t: len(p) for t, p in self.postings.items()}
        self.cf = {t: sum(p.values()) for t, p in self.postings.items()}
        self.n_docs = len(self.doc_id)
        total = sum(self.dl.values())
        self.avgdl = total / self.n_docs if self.n_docs else 0.0
        self.dl_by_id = {self.doc_id[u]: v for u, v in self.dl.items()}

    # -- tables -------------------------------------------------------------

    def postings_table(self) -> pa.Table:
        rows = [
            (t, d, c)
            for t, p in self.postings.items()
            for d, c in p.items()
        ]
        rows.sort()
        return pa.table(
            {
                "term": pa.array([r[0] for r in rows], pa.string()),
                "doc_id": pa.array([r[1] for r in rows], pa.uint64()),
                "tf": pa.array([r[2] for r in rows], pa.uint32()),
            }
        )

    def dict_table(self) -> pa.Table:
        terms = sorted(self.df)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "df": pa.array([self.df[t] for t in terms], pa.uint64()),
                "cf": pa.array([self.cf[t] for t in terms], pa.uint64()),
            }
        )

    def doclen_table(self) -> pa.Table:
        ids = sorted(self.url_of)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.uint64()),
                "url": pa.array([self.url_of[d] for d in ids], pa.string()),
                "dl": pa.array([self.dl_by_id[d] for d in ids], pa.uint32()),
            }
        )

    def invert_tf(self, url: str):
        """TmpWords::invert port (tmp_index.rs:30-38): tf -> [terms]."""
        out = {}
        for t, c in self.tf.get(url, {}).items():
            out.setdefault(c, []).append(t)
        return {k: sorted(v) for k, v in sorted(out.items())}

    def df_histogram(self, n_bins: int = 256):
        """Analog of the reference's 256-bag frequency histogram
        (bag_stats, index2.rs:100/507/526): tally of terms per
        cf-proportional frequency class."""
        total = sum(self.cf.values()) or 1
        bins = [0] * n_bins
        for t, c in self.cf.items():
            b = min(n_bins - 1, c * n_bins * 20 // total)
            bins[b] += 1
        return bins

    # -- queries ------------------------------------------------------------

    def find(self, patterns) -> list[int]:
        """AND of wildcard terms over posting sets (index2.rs:550-582)."""
        import re

        from textindex_ray.query.engine import wildcard_to_regex, _has_wildcard

        result = None
        for p in patterns:
            if _has_wildcard(p):
                rx = re.compile(wildcard_to_regex(p))
                terms = [t for t in self.postings if rx.match(t)]
            else:
                terms = [p] if p in self.postings else []
            s = set()
            for t in terms:
                s.update(self.postings[t])
            result = s if result is None else (result & s)
        return sorted(result or [])

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)

    def bm25_topk(self, terms, k: int = 10):
        """Brute-force disjunctive BM25 (float64, term-at-a-time in sorted
        unique-term order — identical accumulation order to the engine)."""
        scores = defaultdict(float)
        for t in sorted(set(terms)):
            if t not in self.postings:
                continue
            idf = self.idf(t)
            for d, tf in self.postings[t].items():
                dl = self.dl_by_id[d]
                denom = tf + K1 * (1.0 - B + B * dl / max(self.avgdl, 1e-9))
                scores[d] += idf * tf * (K1 + 1.0) / denom
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        return (
            np.array([d for d, _ in ranked], dtype=np.uint64),
            np.array([s for _, s in ranked], dtype=np.float64),
        )

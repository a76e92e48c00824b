"""Long-lived sharded BM25 serving — the online-query counterpart of
query/batch_eval.py.

The batch evaluators open shard readers per call (fine for offline
batches, measured ~1 s/shard of open+preload at 1.5 M docs). A serving
deployment holds the shards in PERSISTENT Ray actors instead: each
actor preloads its doc-range slice once (dictionary + chunk table +
dl lookup) and then answers queries at in-memory latency. This is one
of the few places raw ``@ray.remote`` actors are the right tool rather
than a Dataset stage — a shared long-lived index IS the state, and
queries are an RPC fan-out, not a batch transform
(/root/reference/src/main.rs:180-240 serves its queries from one
process; this is that surface scaled across doc shards).

Exactness: identical results to ``IndexReader.bm25_topk`` /
``find`` on the unsharded index — every doc's complete score is
computed inside one shard with global stats, the merge is a lexsort
over n_shards x k rows, and AND-set shards are disjoint (see
batch_eval.evaluate_queries_doc_sharded, same algebra; tested).
"""

from __future__ import annotations

import numpy as np

import ray

from textindex_ray.query.batch_eval import doc_shard_boundaries


@ray.remote
class _ShardActor:
    def __init__(self, index_path: str, doc_range: tuple[int, int]):
        from textindex_ray.query.engine import IndexReader

        self.reader = IndexReader(index_path, doc_range=doc_range)
        self.reader._dl_lookup()  # warm the dl arrays at startup

    def bm25_topk(self, terms: list[str], k: int):
        ids, sc = self.reader.bm25_topk_auto(list(terms), k)
        return ids, sc

    def find(self, patterns: list[str]):
        return self.reader.find(list(patterns))

    def ping(self) -> bool:
        return True


class BM25Server:
    """n_shards persistent doc-range reader actors + exact merges.

    Usage::

        srv = BM25Server(index_path, n_shards=4)
        ids, scores = srv.bm25_topk(["alpha", "beta"], k=10)
        docs = srv.find(["alph*", "beta"])
        srv.shutdown()

    ``num_cpus`` is per actor — size n_shards x num_cpus to the
    cluster; on a multi-node cluster Ray spreads the actors, each
    holding only its slice (the index never needs to fit one node).
    """

    def __init__(self, index_path: str, *, n_shards: int = 4,
                 num_cpus: float = 1.0):
        self.bounds = doc_shard_boundaries(index_path, n_shards)
        self.shards = [
            _ShardActor.options(num_cpus=num_cpus).remote(index_path, b)
            for b in self.bounds
        ]
        ray.get([s.ping.remote() for s in self.shards])  # surface init errors

    def bm25_topk(self, terms: list[str], k: int = 10):
        parts = ray.get([s.bm25_topk.remote(terms, k) for s in self.shards])
        ids = np.concatenate([p[0] for p in parts])
        sc = np.concatenate([p[1] for p in parts])
        if ids.size == 0:
            return ids, sc
        sel = np.lexsort((ids, -sc))[:k]
        return ids[sel], sc[sel]

    def find(self, patterns: list[str]) -> np.ndarray:
        parts = ray.get([s.find.remote(patterns) for s in self.shards])
        if not parts:
            return np.empty(0, np.uint64)
        return np.sort(np.concatenate(parts))  # shards disjoint: no dedup

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []

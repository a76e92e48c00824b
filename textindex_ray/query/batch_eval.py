"""Distributed batch query evaluation: a Dataset of queries scored
against the index by an actor pool (SURVEY.md §3.2: "batch query
evaluation over the reference query set runs as a small map_batches
job").

Two shapes:

- evaluate_queries: each actor holds the FULL index (dictionary +
  preloaded chunk table once in __init__); queries stream through.
  Right when the index fits a worker.
- evaluate_queries_sharded: term-RANGE sharding — the vocabulary is cut
  into contiguous ranges, each (query x shard) task loads only its
  range's dictionary slice + chunk rows (parquet predicate pushdown),
  emits per-term partials, and a groupby(qid) reduce re-accumulates in
  global sorted-term order. Because the reduce replays the exact
  term-at-a-time float64 accumulation, results are rank- AND
  score-identical to the unsharded path (tested). This is the path for
  indexes larger than a worker's memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


class QueryEvalActor:
    def __init__(self, index_path: str):
        from textindex_ray.query.engine import IndexReader

        self.reader = IndexReader(index_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("qid").to_pylist()
        kinds = batch.column("kind").to_pylist()
        terms_col = batch.column("terms").to_pylist()
        ks = batch.column("k").to_pylist() if "k" in batch.column_names else [10] * len(qids)
        out_qid, out_ids, out_scores = [], [], []
        for qid, kind, terms, k in zip(qids, kinds, terms_col, ks):
            if kind in ("term_and", "wildcard_and"):
                ids = self.reader.find(list(terms))
                scores = [0.0] * len(ids)
            elif kind == "bm25_topk":
                ids, sc = self.reader.bm25_topk_wand(list(terms), int(k) or 10)
                scores = sc.tolist()
            elif kind == "file_glob":
                urls = self.reader.find_files(terms[0] if terms else "*")
                out_qid.append(qid)
                out_ids.append([])
                out_scores.append([float(len(urls))])
                continue
            else:
                ids, scores = [], []
            out_qid.append(qid)
            out_ids.append([int(i) for i in ids])
            out_scores.append(list(scores))
        return pa.table(
            {
                "qid": pa.array(out_qid, pa.int32()),
                "doc_ids": pa.array(out_ids, pa.list_(pa.uint64())),
                "scores": pa.array(out_scores, pa.list_(pa.float64())),
            }
        )


def evaluate_queries(
    index_path: str, queries: "ray.data.Dataset", *, concurrency=2
) -> "ray.data.Dataset":
    """queries schema: qid:int32, kind:string, terms:list<string>[, k:int32]."""
    return queries.map_batches(
        QueryEvalActor,
        fn_constructor_kwargs={"index_path": index_path},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# term-range sharded evaluation


def shard_boundaries(index_path: str, n_shards: int) -> list[tuple[str, str | None]]:
    """Cut the sorted vocabulary into n contiguous (lo, hi) ranges."""
    import os

    import pyarrow.parquet as pq

    terms = pq.read_table(
        os.path.join(index_path, "dict", "data"), columns=["term"]
    ).column("term").to_pylist()
    if not terms:
        return [("", None)]
    n_shards = max(1, min(n_shards, len(terms)))
    step = (len(terms) + n_shards - 1) // n_shards
    bounds = []
    for s in range(0, len(terms), step):
        lo = terms[s] if s else ""
        hi = terms[s + step] if s + step < len(terms) else None
        bounds.append((lo, hi))
    return bounds


_PARTIAL_SCHEMA = {
    "qid": pa.int32(),
    "kind": pa.string(),
    "k": pa.int32(),
    "npat": pa.int32(),
    "pidx": pa.int32(),
    "term": pa.string(),
    "doc_ids": pa.list_(pa.uint64()),
    "scores": pa.list_(pa.float64()),
}


def _empty_partials() -> pa.Table:
    return pa.table({n: pa.array([], t) for n, t in _PARTIAL_SCHEMA.items()})


def evaluate_queries_sharded(
    index_path: str, queries: "ray.data.Dataset", *, n_shards: int = 4,
    segment_size: int = 65536,
) -> "ray.data.Dataset":
    """Term-range-sharded evaluation, rank- and score-identical to
    evaluate_queries.

    Plan: (query x shard) rows -> groupby(shard) (each task opens an
    IndexReader restricted to its term range: dictionary slice + chunk
    rows via parquet predicate pushdown) -> per-term / per-pattern
    partial rows -> groupby(qid) reduce. The reduce re-accumulates BM25
    in global sorted-term order with the same float64 kernel, so exact
    score identity holds. The docmap (dl side) is the small table and is
    loaded per shard task; file_glob queries run on shard 0 only.
    """
    bounds = shard_boundaries(index_path, n_shards)

    def explode(batch: pa.Table) -> pa.Table:
        import numpy as _np

        n = batch.num_rows
        idx = _np.repeat(_np.arange(n), len(bounds))
        shard = _np.tile(_np.arange(len(bounds), dtype=_np.int32), n)
        out = batch.take(pa.array(idx))
        return out.append_column("shard", pa.array(shard, pa.int32()))

    expanded = queries.map_batches(explode, batch_format="pyarrow")

    def eval_shard(g: pa.Table) -> pa.Table:
        from textindex_ray.query.engine import IndexReader

        shard = int(g.column("shard")[0].as_py())
        reader = IndexReader(index_path, term_range=bounds[shard])
        rows = {n: [] for n in _PARTIAL_SCHEMA}

        def emit(qid, kind, k, npat, pidx, term, ids, scores):
            rows["qid"].append(qid)
            rows["kind"].append(kind)
            rows["k"].append(k)
            rows["npat"].append(npat)
            rows["pidx"].append(pidx)
            rows["term"].append(term)
            rows["doc_ids"].append([int(i) for i in ids])
            rows["scores"].append([float(s) for s in scores])

        # bound each partial row's payload: a huge-df term's postings
        # split into SEG-sized rows instead of one giant list cell (the
        # reduce re-orders by (term, first doc), and each doc appears
        # exactly once per term, so chunking is float-identical)
        SEG = segment_size

        ks = g.column("k").to_pylist() if "k" in g.column_names else [10] * g.num_rows
        for qid, kind, terms, k in zip(
            g.column("qid").to_pylist(), g.column("kind").to_pylist(),
            g.column("terms").to_pylist(), ks,
        ):
            if shard == 0:
                # presence marker: a query whose every pattern/term is
                # empty must still produce an (empty) output row
                emit(qid, kind, k, len(terms), -2, "", [], [])
            if kind in ("term_and", "wildcard_and"):
                for pidx, pat in enumerate(terms):
                    ids = reader.doc_set(pat)
                    for s in range(0, ids.size, SEG):
                        emit(qid, kind, k, len(terms), pidx, "",
                             ids[s : s + SEG], [])
            elif kind == "bm25_topk":
                for t in sorted(set(terms)):
                    ids, sc = reader._term_scores(t)
                    for s in range(0, ids.size, SEG):
                        emit(qid, kind, k, 0, -1, t,
                             ids[s : s + SEG], sc[s : s + SEG])
            elif kind == "file_glob" and shard == 0:
                urls = reader.find_files(terms[0] if terms else "*")
                emit(qid, kind, k, 0, -1, "", [], [float(len(urls))])
        if not rows["qid"]:
            return _empty_partials()
        return pa.table({n: pa.array(v, t) for (n, t), v in
                         zip(_PARTIAL_SCHEMA.items(), rows.values())})

    partials = expanded.groupby("shard").map_groups(eval_shard, batch_format="pyarrow")

    def reduce_q(g: pa.Table) -> pa.Table:
        qid = int(g.column("qid")[0].as_py())
        kind = g.column("kind")[0].as_py()
        k = int(g.column("k")[0].as_py())
        if kind in ("term_and", "wildcard_and"):
            npat = int(g.column("npat")[0].as_py())
            per_pat = {i: [] for i in range(npat)}
            for pidx, ids in zip(g.column("pidx").to_pylist(),
                                 g.column("doc_ids").to_pylist()):
                if pidx >= 0:
                    per_pat[int(pidx)].append(np.array(ids, dtype=np.uint64))
            result = None
            for i in range(npat):
                s = (np.unique(np.concatenate(per_pat[i]))
                     if per_pat[i] else np.empty(0, np.uint64))
                result = s if result is None else np.intersect1d(
                    result, s, assume_unique=True)
            ids = result if result is not None else np.empty(0, np.uint64)
            out_ids, out_sc = [int(i) for i in ids], [0.0] * int(ids.size)
        elif kind == "bm25_topk":
            # replay the exact term-at-a-time accumulation: order rows by
            # (term, first doc of the row) — shards own contiguous sorted
            # term ranges and segments of one term are docID-ordered, so
            # this reconstructs the global sorted-unique-term order
            def row_key(i):
                ids_i = g.column("doc_ids")[i].as_py()
                return (g.column("term")[i].as_py(), ids_i[0] if ids_i else 0)

            order = sorted(range(g.num_rows), key=row_key)
            per_term = [
                (np.array(g.column("doc_ids")[i].as_py(), dtype=np.uint64),
                 np.array(g.column("scores")[i].as_py(), dtype=np.float64))
                for i in order
            ]
            if per_term:
                uids = np.unique(np.concatenate([i for i, _ in per_term]))
                totals = np.zeros(uids.size, np.float64)
                for ids_a, sc_a in per_term:
                    totals[np.searchsorted(uids, ids_a)] += sc_a
                sel = np.lexsort((uids, -totals))[:k]
                out_ids = [int(i) for i in uids[sel]]
                out_sc = [float(s) for s in totals[sel]]
            else:
                out_ids, out_sc = [], []
        else:  # file_glob: the real result row carries pidx == -1
            out_ids = []
            out_sc = [0.0]
            for i, pidx in enumerate(g.column("pidx").to_pylist()):
                if pidx == -1:
                    out_sc = list(g.column("scores")[i].as_py())
                    break
        return pa.table(
            {
                "qid": pa.array([qid], pa.int32()),
                "doc_ids": pa.array([out_ids], pa.list_(pa.uint64())),
                "scores": pa.array([out_sc], pa.list_(pa.float64())),
            }
        )

    return partials.groupby("qid").map_groups(reduce_q, batch_format="pyarrow")

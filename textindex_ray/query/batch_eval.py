"""Distributed batch query evaluation: a Dataset of queries scored
against the index by an actor pool (SURVEY.md §3.2: "batch query
evaluation over the reference query set runs as a small map_batches
job").

Each actor holds one IndexReader (dictionary + preloaded chunk table
loaded once in __init__); queries stream through in batches. At cluster
scale the pool shards by term range; here each actor holds the full
index.
"""

from __future__ import annotations

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

"""Reference query suite generator (FIXTURES.md §3).

Builds ``queries.parquet`` (qid, kind, terms, k) mirroring the
reference's query surface — `find` AND-of-wildcard-terms
(/root/reference/src/index2.rs:550-582), `files` glob
(index2.rs:447-456) — plus the BM25 top-k north-star queries, and the
golden results table computed by the single-process oracle.
"""

from __future__ import annotations

import pyarrow as pa

from textindex_ray.oracle import OracleIndex

REFERENCE_QUERIES = [
    # seed vocabulary from the reference tests (tests/test_index2.rs:124-263)
    ("term_and", ["alpha"], 0),
    ("term_and", ["alpha", "beta"], 0),
    ("term_and", ["alpha", "beta", "gamma"], 0),
    ("term_and", ["gamma", "delta", "epsilon"], 0),
    ("term_and", ["lorem", "ipsum"], 0),
    ("term_and", ["zebra", "quill"], 0),
    ("term_and", ["haus", "baum", "wald"], 0),
    ("term_and", ["maison", "arbre"], 0),
    # high-df + singleton-df + absent + stopword (must be empty)
    ("term_and", ["nonexistentterm"], 0),
    ("term_and", ["the"], 0),
    ("term_and", ["und"], 0),
    ("term_and", ["antidisestablishment"], 0),
    # wildcards
    ("wildcard_and", ["alph*"], 0),
    ("wildcard_and", ["?amma"], 0),
    ("wildcard_and", ["alp*", "bet*"], 0),
    ("wildcard_and", ["*ais*"], 0),
    ("wildcard_and", ["z*"], 0),
    ("wildcard_and", ["*"], 0),
    # file globs
    ("file_glob", ["*page*"], 0),
    ("file_glob", ["*doc*"], 0),
    ("file_glob", ["*000001*"], 0),
    # BM25 top-k (the north-star metric)
    ("bm25_topk", ["alpha"], 10),
    ("bm25_topk", ["alpha", "beta"], 10),
    ("bm25_topk", ["gamma", "delta", "epsilon"], 10),
    ("bm25_topk", ["lorem", "ipsum", "dolor"], 10),
    ("bm25_topk", ["zebra", "sphinx", "quartz"], 10),
    ("bm25_topk", ["haus", "baum", "wald"], 10),
    ("bm25_topk", ["maison", "arbre", "chemin"], 10),
    ("bm25_topk", ["alpha", "nonexistent"], 10),
    ("bm25_topk", ["école", "élève"], 10),
]


def queries_table() -> pa.Table:
    return pa.table(
        {
            "qid": pa.array(range(1, len(REFERENCE_QUERIES) + 1), pa.int32()),
            "kind": pa.array([k for k, _, _ in REFERENCE_QUERIES], pa.string()),
            "terms": pa.array([t for _, t, _ in REFERENCE_QUERIES], pa.list_(pa.string())),
            "k": pa.array([k for _, _, k in REFERENCE_QUERIES], pa.int32()),
        }
    )


def golden_table(oracle: OracleIndex) -> pa.Table:
    """qid, doc_ids (asc for boolean; ranked for bm25), scores."""
    import re

    from textindex_ray.query.engine import wildcard_to_regex

    qids, ids_out, scores_out = [], [], []
    for qid, (kind, terms, k) in enumerate(REFERENCE_QUERIES, start=1):
        if kind in ("term_and", "wildcard_and"):
            ids = oracle.find(terms)
            scores = [0.0] * len(ids)
        elif kind == "bm25_topk":
            a, s = oracle.bm25_topk(terms, k or 10)
            ids, scores = [int(x) for x in a], list(s)
        elif kind == "file_glob":
            rx = re.compile(wildcard_to_regex(terms[0]))
            urls = sorted(u for u in oracle.doc_id if rx.match(u))
            ids, scores = [], [float(len(urls))]
        qids.append(qid)
        ids_out.append(ids)
        scores_out.append(scores)
    return pa.table(
        {
            "qid": pa.array(qids, pa.int32()),
            "doc_ids": pa.array(ids_out, pa.list_(pa.uint64())),
            "scores": pa.array(scores_out, pa.list_(pa.float64())),
        }
    )


def write_fixtures(out_dir: str, n_rows: int = 5000, seed: int = 42) -> None:
    """Write corpus + queries.parquet + query_golden.parquet."""
    import os

    import pyarrow.parquet as pq

    from textindex_ray.corpus import generate_corpus, write_corpus

    os.makedirs(out_dir, exist_ok=True)
    write_corpus(os.path.join(out_dir, "corpus"), n_rows, seed)
    pq.write_table(queries_table(), os.path.join(out_dir, "queries.parquet"))
    oracle = OracleIndex(generate_corpus(n_rows, seed))
    pq.write_table(golden_table(oracle), os.path.join(out_dir, "query_golden.parquet"))

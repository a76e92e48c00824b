"""Reference query suite conformance (FIXTURES.md §3 / SURVEY.md §5.4):
the distributed engine answers the whole suite rank-identically to the
oracle goldens, through the batch-evaluation actor pool."""

import numpy as np
import pytest

from textindex_ray.corpus import generate_corpus, write_corpus
from textindex_ray.fixtures import REFERENCE_QUERIES, golden_table, queries_table
from textindex_ray.index.build import build_index
from textindex_ray.oracle import OracleIndex
from textindex_ray.query.batch_eval import evaluate_queries
from textindex_ray.query.engine import IndexReader

N = 400


@pytest.fixture(scope="module")
def suite(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("suite")
    write_corpus(str(root / "c"), N, rows_per_file=128)
    build_index(str(root / "c"), str(root / "i"), num_buckets=16)
    oracle = OracleIndex(generate_corpus(N), num_buckets=16)
    return str(root / "i"), oracle


def test_suite_rank_identical(suite):
    import ray.data

    index_path, oracle = suite
    golden = {r["qid"]: r for r in golden_table(oracle).to_pylist()}
    qds = ray.data.from_arrow(queries_table())
    res = {r["qid"]: r for r in evaluate_queries(index_path, qds).iter_rows()}
    assert set(res) == set(golden)
    for qid, (kind, terms, k) in enumerate(REFERENCE_QUERIES, start=1):
        if kind == "file_glob":
            # engine counts urls; golden stores the count in scores[0]
            r = IndexReader(index_path)
            assert float(len(r.find_files(terms[0]))) == golden[qid]["scores"][0], terms
            continue
        assert res[qid]["doc_ids"] == golden[qid]["doc_ids"], (qid, kind, terms)
        if kind == "bm25_topk":
            np.testing.assert_allclose(
                res[qid]["scores"], golden[qid]["scores"], rtol=0, atol=0
            )


def test_suite_sharded_with_tombstones(suite, tmp_path):
    """Sharded evaluation respects tombstones identically to the
    full-index path (the mask applies inside every shard's reader)."""
    import shutil

    import ray.data

    from textindex_ray.index.delete import delete_docs
    from textindex_ray.query.batch_eval import (
        evaluate_queries,
        evaluate_queries_sharded,
    )
    from textindex_ray.query.engine import IndexReader

    index_path, _ = suite
    idx = str(tmp_path / "idx_tomb")
    shutil.copytree(index_path, idx)
    r = IndexReader(idx)
    victims = r.urls_for(r.find(["alpha"])[:3])
    for u in victims:
        assert delete_docs(idx, u) == 1

    qds = ray.data.from_arrow(queries_table())
    base = {r2["qid"]: r2 for r2 in evaluate_queries(idx, qds).iter_rows()}
    shard = {
        r2["qid"]: r2
        for r2 in evaluate_queries_sharded(idx, qds, n_shards=3).iter_rows()
    }
    assert base.keys() == shard.keys()
    deleted_internal = set()
    r2 = IndexReader(index_path)
    dm = r2.docmap(columns=["doc_id", "url"])
    for d, u in zip(dm.column("doc_id").to_pylist(), dm.column("url").to_pylist()):
        if u in victims:
            deleted_internal.add(int(d))
    for qid in base:
        assert shard[qid]["doc_ids"] == base[qid]["doc_ids"], qid
        np.testing.assert_allclose(
            shard[qid]["scores"], base[qid]["scores"], rtol=0, atol=0
        )
        assert not (set(base[qid]["doc_ids"]) & deleted_internal), qid


def test_suite_sharded_identical(suite):
    """Term-range-sharded evaluation == full-index evaluation, rank AND
    float64 score identical (the reduce replays sorted-term-order
    accumulation), for several shard counts."""
    import ray.data

    from textindex_ray.query.batch_eval import evaluate_queries_sharded

    index_path, oracle = suite
    qds = ray.data.from_arrow(queries_table())
    base = {r["qid"]: r for r in evaluate_queries(index_path, qds).iter_rows()}
    # segment_size=7 forces every term's postings through the multi-row
    # partial path (the bounded-cell contract for huge-df terms)
    for n_shards, seg in ((1, 65536), (3, 65536), (8, 65536), (3, 7)):
        got = {
            r["qid"]: r
            for r in evaluate_queries_sharded(
                index_path, qds, n_shards=n_shards, segment_size=seg
            ).iter_rows()
        }
        assert set(got) == set(base), (n_shards, seg)
        for qid in base:
            assert got[qid]["doc_ids"] == base[qid]["doc_ids"], (n_shards, seg, qid)
            np.testing.assert_allclose(
                got[qid]["scores"], base[qid]["scores"], rtol=0, atol=0,
                err_msg=str((n_shards, seg, qid)),
            )


def test_suite_doc_sharded_identical(suite):
    """Doc-range-sharded evaluation (the serving partition) ==
    full-index evaluation, rank AND float64 score identical: each doc's
    complete score is computed inside one shard with global stats, so
    the k-row-per-shard merge is exact. Several shard counts, incl. 1."""
    import ray.data

    from textindex_ray.query.batch_eval import (
        evaluate_queries,
        evaluate_queries_doc_sharded,
    )

    index_path, oracle = suite
    qds = ray.data.from_arrow(queries_table())
    base = {r["qid"]: r for r in evaluate_queries(index_path, qds).iter_rows()}
    for n_shards in (1, 3, 8):
        got = {
            r["qid"]: r
            for r in evaluate_queries_doc_sharded(
                index_path, qds, n_shards=n_shards
            ).iter_rows()
        }
        assert set(got) == set(base), n_shards
        for qid in base:
            assert got[qid]["doc_ids"] == base[qid]["doc_ids"], (n_shards, qid)
            np.testing.assert_allclose(
                got[qid]["scores"], base[qid]["scores"], rtol=0, atol=0,
                err_msg=str((n_shards, qid)),
            )


def test_doc_sharded_with_tombstones(suite, tmp_path):
    """Doc-sharded evaluation respects tombstones identically (mask
    applies inside every shard's reader)."""
    import shutil

    import ray.data

    from textindex_ray.index.delete import delete_docs
    from textindex_ray.query.batch_eval import (
        evaluate_queries,
        evaluate_queries_doc_sharded,
    )
    from textindex_ray.query.engine import IndexReader

    index_path, _ = suite
    idx = str(tmp_path / "idx_tomb_ds")
    shutil.copytree(index_path, idx)
    r = IndexReader(idx)
    victims = r.urls_for(r.find(["alpha"])[:3])
    for u in victims:
        assert delete_docs(idx, u) == 1

    qds = ray.data.from_arrow(queries_table())
    base = {r2["qid"]: r2 for r2 in evaluate_queries(idx, qds).iter_rows()}
    shard = {
        r2["qid"]: r2
        for r2 in evaluate_queries_doc_sharded(idx, qds, n_shards=3).iter_rows()
    }
    for qid in base:
        assert shard[qid]["doc_ids"] == base[qid]["doc_ids"], qid
        np.testing.assert_allclose(
            shard[qid]["scores"], base[qid]["scores"], rtol=0, atol=0
        )


def test_bm25_server_identity_and_amortization(suite):
    """BM25Server (persistent doc-shard actors) returns results
    identical to the single reader for bm25 + boolean find, and repeat
    queries cost no reader re-open (second call much cheaper than the
    first construction+query)."""
    import time

    from textindex_ray.query.engine import IndexReader
    from textindex_ray.query.serve import BM25Server

    index_path, _ = suite
    r = IndexReader(index_path)
    srv = BM25Server(index_path, n_shards=3, num_cpus=0.5)
    try:
        for q in (["alpha", "beta"], ["lorem", "ipsum"], ["nosuchterm"]):
            ia, sa = srv.bm25_topk(q, 10)
            ib, sb = r.bm25_topk(q, 10)
            assert ia.tolist() == ib.tolist(), q
            np.testing.assert_allclose(sa, sb, rtol=0, atol=0)
        for pats in (["alpha"], ["alph*", "bet?"], ["zzz*"]):
            fa = srv.find(pats)
            fb = r.find(pats)
            assert fa.tolist() == fb.tolist(), pats
        t0 = time.perf_counter()
        for _ in range(5):
            srv.bm25_topk(["alpha", "beta"], 10)
        per_q = (time.perf_counter() - t0) / 5
        assert per_q < 2.0, per_q  # no per-call reader open (that's ~1s+/shard)
    finally:
        srv.shutdown()


def test_wand_under_doc_range(suite):
    """Block-max WAND with doc_range masks edge chunks exactly: rank-
    and score-identical to brute on the same range, and to the global
    result restricted to the range union."""
    from textindex_ray.query.batch_eval import doc_shard_boundaries
    from textindex_ray.query.engine import IndexReader

    index_path, _ = suite
    bounds = doc_shard_boundaries(index_path, 3)
    for rng in bounds:
        r = IndexReader(index_path, doc_range=rng)
        for q in (["alpha", "beta"], ["lorem", "ipsum"], ["alpha"]):
            ib, sb = r.bm25_topk(q, 10)
            iw, sw = r.bm25_topk_wand(q, 10)
            assert ib.tolist() == iw.tolist(), (rng, q)
            np.testing.assert_allclose(sb, sw, rtol=0, atol=0)
            lo, hi = rng
            assert all(lo <= d < hi for d in ib.tolist()), (rng, q)

"""Salted term-hash groupby path == range-sort path (identical index)."""

import numpy as np

from textindex_ray.corpus import write_corpus
from textindex_ray.index.build import build_index
from textindex_ray.query.engine import IndexReader


def test_hash_path_equals_sort_path(ray_session, tmp_path):
    corpus = str(tmp_path / "c")
    write_corpus(corpus, 250, rows_per_file=64)
    build_index(corpus, str(tmp_path / "isort"), num_buckets=8, chunk_size=32)
    # heavy_df=50 forces salting of every common term (doc-range salts)
    build_index(
        corpus, str(tmp_path / "ihash"), num_buckets=8, chunk_size=32,
        shuffle="hash", heavy_df=50,
    )
    rs, rh = IndexReader(str(tmp_path / "isort")), IndexReader(str(tmp_path / "ihash"))
    assert rs.n_docs == rh.n_docs
    assert rs._dict.column("term").to_pylist() == rh._dict.column("term").to_pylist()
    assert rs._dict.column("df").to_pylist() == rh._dict.column("df").to_pylist()
    assert rs._dict.column("cf").to_pylist() == rh._dict.column("cf").to_pylist()
    for term in rs._terms[::4]:
        a, ta = rs.postings(term)
        b, tb = rh.postings(term)
        assert a.tolist() == b.tolist(), term
        assert ta.tolist() == tb.tolist(), term
    for q in (["alpha", "beta"], ["lorem"], ["gamma", "delta", "epsilon"]):
        ia, sa = rs.bm25_topk(q, 10)
        ib, sb = rh.bm25_topk(q, 10)
        assert ia.tolist() == ib.tolist()
        np.testing.assert_allclose(sa, sb, rtol=0, atol=0)
        iw, sw = rh.bm25_topk_wand(q, 10)
        assert iw.tolist() == ib.tolist()


def test_bucket_path_equals_sort_path(ray_session, tmp_path):
    corpus = str(tmp_path / "c2")
    write_corpus(corpus, 250, rows_per_file=64)
    build_index(corpus, str(tmp_path / "is2"), num_buckets=8, chunk_size=32, shuffle="sort")
    build_index(corpus, str(tmp_path / "ib2"), num_buckets=8, chunk_size=32, shuffle="bucket")
    rs, rb = IndexReader(str(tmp_path / "is2")), IndexReader(str(tmp_path / "ib2"))
    assert rs._dict.column("term").to_pylist() == rb._dict.column("term").to_pylist()
    assert rs._dict.column("df").to_pylist() == rb._dict.column("df").to_pylist()
    for term in rs._terms[::3]:
        a, ta = rs.postings(term)
        b, tb = rb.postings(term)
        assert a.tolist() == b.tolist(), term
        assert ta.tolist() == tb.tolist(), term
    for q in (["alpha", "beta"], ["lorem"]):
        ia, sa = rs.bm25_topk(q, 10)
        ib, sb = rb.bm25_topk(q, 10)
        assert ia.tolist() == ib.tolist()
        np.testing.assert_allclose(sa, sb, rtol=0, atol=0)
        iw, sw = rb.bm25_topk_wand(q, 10)
        assert iw.tolist() == ib.tolist()
        np.testing.assert_allclose(sw, sb, rtol=0, atol=0)

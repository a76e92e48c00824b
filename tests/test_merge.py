"""Segment merge with docID remap + incremental update (SURVEY.md §7 M4)."""

import numpy as np
import pytest

from textindex_ray.corpus import generate_corpus, write_corpus
from textindex_ray.index.build import build_index
from textindex_ray.index.merge import merge_indexes, update_index
from textindex_ray.oracle import OracleIndex
from textindex_ray.query.engine import IndexReader


def test_merge_equals_single_build(ray_session, tmp_path):
    """Index(A) ⊕ Index(B) == Index(A ∪ B) exactly."""
    full = generate_corpus(240)
    a, b = full.slice(0, 150), full.slice(150, 90)
    import pyarrow.parquet as pq

    for name, t in (("a", a), ("b", b), ("full", full)):
        d = tmp_path / ("c_" + name)
        d.mkdir()
        pq.write_table(t, str(d / "part.parquet"))
    build_index(str(tmp_path / "c_a"), str(tmp_path / "ia"), num_buckets=8)
    build_index(str(tmp_path / "c_b"), str(tmp_path / "ib"), num_buckets=8)
    build_index(str(tmp_path / "c_full"), str(tmp_path / "ifull"), num_buckets=8)
    merge_indexes(
        [str(tmp_path / "ia"), str(tmp_path / "ib")], str(tmp_path / "im"), num_buckets=8
    )

    rm = IndexReader(str(tmp_path / "im"))
    rf = IndexReader(str(tmp_path / "ifull"))
    assert rm.n_docs == rf.n_docs
    assert rm.avgdl == pytest.approx(rf.avgdl)
    # dictionaries identical
    assert rm._dict.column("term").to_pylist() == rf._dict.column("term").to_pylist()
    assert rm._dict.column("df").to_pylist() == rf._dict.column("df").to_pylist()
    # postings identical per term
    for term in rm._terms[::5]:
        im, tm = rm.postings(term)
        jf, tf = rf.postings(term)
        assert im.tolist() == jf.tolist(), term
        assert tm.tolist() == tf.tolist(), term
    # BM25 rank identity between merged and single-build
    for q in (["alpha", "beta"], ["lorem", "ipsum"]):
        ids_m, sc_m = rm.bm25_topk(q, 10)
        ids_f, sc_f = rf.bm25_topk(q, 10)
        assert ids_m.tolist() == ids_f.tolist()
        np.testing.assert_allclose(sc_m, sc_f, rtol=0, atol=0)


def test_merge_duplicate_urls_first_wins(ray_session, tmp_path):
    full = generate_corpus(120)
    import pyarrow.parquet as pq

    a, b = full.slice(0, 80), full.slice(40, 80)  # overlap rows 40..80
    for name, t in (("a", a), ("b", b)):
        d = tmp_path / ("c_" + name)
        d.mkdir()
        pq.write_table(t, str(d / "part.parquet"))
    build_index(str(tmp_path / "c_a"), str(tmp_path / "ia"), num_buckets=8)
    build_index(str(tmp_path / "c_b"), str(tmp_path / "ib"), num_buckets=8)
    merge_indexes(
        [str(tmp_path / "ia"), str(tmp_path / "ib")], str(tmp_path / "im"), num_buckets=8
    )
    rm = IndexReader(str(tmp_path / "im"))
    oracle = OracleIndex(full, num_buckets=8)  # same docs as the union
    assert rm.n_docs == oracle.n_docs
    dm = rm.docmap(columns=["url"])
    assert sorted(dm.column("url").to_pylist()) == sorted(oracle.doc_id)


def test_update_index_incremental(ray_session, tmp_path):
    """update_index == full rebuild over the grown corpus."""
    import pyarrow.parquet as pq

    full = generate_corpus(200)
    first, grown = full.slice(0, 120), full
    d1 = tmp_path / "c1"
    d1.mkdir()
    pq.write_table(first, str(d1 / "part.parquet"))
    d2 = tmp_path / "c2"
    d2.mkdir()
    pq.write_table(grown, str(d2 / "part.parquet"))

    idx = str(tmp_path / "idx")
    build_index(str(d1), idx, num_buckets=8)
    update_index(str(d2), idx, num_buckets=8)

    ref = str(tmp_path / "idx_ref")
    build_index(str(d2), ref, num_buckets=8)

    ri, rr = IndexReader(idx), IndexReader(ref)
    assert ri.n_docs == rr.n_docs
    assert ri._dict.column("term").to_pylist() == rr._dict.column("term").to_pylist()
    assert ri._dict.column("df").to_pylist() == rr._dict.column("df").to_pylist()
    for q in (["alpha", "beta"], ["gamma"]):
        a, sa = ri.bm25_topk(q, 10)
        b, sb = rr.bm25_topk(q, 10)
        assert a.tolist() == b.tolist()
        np.testing.assert_allclose(sa, sb, rtol=0, atol=0)

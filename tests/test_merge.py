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


def test_merge_large_bounded_driver_memory(ray_session, tmp_path):
    """Merging multi-10k-doc indexes holds NOTHING per-doc on the driver:
    the remap relation lives in hive-partitioned parquet
    (remap/data/src=K/), the group tasks return O(num_buckets) stats
    rows, and no dense per-doc dl array is broadcast. Evidence: (a) the
    absolute driver allocation peak is small, (b) doubling the source
    sizes leaves the driver peak flat (O(buckets), not O(docs)), and
    (c) the hive remap layout exists on disk."""
    import os
    import tracemalloc

    peaks = {}
    for tag, n in (("s", 15000), ("l", 30000)):
        write_corpus(str(tmp_path / f"ca{tag}"), n, seed=1, rows_per_file=4096)
        write_corpus(str(tmp_path / f"cb{tag}"), n, seed=2, rows_per_file=4096)
        build_index(str(tmp_path / f"ca{tag}"), str(tmp_path / f"ia{tag}"), num_buckets=16)
        build_index(str(tmp_path / f"cb{tag}"), str(tmp_path / f"ib{tag}"), num_buckets=16)
        tracemalloc.start()
        merge_indexes(
            [str(tmp_path / f"ia{tag}"), str(tmp_path / f"ib{tag}")],
            str(tmp_path / f"im{tag}"),
            num_buckets=16,
        )
        _, peaks[tag] = tracemalloc.get_traced_memory()
        tracemalloc.stop()

    # absolute: the old driver-side pattern (to_pandas remap + per-url
    # dicts) costs multi-MB even at this scale; O(buckets) stats rows
    # plus Ray/pyarrow bookkeeping stay well under this
    assert peaks["s"] < 32 * 1024 * 1024, peaks
    # growth: 2x the docs must NOT grow the driver peak like O(docs)
    # (the pre-round-4 remap_df alone grew by ~MBs here); allow slack
    # for Ray block-metadata jitter
    assert peaks["l"] < peaks["s"] + 6 * 1024 * 1024, peaks
    # structural: hive remap parts exist for the winning source (a
    # source whose every url loses first-source-wins writes no parts)
    d = tmp_path / "iml" / "remap" / "data" / "src=0"
    assert d.is_dir() and any(
        f.endswith(".parquet") for f in os.listdir(d)
    ), d
    assert (tmp_path / "iml" / "remap" / "_COMMITTED").exists()

    # correctness of the larger merge ("l" pair)
    rm = IndexReader(str(tmp_path / "iml"))
    ra = IndexReader(str(tmp_path / "ial"))
    rb = IndexReader(str(tmp_path / "ibl"))
    dm_a = ra.docmap(columns=["url", "dl"])
    dm_b = rb.docmap(columns=["url", "dl"])
    urls_a = dict(zip(dm_a.column("url").to_pylist(), dm_a.column("dl").to_pylist()))
    urls_b = dict(zip(dm_b.column("url").to_pylist(), dm_b.column("dl").to_pylist()))
    assert rm.n_docs == len(set(urls_a) | set(urls_b))
    # first-source-wins: overlapping urls carry source A's document
    dm_m = rm.docmap(columns=["url", "dl"])
    merged_dl = dict(zip(dm_m.column("url").to_pylist(), dm_m.column("dl").to_pylist()))
    overlap = set(urls_a) & set(urls_b)
    for u in list(overlap)[:200]:
        assert merged_dl[u] == urls_a[u], u
    ids_m, _ = rm.bm25_topk(["alpha", "beta"], 10)
    assert len(ids_m) == 10


def test_bloom_filter_properties():
    """No false negatives ever; FP rate near nominal."""
    from textindex_ray.index.bloom import UrlBloom

    member = ["https://site-%d.example/p/%d" % (i % 97, i) for i in range(50_000)]
    fresh = ["https://other-%d.example/q/%d" % (i % 89, i) for i in range(50_000)]
    bl = UrlBloom.sized_for(len(member), fp_rate=0.01)
    for i in range(0, len(member), 8192):
        bl.add_batch(member[i : i + 8192])
    assert bl.contains_batch(member).all()  # zero false negatives
    fp = bl.contains_batch(fresh).mean()
    assert fp < 0.03, fp  # 1% nominal, 3x headroom


def test_update_index_bloom_path(ray_session, tmp_path):
    """update_index via the Bloom prefilter + left_anti join produces the
    same index as the exact-set path (semantics are exact by design)."""
    import pyarrow.parquet as pq

    full = generate_corpus(200)
    first, grown = full.slice(0, 120), full
    for name, t in (("c1", first), ("c2", grown)):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(t, str(d / "part.parquet"))

    idx_b = str(tmp_path / "idx_bloom")
    build_index(str(tmp_path / "c1"), idx_b, num_buckets=8)
    update_index(str(tmp_path / "c2"), idx_b, num_buckets=8, membership="bloom",
                 mode="merge")

    ref = str(tmp_path / "idx_ref")
    build_index(str(tmp_path / "c2"), ref, num_buckets=8)

    ri, rr = IndexReader(idx_b), IndexReader(ref)
    assert ri.n_docs == rr.n_docs
    assert ri._dict.column("term").to_pylist() == rr._dict.column("term").to_pylist()
    assert ri._dict.column("df").to_pylist() == rr._dict.column("df").to_pylist()
    a, sa = ri.bm25_topk(["alpha", "beta"], 10)
    b, sb = rr.bm25_topk(["alpha", "beta"], 10)
    assert a.tolist() == b.tolist()
    np.testing.assert_allclose(sa, sb, rtol=0, atol=0)


def test_update_index_bloom_disjoint_corpus(ray_session, tmp_path):
    """Bloom path with an ALL-NEW corpus (no committed url appears): the
    'maybe committed' side is empty at a tiny fp_rate, which previously
    flowed schema-less through the left_anti join. Result must equal a
    full rebuild over the union."""
    import pyarrow.parquet as pq

    full = generate_corpus(200)
    first, new_only = full.slice(0, 120), full.slice(120, 80)
    for name, t in (("c1", first), ("c2", new_only)):
        d = tmp_path / name
        d.mkdir()
        pq.write_table(t, str(d / "part.parquet"))
    call = tmp_path / "call"
    call.mkdir()
    pq.write_table(first, str(call / "a.parquet"))
    pq.write_table(new_only, str(call / "b.parquet"))

    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "c1"), idx, num_buckets=8)
    update_index(str(tmp_path / "c2"), idx, num_buckets=8,
                 membership="bloom", fp_rate=1e-6, mode="merge")

    ref = str(tmp_path / "idx_ref")
    build_index(str(call), ref, num_buckets=8)

    ri, rr = IndexReader(idx), IndexReader(ref)
    assert ri.n_docs == rr.n_docs
    assert ri._dict.column("term").to_pylist() == rr._dict.column("term").to_pylist()
    assert ri._dict.column("df").to_pylist() == rr._dict.column("df").to_pylist()
    a, sa = ri.bm25_topk(["alpha", "beta"], 10)
    b, sb = rr.bm25_topk(["alpha", "beta"], 10)
    assert a.tolist() == b.tolist()
    np.testing.assert_allclose(sa, sb, rtol=0, atol=0)


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
    update_index(str(d2), idx, num_buckets=8, mode="merge")

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

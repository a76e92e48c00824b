"""Document deletion: tombstones, query-time masking, merge compaction,
and re-indexing of deleted urls (reference `delete <glob>` surface,
main.rs:278-284, completed — the reference's remove_file was a todo)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from textindex_ray.corpus import generate_corpus
from textindex_ray.index.build import build_index
from textindex_ray.index.delete import delete_docs, load_tombstones
from textindex_ray.index.merge import merge_indexes, update_index
from textindex_ray.query.engine import IndexReader


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("del")
    corpus = tmp / "corpus"
    corpus.mkdir()
    pq.write_table(generate_corpus(150), str(corpus / "part.parquet"))
    idx = str(tmp / "idx")
    build_index(str(corpus), idx, num_buckets=8)
    return tmp, str(corpus), idx


def test_delete_masks_queries(built):
    tmp, corpus, idx = built
    r0 = IndexReader(idx)
    # pick a doc that matches a real query to delete
    ids0 = r0.find(["alpha"])
    assert ids0.size > 0
    victim_url = r0.urls_for(ids0[:1])[0]

    n = delete_docs(idx, victim_url)  # exact-match glob
    assert n == 1
    assert delete_docs(idx, victim_url) == 0  # idempotent

    r = IndexReader(idx)
    ids = r.find(["alpha"])
    assert ids0[0] not in ids
    assert sorted(ids) == sorted(i for i in ids0 if i != ids0[0])
    # BM25 paths exclude it too, brute == WAND
    b_ids, b_sc = r.bm25_topk(["alpha", "beta"], 10)
    w_ids, w_sc = r.bm25_topk_wand(["alpha", "beta"], 10)
    assert b_ids.tolist() == w_ids.tolist()
    assert b_sc.tolist() == w_sc.tolist()
    assert ids0[0] not in b_ids
    # files glob no longer lists it
    assert victim_url not in r.find_files("*")
    # stats keep pre-delete values until compaction (tombstone contract)
    assert r.n_docs == r0.n_docs


def test_delete_glob_and_compaction(built, tmp_path):
    tmp, corpus, idx = built
    r0 = IndexReader(idx)
    before = load_tombstones(idx).size
    n = delete_docs(idx, "*0001*")
    assert n > 0
    tomb = load_tombstones(idx)
    assert tomb.size == before + n

    # compaction: single-source merge drops tombstoned docs for real
    merged = str(tmp_path / "compacted")
    merge_indexes([idx], merged, num_buckets=8)
    rm = IndexReader(merged)
    assert load_tombstones(merged).size == 0
    assert rm.n_docs == r0.n_docs - tomb.size
    live_urls = set(rm.docmap(columns=["url"]).column("url").to_pylist())
    deleted_urls = set(IndexReader(idx).docmap(columns=["url"]).column("url").to_pylist()) - live_urls
    assert len(deleted_urls) == tomb.size
    # compacted index agrees with the masked reader on queries
    ri = IndexReader(idx)
    for q in (["alpha"], ["gamma", "delta"]):
        masked = set(ri.urls_for(ri.find(q)))
        compacted = set(rm.urls_for(rm.find(q)))
        assert masked == compacted, q


def test_deleted_url_reindexed_by_update(ray_session, tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(generate_corpus(80), str(corpus / "part.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(corpus), idx, num_buckets=8)
    r0 = IndexReader(idx)
    victim = r0.docmap(columns=["url"]).column("url").to_pylist()[0]
    assert delete_docs(idx, victim) == 1

    # update against the SAME corpus: the deleted url is live there, so it
    # must be re-indexed. mode="merge" also compacts the tombstone away;
    # the default segment mode re-indexes into a delta and keeps the base
    # tombstone masking the old copy until compaction (covered below)
    update_index(str(corpus), idx, num_buckets=8, mode="merge")
    r = IndexReader(idx)
    assert load_tombstones(idx).size == 0
    assert victim in r.find_files("*")
    assert r.n_docs == r0.n_docs


def test_deleted_url_reindexed_by_segment_update(ray_session, tmp_path):
    """Segment-mode update of a corpus containing a deleted url: the url
    is re-indexed into the delta segment, the base tombstone keeps
    masking the old copy, and the url surfaces exactly ONCE."""
    from textindex_ray.query.segmented import open_reader

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    pq.write_table(generate_corpus(80), str(corpus / "part.parquet"))
    idx = str(tmp_path / "idx")
    build_index(str(corpus), idx, num_buckets=8)
    r0 = IndexReader(idx)
    victim = r0.docmap(columns=["url"]).column("url").to_pylist()[0]
    assert delete_docs(idx, victim) == 1

    m = update_index(str(corpus), idx, num_buckets=8, compact_ratio=10.0)
    assert m["added_docs"] == 1  # only the tombstoned url was "new"
    r = open_reader(idx)
    assert r.find_files("*").count(victim) == 1
    # query paths see the re-indexed copy once, never the masked one
    urls = r.urls_for(r.doc_set("*"))
    assert urls.count(victim) == 1

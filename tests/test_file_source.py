"""Loose-file directory source (S1 walk alternative): read_binary_files
+ O1 name filter at the read == the Parquet corpus path on the same
documents (reference walk_proc + name_filter semantics)."""

import pyarrow as pa
import pyarrow.parquet as pq

from textindex_ray.corpus import generate_corpus
from textindex_ray.index.build import build_index
from textindex_ray.oracle import OracleIndex
from textindex_ray.query.engine import IndexReader


def test_file_source_build_matches_oracle(ray_session, tmp_path):
    corpus = generate_corpus(60)
    root = tmp_path / "tree"
    # lay the corpus out as a directory tree (nested dirs, mixed names)
    rel_of = {}
    for i, (url, raw) in enumerate(
        zip(corpus.column("url").to_pylist(), corpus.column("html").to_pylist())
    ):
        rel = "sub%d/doc%04d.html" % (i % 3, i)
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(raw)
        rel_of[rel] = raw
    # files the O1 name filter must drop
    (root / "sub0" / "pic.jpg").write_bytes(b"\xff\xd8\xff")
    (root / "thumbs.db").write_bytes(b"x")
    (root / "sub1" / "history.txt").write_bytes(b"alpha beta gamma")

    idx = str(tmp_path / "idx")
    build_index(str(root), idx, num_buckets=8, input_format="files")
    r = IndexReader(idx)

    # oracle over the equivalent (url=relpath, html) table
    t = pa.table(
        {
            "url": pa.array(list(rel_of), pa.string()),
            "html": pa.array(list(rel_of.values()), pa.binary()),
        }
    )
    oracle = OracleIndex(t, num_buckets=8)
    assert r.n_docs == oracle.n_docs
    dm = r.docmap(columns=["url"])
    assert sorted(dm.column("url").to_pylist()) == sorted(oracle.doc_id)
    # no blacklisted file was indexed
    assert not [u for u in dm.column("url").to_pylist()
                if u.endswith((".jpg", "thumbs.db", "history.txt"))]
    # exact postings identity vs the oracle
    assert r._dict.column("term").to_pylist() == oracle.dict_table().column("term").to_pylist()
    assert r._dict.column("df").to_pylist() == [int(x) for x in oracle.dict_table().column("df").to_pylist()]
    for term in list(oracle.postings)[::7]:
        ids, tfs = r.postings(term)
        want = sorted(oracle.postings[term].items())
        assert ids.tolist() == [d for d, _ in want], term
        assert tfs.tolist() == [c for _, c in want], term


def test_name_filter_applied_before_read(ray_session, tmp_path):
    """Blacklisted files (O1) are dropped at LISTING time: the Ray read
    never opens them (input_files excludes them), so media payloads are
    never fetched just to be discarded."""
    import os

    from textindex_ray.sources.files import list_file_corpus, read_file_corpus

    (tmp_path / "a.html").write_bytes(b"<html>alpha beta</html>")
    (tmp_path / "big.jpg").write_bytes(b"\xff\xd8" + b"x" * 4096)
    (tmp_path / "thumbs.db").write_bytes(b"y" * 1024)

    paths = list_file_corpus(str(tmp_path))
    assert [os.path.basename(p) for p in paths] == ["a.html"]

    ds = read_file_corpus(str(tmp_path))
    assert all("jpg" not in f and "thumbs" not in f for f in ds.input_files())
    rows = ds.take_all()
    assert len(rows) == 1 and rows[0]["url"] == "a.html"

    # empty tree -> empty dataset with the contract schema
    empty = tmp_path / "sub"
    empty.mkdir()
    e = read_file_corpus(str(empty))
    assert e.count() == 0
    assert set(e.schema().names) == {"url", "html"}

"""JSONL source: NDJSON dumps build an index identical to the Parquet
corpus path over the same (url, payload) documents."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from textindex_ray.corpus import generate_corpus
from textindex_ray.index.build import build_index
from textindex_ray.query.engine import IndexReader


def _write_jsonl(corpus: pa.Table, root, field: str) -> pa.Table:
    """Lay the corpus out as 2 NDJSON shards using `field` for the
    payload; returns the equivalent (url, html) parquet-path table."""
    urls = corpus.column("url").to_pylist()
    raws = corpus.column("html").to_pylist()
    texts = [r.decode("utf-8", "replace") for r in raws]
    root.mkdir(parents=True, exist_ok=True)
    for shard in (0, 1):
        with open(root / ("part-%d.jsonl" % shard), "w") as f:
            for i in range(shard, len(urls), 2):
                f.write(json.dumps({"url": urls[i], field: texts[i]},
                                   ensure_ascii=False) + "\n")
    return pa.table(
        {"url": pa.array(urls, pa.string()),
         "html": pa.array([t.encode("utf-8") for t in texts], pa.binary())}
    )


def test_jsonl_build_matches_parquet_build(ray_session, tmp_path):
    corpus = generate_corpus(60)
    table = _write_jsonl(corpus, tmp_path / "dump", field="text")

    pq_dir = tmp_path / "pqcorpus"
    pq_dir.mkdir()
    pq.write_table(table, pq_dir / "part.parquet")

    idx_j = str(tmp_path / "idx_jsonl")
    idx_p = str(tmp_path / "idx_parquet")
    build_index(str(tmp_path / "dump"), idx_j, num_buckets=8,
                input_format="jsonl")
    build_index(str(pq_dir), idx_p, num_buckets=8)

    rj, rp = IndexReader(idx_j), IndexReader(idx_p)
    assert rj.n_docs == rp.n_docs
    assert rj._dict.column("term").to_pylist() == rp._dict.column("term").to_pylist()
    assert rj._dict.column("df").to_pylist() == rp._dict.column("df").to_pylist()
    for term in rj._dict.column("term").to_pylist()[::17]:
        ids_j, tf_j = rj.postings(term)
        ids_p, tf_p = rp.postings(term)
        assert ids_j.tolist() == ids_p.tolist(), term
        assert tf_j.tolist() == tf_p.tolist(), term
    qj = rj.bm25_topk(["lorem", "ipsum"], 10)
    qp = rp.bm25_topk(["lorem", "ipsum"], 10)
    assert qj[0].tolist() == qp[0].tolist()
    assert qj[1].tolist() == qp[1].tolist()


def test_jsonl_payload_detect_nulls_and_empty(ray_session, tmp_path):
    from textindex_ray.sources.jsonl import jsonl_has_rows, read_jsonl_corpus

    d = tmp_path / "dump"
    d.mkdir()
    rows = [
        {"url": "a", "content": "alpha beta gamma"},  # auto-detect 'content'
        {"url": "b", "content": None},                # null payload -> ""
        {"url": None, "content": "orphan"},           # null url -> ""
    ]
    with open(d / "x.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    got = read_jsonl_corpus(str(d)).to_pandas().sort_values("url")
    assert got["url"].tolist() == ["", "a", "b"]
    assert got["html"].tolist() == [b"orphan", b"alpha beta gamma", b""]

    # missing payload field -> loud error
    bad = tmp_path / "bad"
    bad.mkdir()
    with open(bad / "y.jsonl", "w") as f:
        f.write(json.dumps({"url": "a", "payload": "zz"}) + "\n")
    with pytest.raises(Exception, match="payload"):
        read_jsonl_corpus(str(bad)).materialize()

    # blank-only dump -> no rows; build produces a valid empty index
    empty = tmp_path / "blank"
    empty.mkdir()
    (empty / "z.jsonl").write_text("\n  \n")
    assert not jsonl_has_rows(str(empty))
    meta = build_index(str(empty), str(tmp_path / "idx_empty"),
                       num_buckets=8, input_format="jsonl")
    assert meta["n_docs"] == 0
    r = IndexReader(str(tmp_path / "idx_empty"))
    assert r.find(["anything"]).size == 0


def test_curate_jsonl_export_roundtrip(ray_session, tmp_path):
    """curate --format jsonl exports NDJSON shards that re-ingest through
    sources/jsonl.py with the same kept documents."""
    import subprocess
    import sys

    from textindex_ray.sources.jsonl import read_jsonl_corpus

    out = str(tmp_path / "cur")
    r = subprocess.run(
        [sys.executable, "jobs/curate.py",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--out", out, "--langs", "en,de", "--min-tokens", "5",
         "--format", "jsonl"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stat = json.loads(r.stdout.strip().splitlines()[-1])
    assert stat["status"] == "ok" and stat["kept_docs"] > 0

    back = read_jsonl_corpus(out + "/data", url_field="doc_id",
                             text_field="text")
    got = back.to_pandas()
    assert len(got) == stat["kept_docs"]
    assert sorted(got.columns) == ["html", "url"]
    assert got["html"].str.len().gt(0).all()


def test_jsonl_mixed_payload_fields(ray_session, tmp_path):
    """A dump mixing {"url","html"} and {"url","text"} rows union-reads
    into both columns with nulls; the adapter must coalesce, never blank
    a row whose payload lives in the lower-priority field."""
    from textindex_ray.sources.jsonl import read_jsonl_corpus

    d = tmp_path / "mixed"
    d.mkdir()
    rows = [
        {"url": "a", "html": "<b>alpha</b>"},
        {"url": "b", "text": "beta gamma"},
        {"url": "c", "html": None, "text": "fallback"},
        # exporters that emit every key write "" for the unused
        # convention: the empty string must not shadow the real payload
        {"url": "d", "html": "", "text": "empty sibling"},
    ]
    with open(d / "x.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    got = (
        read_jsonl_corpus(str(d)).to_pandas()
        .sort_values("url").reset_index(drop=True)
    )
    assert got["html"].tolist() == [
        b"<b>alpha</b>", b"beta gamma", b"fallback", b"empty sibling"]

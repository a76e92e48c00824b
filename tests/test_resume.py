"""Resume-from-checkpoint: a build killed mid-run continues to the same
final index (SURVEY.md §5 item 5)."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

from textindex_ray.corpus import write_corpus
from textindex_ray.query.engine import IndexReader

_CHILD = """
import sys, ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from textindex_ray.index.build import build_index
build_index(sys.argv[1], sys.argv[2], num_buckets=8, batch_size=64)
ray.shutdown()
print("DONE")
"""


def _run_child(corpus, out, kill_after=None):
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    p = subprocess.Popen(
        [sys.executable, "-c", _CHILD, corpus, out],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
    )
    if kill_after is None:
        out_, _ = p.communicate(timeout=300)
        return p.returncode, out_.decode()
    time.sleep(kill_after)
    p.send_signal(signal.SIGKILL)
    p.wait(timeout=60)
    return p.returncode, ""


def test_killed_build_resumes_identically(tmp_path):
    corpus = str(tmp_path / "c")
    write_corpus(corpus, 400, rows_per_file=64)

    # clean reference build
    ref = str(tmp_path / "ref")
    rc, out = _run_child(corpus, ref)
    assert rc == 0 and "DONE" in out

    # killed build: SIGKILL while the pipeline is running, then resume
    idx = str(tmp_path / "idx")
    _run_child(corpus, idx, kill_after=8.0)
    committed_before = {
        d for d in ("tokenized", "docmap", "index", "dict")
        if os.path.exists(os.path.join(idx, d, "_COMMITTED"))
    }
    assert not os.path.exists(os.path.join(idx, "meta.json")) or committed_before
    rc, out = _run_child(corpus, idx)  # resume run
    assert rc == 0 and "DONE" in out

    ri, rr = IndexReader(idx), IndexReader(ref)
    assert ri.n_docs == rr.n_docs
    assert ri.avgdl == rr.avgdl
    assert ri._dict.column("term").to_pylist() == rr._dict.column("term").to_pylist()
    assert ri._dict.column("df").to_pylist() == rr._dict.column("df").to_pylist()
    for term in rr._terms[::6]:
        a, ta = ri.postings(term)
        b, tb = rr.postings(term)
        assert a.tolist() == b.tolist(), term
        assert ta.tolist() == tb.tolist(), term
    ia, sa = ri.bm25_topk(["alpha", "beta"], 10)
    ib, sb = rr.bm25_topk(["alpha", "beta"], 10)
    assert ia.tolist() == ib.tolist()
    np.testing.assert_allclose(sa, sb, rtol=0, atol=0)
    # lineage/metrics records exist for committed phases
    for d in ("tokenized", "docmap", "index", "dict"):
        assert os.path.exists(os.path.join(idx, d, "metrics.jsonl")), d
        rec = [json.loads(l) for l in open(os.path.join(idx, d, "metrics.jsonl"))]
        assert rec and "phase" in rec[0]


def test_alloc_tracking_opt_in(ray_session, tmp_path, monkeypatch):
    """--track-alloc analog: phase metrics.jsonl gains an "alloc"
    snapshot (driver RSS + object-store fill) when enabled, and stays
    clean when disabled (the default)."""
    import json
    import os

    from textindex_ray.corpus import write_corpus
    from textindex_ray.index.build import build_index

    corpus = str(tmp_path / "corpus")
    write_corpus(corpus, 64, rows_per_file=64)

    monkeypatch.delenv("GRAFT_TRACK_ALLOC", raising=False)
    out_off = str(tmp_path / "idx_off")
    build_index(corpus, out_off, num_buckets=4)
    with open(os.path.join(out_off, "index", "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert all("alloc" not in r for r in recs)

    monkeypatch.setenv("GRAFT_TRACK_ALLOC", "1")
    out_on = str(tmp_path / "idx_on")
    build_index(corpus, out_on, num_buckets=4)
    with open(os.path.join(out_on, "index", "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    snaps = [r["alloc"] for r in recs if "alloc" in r]
    assert snaps, recs
    assert snaps[0]["driver_rss_mb"] > 0
    assert snaps[0]["object_store_mb"] > 0

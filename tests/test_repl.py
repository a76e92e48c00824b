"""REPL command surface (reference main.rs:196-368 parity): find with
20-result paging, next/first, files glob, bm25, stats, delete — driven
through the actual CLI process over a stdin pipe."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from textindex_ray.corpus import generate_corpus
from textindex_ray.index.build import build_index

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def repl_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("repl")
    corpus = tmp / "c"
    corpus.mkdir()
    pq.write_table(generate_corpus(120), str(corpus / "p.parquet"))
    idx = str(tmp / "i")
    build_index(str(corpus), idx, num_buckets=8)
    return idx


def _repl(idx, script: str) -> list:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "repl.py"), "--index", idx],
        input=script, capture_output=True, text=True, timeout=120,
        env=dict(os.environ, PYTHONPATH=REPO), cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-500:]
    return [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{") or l.startswith("[")]


def test_repl_find_paging(repl_index):
    rows = _repl(repl_index, "find alpha\nnext\nfirst\nquit\n")
    assert len(rows) == 3
    assert rows[0]["page"] == 0 and len(rows[0]["urls"]) <= 20
    total = rows[0]["total"]
    if total > 20:
        assert rows[1]["page"] == 1
    assert rows[2]["page"] == 0 and rows[2]["urls"] == rows[0]["urls"]


def test_repl_bm25_files_stats_delete(repl_index):
    rows = _repl(
        repl_index,
        "bm25 alpha beta\nfiles *doc*\nstats\nbogus\nquit\n",
    )
    assert "urls" in rows[0] and len(rows[0]["urls"]) <= 10
    assert isinstance(rows[1], list)
    assert rows[2]["n_docs"] > 0
    assert "error" in rows[3]
    # delete via REPL tombstones and the reloaded reader masks it
    victim = rows[0]["urls"][0]
    rows2 = _repl(repl_index, "delete %s\nbm25 alpha beta\nquit\n" % victim)
    assert rows2[0]["deleted"] == 1
    assert victim not in rows2[1]["urls"]


def test_repl_tab_completion_core(repl_index):
    """Completion core (cmdlib.rs counterpart): command names at column 0,
    vocabulary terms by prefix for term-taking commands, nothing for
    non-term arguments."""
    from jobs.repl import COMMANDS, complete_candidates
    from textindex_ray.query.engine import IndexReader

    r = IndexReader(repl_index)
    # column 0: command names
    got = complete_candidates(r, "f", 0, "f")
    assert set(got) == {"find ", "files ", "first "}
    assert complete_candidates(r, "", 0, "") == [c + " " for c in COMMANDS]
    # term argument: prefix-matched vocabulary entries
    terms = complete_candidates(r, "find alp", 5, "alp")
    assert terms and all(t.startswith("alp") for t in terms)
    assert all(t.rstrip() in r.resolve_terms("alp*") for t in terms)
    # non-term command argument: no candidates
    assert complete_candidates(r, "files alp", 6, "alp") == []
    # wildcard already typed: leave it alone
    assert complete_candidates(r, "find alp*", 5, "alp*") == []

"""Positional index: persisted term positions, path-pruned reads,
phrase/proximity position algebra."""

import os

import numpy as np
import pyarrow as pa

from textindex_ray.index.positions import (
    build_positions, phrase_docs, positions_dataset, proximity_docs)


def _store(tmp_path, rows):
    import ray.data

    out = str(tmp_path / "pos")
    build_positions(ray.data.from_items(rows), out, num_partitions=8)
    return out


def test_phrase_and_proximity_ground_truth(ray_session, tmp_path):
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma delta"},
        {"doc_id": 2, "text": "beta alpha beta gamma"},
        {"doc_id": 3, "text": "gamma beta alpha"},
        {"doc_id": 4, "text": "alpha beta alpha beta gamma"},
        {"doc_id": 5, "text": ""},
        {"doc_id": 6, "text": "alpha alpha alpha"},
    ]
    out = _store(tmp_path, rows)

    # 2-term phrase
    got = phrase_docs(out, ["alpha", "beta"]).column("doc_id").to_pylist()
    assert got == [1, 2, 4]
    # 3-term phrase (chained adjacency; doc 2 = "beta ALPHA BETA GAMMA")
    got3 = phrase_docs(out, ["alpha", "beta", "gamma"]).column("doc_id").to_pylist()
    assert got3 == [1, 2, 4]
    # duplicate-term phrase
    dup = phrase_docs(out, ["alpha", "alpha"]).column("doc_id").to_pylist()
    assert dup == [6]
    # absent term -> empty, never an exception
    assert phrase_docs(out, ["alpha", "zzz"]).num_rows == 0
    assert phrase_docs(out, ["qqq", "zzz"]).num_rows == 0

    # proximity: within-2 unordered
    prox = proximity_docs(out, "alpha", "gamma", 2).column("doc_id").to_pylist()
    assert prox == [1, 2, 3, 4]
    # nearest alpha-gamma distance anywhere in the fixture is 2
    assert proximity_docs(out, "alpha", "gamma", 1).num_rows == 0
    assert proximity_docs(out, "beta", "gamma", 1).column(
        "doc_id").to_pylist() == [1, 2, 3, 4]


def test_positions_path_pruning_and_rebuild(ray_session, tmp_path):
    import ray.data

    # letter-only vocab: the position tokenizer is \pL+ (digits excluded)
    vocab = ["w" + chr(ord("a") + i) for i in range(13)]
    rows = [
        {"doc_id": i, "text": " ".join(vocab[(i + j) % 13] for j in range(6))}
        for i in range(40)
    ]
    out = _store(tmp_path, rows)

    from textindex_ray.index.positions import term_part_files

    all_files = set(term_part_files(out, vocab))
    one = set(term_part_files(out, ["wd"]))
    assert one and one < all_files  # strict IO subset

    # the pruned read still yields exactly wd's rows
    t = positions_dataset(out, ["wd"]).to_pandas()
    assert set(t.term) == {"wd"}
    want = {r["doc_id"] for r in rows if "wd" in r["text"].split()}
    assert set(t.doc_id) == want

    # rebuilding into the same dir must not double-count
    build_positions(ray.data.from_items(rows), out, num_partitions=8)
    t2 = positions_dataset(out, ["wd"]).to_pandas()
    assert len(t2) == len(t)


def test_positions_match_scan_phrase(ray_session):
    """Positional phrase == the scan-verify doc_phrase on the testdata
    charset (pure [a-z space], so token adjacency == the regex)."""
    from textindex_ray.pipelines.documents import (
        doc_phrase, doc_phrase_positions)

    sf = "/root/testdata/sf0.001"
    a = doc_phrase_positions(sf).column("doc_id").to_pylist()
    b = doc_phrase(sf).column("doc_id").to_pylist()
    assert a == b and len(a) > 0


def test_positions_empty_corpus(ray_session, tmp_path):
    import pyarrow as pa

    import ray.data

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    out = str(tmp_path / "pos")
    build_positions(empty, out, num_partitions=8)
    assert phrase_docs(out, ["a", "b"]).num_rows == 0
    assert proximity_docs(out, "a", "b", 3).num_rows == 0


def test_positions_delta_stores(ray_session, tmp_path):
    """A base store plus a delta store (the segmented-lifecycle analog)
    answers phrase/proximity identically to one store over the union —
    deltas may even use a different partition count."""
    import ray.data

    base_rows = [
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "gamma beta alpha"},
    ]
    delta_rows = [
        {"doc_id": 10, "text": "alpha beta zeta"},
        {"doc_id": 11, "text": "zeta alpha"},
    ]
    b = str(tmp_path / "base")
    d = str(tmp_path / "delta")
    u = str(tmp_path / "union")
    build_positions(ray.data.from_items(base_rows), b, num_partitions=8)
    build_positions(ray.data.from_items(delta_rows), d, num_partitions=3)
    build_positions(ray.data.from_items(base_rows + delta_rows), u,
                    num_partitions=8)

    for terms in (["alpha", "beta"], ["beta", "zeta"], ["zeta"]):
        got = phrase_docs([b, d], terms).column("doc_id").to_pylist()
        want = phrase_docs(u, terms).column("doc_id").to_pylist()
        assert got == want, terms
    got = proximity_docs([b, d], "alpha", "zeta", 2).column("doc_id").to_pylist()
    want = proximity_docs(u, "alpha", "zeta", 2).column("doc_id").to_pylist()
    assert got == want == [10, 11]

"""Positional index: persisted term-position store + index-level phrase
and proximity matching.

The engine's scan path verifies phrases by re-reading candidate text
(pipelines/documents.py doc_phrase — the reference has no positional
store at all, its phrase semantics are grep-like line matching,
/root/reference/src/proc3/proc3.rs line matcher). This module adds the
standard positional-postings design (Manning et al., IIR ch. 2):
positions of every term are persisted once, and a phrase query answers
from integer position algebra without touching text again.

Layout: hive ``part=crc32(term) % P`` parquet of
``(term, doc_id, positions list<int32>)`` rows — one row per (term,
doc) — so a phrase query reads ONLY its terms' part directories
(path pruning; the same trick as the IVF cell layout). Positions are
indices into the UNFILTERED lowercased ``\\pL+`` token stream
(stopwords included — adjacency is textual), 1-based to match the SQL
oracle's ``generate_series``.

Scale shape: the build is one map_batches explode + a hive write (no
shuffle — part is a column, not a groupby); a phrase query moves only
the query terms' rows (df-bounded) through one doc groupby whose groups
are k rows each.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa

import ray.data

from textindex_ray.functions.textstats import _WORD_RE

DEFAULT_PARTITIONS = 64


def _term_part(term: str, num_partitions: int) -> int:
    return zlib.crc32(term.encode("utf-8")) % num_partitions


def build_positions(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    num_partitions: int = DEFAULT_PARTITIONS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """(doc_id, text) Dataset -> persisted positional store. Returns the
    meta dict. Rebuild into the same out_dir wipes the previous tree
    (uuid part files must never double-count)."""
    P = int(num_partitions)

    def explode(batch: pa.Table) -> pa.Table:
        out_t, out_d, out_p, out_part = [], [], [], []
        for did, text in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            pos: dict[str, list[int]] = {}
            for i, w in enumerate(_WORD_RE.findall(text.lower()), start=1):
                pos.setdefault(w, []).append(i)
            for w, pl in pos.items():
                out_t.append(w)
                out_d.append(did)
                out_p.append(pl)
                out_part.append(_term_part(w, P))
        return pa.table(
            {"term": pa.array(out_t, pa.string()),
             "doc_id": pa.array(out_d, pa.int64()),
             "positions": pa.array(out_p, pa.list_(pa.int32())),
             "part": pa.array(out_part, pa.int32())}
        )

    data_dir = os.path.join(out_dir, "data")
    meta_path = os.path.join(out_dir, "meta.json")
    os.makedirs(out_dir, exist_ok=True)
    # meta.json is the COMMIT MARKER: drop it before touching data so an
    # interrupted rebuild leaves a loudly-invalid store (readers raise
    # FileNotFoundError) instead of a stale marker validating wiped or
    # differently-partitioned data
    if os.path.exists(meta_path):
        os.remove(meta_path)
    if os.path.isdir(data_dir):
        import shutil

        shutil.rmtree(data_dir)
    ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    ).write_parquet(data_dir, partition_cols=["part"])
    meta = {"num_partitions": P}
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def _load_meta(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "meta.json")) as f:
        return json.load(f)


def term_part_files(out_dir, terms: list[str]) -> list[str]:
    """The parquet files a query for ``terms`` must read — only the
    terms' part directories (the IO-pruning evidence for tests).

    ``out_dir`` may be a single store or a LIST of stores (a base plus
    delta stores, the positional analog of the index's segment list:
    an increment builds a small delta store with build_positions and
    queries union the part files — each store prunes by its own
    num_partitions, so deltas can use fewer partitions than the base).
    """
    dirs = [out_dir] if isinstance(out_dir, str) else list(out_dir)
    files = []
    for od in dirs:
        P = _load_meta(od)["num_partitions"]
        for p in sorted({_term_part(t, P) for t in terms}):
            d = os.path.join(od, "data", "part=%d" % p)
            if os.path.isdir(d):
                files.extend(
                    os.path.join(d, f) for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
    return files


def positions_dataset(out_dir, terms: list[str]) -> "ray.data.Dataset":
    """Path-pruned Dataset of the query terms' position rows: opens ONLY
    the terms' part directories (term_part_files), then filters to the
    exact terms. ``out_dir`` may be a store or a list of stores (base +
    deltas; doc_ids must be disjoint across stores, which the engine's
    update anti-join guarantees for new-url deltas)."""
    files = term_part_files(out_dir, terms)
    empty = pa.table(
        {"term": pa.array([], pa.string()),
         "doc_id": pa.array([], pa.int64()),
         "positions": pa.array([], pa.list_(pa.int32()))}
    )
    if not files:
        return ray.data.from_arrow(empty)
    tset = sorted(set(terms))

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.is_in(batch.column("term"), pa.array(tset, pa.string()))
        ).select(["term", "doc_id", "positions"])

    return ray.data.read_parquet(files).map_batches(keep, batch_format="pyarrow")


def _docs_matching(
    out_dir, terms: list[str], combine
) -> pa.Table:
    """Shared driver: fetch the terms' rows, group per doc (k rows per
    group), apply ``combine(positions_by_term) -> bool``."""
    from textindex_ray.functions._util import probe_count

    terms = list(terms)
    need = sorted(set(terms))
    # probe_count: materialize-once count guard (a zero-row groupby
    # loses the schema; a bare count() would re-execute the read+filter
    # lineage for the real consumption)
    ds, n = probe_count(positions_dataset(out_dir, need))
    # a doc with zero rows for some needed term can never match: the
    # doc groupby only sees docs with >= 1 matching term, groups are
    # <= len(need) rows
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})

    def per_doc(g: pa.Table) -> pa.Table:
        by_term = {
            t: np.asarray(pl, np.int64)
            for t, pl in zip(g.column("term").to_pylist(),
                             g.column("positions").to_pylist())
        }
        if any(t not in by_term for t in need):
            return pa.table({"doc_id": pa.array([], pa.int64())})
        if combine(by_term):
            return pa.table(
                {"doc_id": pa.array([g.column("doc_id")[0].as_py()], pa.int64())}
            )
        return pa.table({"doc_id": pa.array([], pa.int64())})

    out = ds.groupby("doc_id").map_groups(
        per_doc, batch_format="pyarrow"
    ).to_pandas()
    if out.empty:
        # every group emitted zero rows (e.g. one query term absent from
        # the corpus): the collected frame has no schema to sort on
        return pa.table({"doc_id": pa.array([], pa.int64())})
    out = out.sort_values("doc_id")
    return pa.table({"doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64())})


def phrase_docs(out_dir, terms: list[str]) -> pa.Table:
    """Docs where ``terms`` occur as adjacent words in order (position
    algebra: P1 ∩ (P2 - 1) ∩ (P3 - 2) ... nonempty) — no text rescans.
    ``out_dir``: a store dir or a list of them (base + deltas)."""

    def combine(by_term: dict) -> bool:
        cand = by_term[terms[0]]
        for off, t in enumerate(terms[1:], start=1):
            cand = cand[np.isin(cand + off, by_term[t])]
            if cand.size == 0:
                return False
        return True

    return _docs_matching(out_dir, terms, combine)


def proximity_docs(out_dir, t1: str, t2: str, k: int) -> pa.Table:
    """Docs where t1 and t2 occur within k token positions (unordered).
    ``out_dir``: a store dir or a list of them (base + deltas)."""
    from textindex_ray.functions._util import sorted_min_gap

    def combine(by_term: dict) -> bool:
        return sorted_min_gap(by_term[t1], by_term[t2]) <= k

    return _docs_matching(out_dir, [t1, t2], combine)

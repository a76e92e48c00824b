"""Distributed index build: corpus Parquet -> inverted index segments.

Ray-Data-first physical plan (SURVEY.md §3.1 / §7):

    Phase T  tokenize   read_parquet(corpus, columns=url/html)
                        -> map_batches(classify_batch)            [stateless]
                        -> map_batches(ExtractTokenize, actor pool)
                        -> write_parquet(out/tokenized)           [checkpoint]
    Phase S  stats      read(tokenized: dl) -> count + sum        [tiny agg]
    Phase P  postings   read(tokenized)
                        -> groupby(bucket).map_groups(assign+explode)
                           (deterministic docIDs; docmap parts written
                            atomically inside the group task)
                        -> sort(term, doc_id)                      [the wide step]
                        -> map_batches(encode_chunks)              [delta+varint]
                        -> write_parquet(out/index)
    Phase D  dict       read(index: term,n,cf) -> groupby(term).sum -> out/dict

Shuffle inventory: ONE hash shuffle keyed on ``bucket`` (doc-granular,
before postings explode — the small side of the data) and ONE range
shuffle on ``(term, doc_id)`` (the postings sort). The sort handles
heavy-hitter skew natively: a hot term's postings span several range
partitions and simply produce several chunk rows — the index format is
chunked per term, so no per-term all-in-one-task reduce exists anywhere
(contrast the reference's single merge thread + 256 frequency bags,
threads.rs:523-561, word_map.rs:23-43). An explicit salted
groupby-aggregate variant is provided by build_postings_hash() for
comparison; both produce identical indexes.

DocIDs: ``doc_id = bucket << 36 | rank_of_url_within_bucket`` with
``bucket = md5(url)[:2 bytes] % num_buckets`` — deterministic,
execution-order-independent, reproducible in SQL (the DuckDB oracle
computes the same ids). Dense per bucket, so delta+varint stays
compact.

Resume: each phase directory gets an atomic ``_COMMITTED`` marker and a
``metrics.jsonl`` lineage record; a rerun skips committed phases, and
``incremental=True`` anti-joins the corpus against already-indexed urls
(the reference's have_file dedup, threads.rs:292-297, made distributed).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from textindex_ray.index.codec import delta_encode, encode_tfs
from textindex_ray.stages.extract import ExtractTokenize, classify_batch

K1 = 1.2
B = 0.75
BUCKET_SHIFT = 36  # doc_id = (bucket << 36) | local rank

_DEFAULTS = dict(num_buckets=64, chunk_size=1024, batch_size=256, concurrency=None)


def _data(d: str) -> str:
    """Parquet files live under <phase>/data; markers/metrics at <phase>/."""
    return os.path.join(d, "data")


def _committed(d: str) -> bool:
    return os.path.exists(os.path.join(d, "_COMMITTED"))


def _commit(d: str, metrics: dict) -> None:
    with open(os.path.join(d, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(metrics) + "\n")
    with open(os.path.join(d, "_COMMITTED.tmp"), "w") as f:
        f.write(json.dumps({"ts": time.time()}))
    os.replace(os.path.join(d, "_COMMITTED.tmp"), os.path.join(d, "_COMMITTED"))


def make_assign_and_explode(docmap_dir: str):
    """Per-bucket group fn: assign deterministic docIDs, persist the
    docmap part atomically, and explode (term, doc_id, tf, dl) postings."""

    def assign_and_explode(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("url"))
        group = group.take(order)
        n = group.num_rows
        if n == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "doc_id": pa.array([], pa.uint64()),
                 "tf": pa.array([], pa.uint32()), "dl": pa.array([], pa.uint32())}
            )
        bucket = int(group.column("bucket")[0].as_py())
        doc_ids = (np.uint64(bucket) << np.uint64(BUCKET_SHIFT)) + np.arange(n, dtype=np.uint64)

        docmap = pa.table(
            {
                "url": group.column("url"),
                "doc_id": pa.array(doc_ids, pa.uint64()),
                "segment_id": pa.array(np.full(n, bucket, dtype=np.uint32), pa.uint32()),
                "local_doc_id": pa.array(np.arange(n, dtype=np.uint64), pa.uint64()),
                "dl": group.column("dl"),
                "n_words": group.column("n_words"),
                "doctype": group.column("doctype"),
            }
        )
        tmp = os.path.join(docmap_dir, "docmap-%05d.parquet.tmp" % bucket)
        pq.write_table(docmap, tmp)
        os.replace(tmp, os.path.join(docmap_dir, "docmap-%05d.parquet" % bucket))

        terms = group.column("terms")
        tfs = group.column("tfs")
        flat_terms = pc.list_flatten(terms)
        flat_tfs = pc.list_flatten(tfs)
        lens = pc.list_value_length(terms).to_numpy().astype(np.int64)
        rep_doc = np.repeat(doc_ids, lens)
        rep_dl = np.repeat(group.column("dl").to_numpy().astype(np.uint32), lens)
        return pa.table(
            {
                "term": flat_terms,
                "doc_id": pa.array(rep_doc, pa.uint64()),
                "tf": flat_tfs,
                "dl": pa.array(rep_dl, pa.uint32()),
            }
        )

    return assign_and_explode


def make_encode_chunks(avgdl: float, chunk_size: int):
    """Encode a (term, doc_id, tf, dl)-sorted batch into posting chunks.

    A term whose postings span multiple sorted blocks yields multiple
    chunk rows (doc ranges disjoint and ordered) — that is the index
    format, so range-partition skew needs no special casing.
    """
    k1b = K1 * (1.0 - B)
    k1bn = K1 * B / max(avgdl, 1e-9)

    def encode_chunks(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_chunks()
        enc = pc.dictionary_encode(batch.column("term").combine_chunks())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy()
        uniq = enc.dictionary.to_pylist()
        doc_ids = batch.column("doc_id").to_numpy()
        tfs = batch.column("tf").to_numpy().astype(np.uint64)
        dls = batch.column("dl").to_numpy().astype(np.float64)
        # per-posting impact (idf applied at query time), float64
        tff = tfs.astype(np.float64)
        impact = tff * (K1 + 1.0) / (tff + k1b + k1bn * dls)

        bounds = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(codes)]))

        o_term, o_first, o_last, o_n, o_maxtf, o_maximp, o_cf, o_docs, o_tfb = (
            [], [], [], [], [], [], [], [], [])
        for s, e in zip(starts, ends):
            term = uniq[codes[s]]
            for cs in range(s, e, chunk_size):
                ce = min(cs + chunk_size, e)
                ids = doc_ids[cs:ce]
                t = tfs[cs:ce]
                o_term.append(term)
                o_first.append(ids[0])
                o_last.append(ids[-1])
                o_n.append(ce - cs)
                o_maxtf.append(int(t.max()))
                o_maximp.append(float(impact[cs:ce].max()))
                o_cf.append(int(t.sum()))
                o_docs.append(delta_encode(ids))
                o_tfb.append(encode_tfs(t))
        return pa.table(
            {
                "term": pa.array(o_term, pa.string()),
                "first_doc": pa.array(o_first, pa.uint64()),
                "last_doc": pa.array(o_last, pa.uint64()),
                "n": pa.array(o_n, pa.uint32()),
                "max_tf": pa.array(o_maxtf, pa.uint32()),
                "max_impact": pa.array(o_maximp, pa.float64()),
                "cf": pa.array(o_cf, pa.uint64()),
                "docs": pa.array(o_docs, pa.large_binary()),
                "tfs": pa.array(o_tfb, pa.large_binary()),
            }
        )

    return encode_chunks


def _empty_chunks() -> pa.Table:
    return pa.table(
        {
            "term": pa.array([], pa.string()),
            "first_doc": pa.array([], pa.uint64()),
            "last_doc": pa.array([], pa.uint64()),
            "n": pa.array([], pa.uint32()),
            "max_tf": pa.array([], pa.uint32()),
            "max_impact": pa.array([], pa.float64()),
            "cf": pa.array([], pa.uint64()),
            "docs": pa.array([], pa.large_binary()),
            "tfs": pa.array([], pa.large_binary()),
        }
    )


def _empty_docmap() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.uint64()),
            "segment_id": pa.array([], pa.uint32()),
            "local_doc_id": pa.array([], pa.uint64()),
            "dl": pa.array([], pa.uint32()),
            "n_words": pa.array([], pa.uint32()),
            "doctype": pa.array([], pa.string()),
        }
    )


def _write_empty_index(out_dir: str, num_buckets: int, chunk_size: int) -> dict:
    """Zero-document corpus: emit a valid, queryable empty index."""
    for sub, table in (
        ("docmap", _empty_docmap()),
        ("index", _empty_chunks()),
        (
            "dict",
            pa.table({"term": pa.array([], pa.string()),
                      "df": pa.array([], pa.uint64()),
                      "cf": pa.array([], pa.uint64())}),
        ),
    ):
        d = os.path.join(out_dir, sub)
        os.makedirs(_data(d), exist_ok=True)
        pq.write_table(table, os.path.join(_data(d), "empty.parquet"))
        _commit(d, {"phase": sub, "empty": True})
    meta = {
        "n_docs": 0, "total_dl": 0, "avgdl": 0.0, "k1": K1, "b": B,
        "num_buckets": num_buckets, "bucket_shift": BUCKET_SHIFT,
        "chunk_size": chunk_size, "timings": {}, "empty": True,
        "built_at": time.time(),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def build_index(
    corpus_path,
    out_dir: str,
    *,
    num_buckets: int = 64,
    chunk_size: int = 1024,
    batch_size: int = 256,
    concurrency=None,
    keep_text: bool = False,
    incremental: bool = False,
    resume: bool = True,
) -> dict:
    """Run the full build. Returns the meta dict (N, avgdl, timings)."""
    os.makedirs(out_dir, exist_ok=True)
    tok_dir = os.path.join(out_dir, "tokenized")
    docmap_dir = os.path.join(out_dir, "docmap")
    index_dir = os.path.join(out_dir, "index")
    dict_dir = os.path.join(out_dir, "dict")
    timings = {}

    if not (resume and _committed(tok_dir)) and ray.data.read_parquet(corpus_path).count() == 0:
        return _write_empty_index(out_dir, num_buckets, chunk_size)

    # ---- Phase T: tokenize ------------------------------------------------
    if not (resume and _committed(tok_dir)):
        t0 = time.time()
        os.makedirs(_data(tok_dir), exist_ok=True)
        ds = ray.data.read_parquet(corpus_path, columns=["url", "html"])
        if incremental and _committed(docmap_dir):
            done = set(
                pq.read_table(_data(docmap_dir), columns=["url"]).column("url").to_pylist()
            )
            done_ref = ray.put(done)
            ds = ds.map_batches(
                lambda b, ref=done_ref: b.filter(
                    pa.array([u not in ray.get(ref) for u in b.column("url").to_pylist()])
                ),
                batch_format="pyarrow",
            )
        kwargs = {}
        if concurrency is not None:
            kwargs["concurrency"] = concurrency
        (
            ds.map_batches(classify_batch, batch_format="pyarrow")
            .map_batches(
                ExtractTokenize,
                fn_constructor_kwargs={"num_buckets": num_buckets, "keep_text": keep_text},
                batch_format="pyarrow",
                batch_size=batch_size,
                **(kwargs or {"concurrency": (1, 8)}),
            )
            .write_parquet(_data(tok_dir))
        )
        timings["tokenize_sec"] = time.time() - t0
        _commit(tok_dir, {"phase": "tokenize", "sec": timings["tokenize_sec"]})

    # ---- Phase S: corpus stats -------------------------------------------
    t0 = time.time()
    stats_ds = ray.data.read_parquet(_data(tok_dir), columns=["dl"])
    n_docs = stats_ds.count()
    total_dl = stats_ds.sum("dl") if n_docs else 0
    avgdl = (total_dl / n_docs) if n_docs else 0.0
    timings["stats_sec"] = time.time() - t0

    # ---- Phase P: postings ------------------------------------------------
    if not (resume and _committed(index_dir)):
        t0 = time.time()
        os.makedirs(_data(docmap_dir), exist_ok=True)
        os.makedirs(_data(index_dir), exist_ok=True)
        tok = ray.data.read_parquet(
            _data(tok_dir),
            columns=["url", "bucket", "doctype", "dl", "n_words", "terms", "tfs"],
        )
        postings = tok.groupby("bucket").map_groups(
            make_assign_and_explode(_data(docmap_dir)), batch_format="pyarrow"
        )
        chunks = postings.sort(["term", "doc_id"]).map_batches(
            make_encode_chunks(avgdl, chunk_size), batch_format="pyarrow"
        )
        chunks.write_parquet(_data(index_dir))
        timings["postings_sec"] = time.time() - t0
        _commit(docmap_dir, {"phase": "docmap", "sec": timings["postings_sec"]})
        _commit(index_dir, {"phase": "index", "sec": timings["postings_sec"]})

    # ---- Phase D: dictionary ---------------------------------------------
    if not (resume and _committed(dict_dir)):
        t0 = time.time()
        os.makedirs(_data(dict_dir), exist_ok=True)
        from ray.data.aggregate import Sum

        cds = ray.data.read_parquet(_data(index_dir), columns=["term", "n", "cf"])
        if cds.count() > 0:
            d = cds.groupby("term").aggregate(
                Sum("n", alias_name="df"), Sum("cf", alias_name="cf")
            )
            d.sort("term").write_parquet(_data(dict_dir))
        timings["dict_sec"] = time.time() - t0
        _commit(dict_dir, {"phase": "dict", "sec": timings["dict_sec"]})

    meta = {
        "n_docs": int(n_docs),
        "total_dl": int(total_dl),
        "avgdl": float(avgdl),
        "k1": K1,
        "b": B,
        "num_buckets": num_buckets,
        "bucket_shift": BUCKET_SHIFT,
        "chunk_size": chunk_size,
        "timings": timings,
        "corpus_path": str(corpus_path),
        "built_at": time.time(),
    }
    with open(os.path.join(out_dir, "meta.json.tmp"), "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(os.path.join(out_dir, "meta.json.tmp"), os.path.join(out_dir, "meta.json"))
    return meta

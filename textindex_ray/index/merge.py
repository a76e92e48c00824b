"""Index merge with docID remapping, and incremental index update.

merge_indexes: sort-merge K independently built indexes into one global
index. Each source's postings are decoded, docIDs are remapped through a
per-source remap table (old internal id -> new internal id under the
merged docmap), and the union is re-sorted/re-encoded — the north-star
"segment-level posting lists are sort-merged into a global index with a
docID remapping table".

Duplicate urls across sources keep the FIRST source's document (the
reference's incremental have_file semantics: already-indexed files are
skipped, /root/reference/src/proc3/threads.rs:292-297); later sources'
postings for dropped docs are filtered out during remap.

update_index: incremental indexing — anti-join the corpus against the
committed docmap urls, build a delta index of only the new documents,
then merge. At testdata scale the committed-url set is broadcast
(ray.put); at 10^12-doc scale the same anti-join runs with a Bloom
filter per worker instead of an exact set (noted inline).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from textindex_ray.index.build import (
    BUCKET_SHIFT,
    _commit,
    _data,
    _empty_chunks,
    _fresh,
    build_dict_distributed,
    build_index,
    K1,
    B,
    make_encode_chunks,
)
from textindex_ray.index.codec import decode_tfs, delta_decode
from textindex_ray.stages.extract import url_bucket


def _read_docmap(index_dir: str) -> pa.Table:
    return pq.read_table(_data(os.path.join(index_dir, "docmap")))


def merge_indexes(index_dirs: list[str], out_dir: str, *, num_buckets: int = 64,
                  chunk_size: int = 1024) -> dict:
    """Merge K indexes into out_dir. Returns the merged meta dict.

    Distributed throughout — the driver never holds a per-url or per-doc
    Python dict:

    1. docmap merge: union of source docmaps (tagged with source rank)
       -> groupby(url) first-source-wins -> bucket by md5(url) ->
       groupby(bucket) assigns ranks and writes each merged docmap part
       atomically inside the group task (the build's pattern).
    2. remap: the group tasks return compact (src, old_id, new_id, dl)
       rows; per-source SORTED numpy remap arrays (old -> new) and one
       dense per-bucket dl array are built from them and broadcast via
       ray.put — posting decode tasks do vectorized searchsorted + array
       gathers, no per-posting Python lookups.
    3. postings: per-source chunk decode -> remap (dropped-duplicate docs
       filtered by membership miss) -> union -> (term, doc_id) sort ->
       re-encode.
    """
    import json
    import time

    os.makedirs(out_dir, exist_ok=True)
    docmap_dir = os.path.join(out_dir, "docmap")
    index_dir = os.path.join(out_dir, "index")
    dict_dir = os.path.join(out_dir, "dict")
    for d in (docmap_dir, index_dir, dict_dir):
        # reset: stale parts from a previous (crashed/different-source)
        # merge into the same out_dir must never mix with this run's
        _fresh(d)

    # ---- merged docmap: first-source-wins per url, re-bucketed ------------
    # compaction: each source's tombstoned docs (delete.py) are dropped
    # here; their postings vanish via the remap membership miss below
    from textindex_ray.index.delete import load_tombstones

    srcs = []
    for si, d in enumerate(index_dirs):
        dm = ray.data.read_parquet(
            _data(os.path.join(d, "docmap")),
            columns=["url", "doc_id", "dl", "n_words", "doctype"],
        )
        tomb_ref = ray.put(load_tombstones(d))

        def tag(batch: pa.Table, si=si, tomb_ref=tomb_ref) -> pa.Table:
            tomb = ray.get(tomb_ref)
            if tomb.size and batch.num_rows:
                ids = batch.column("doc_id").to_numpy().astype(np.uint64)
                pos = np.minimum(np.searchsorted(tomb, ids), tomb.size - 1)
                batch = batch.filter(pa.array(tomb[pos] != ids))
            names = ["old_id" if c == "doc_id" else c for c in batch.column_names]
            return batch.rename_columns(names).append_column(
                "src", pa.array(np.full(batch.num_rows, si, np.int32))
            )

        srcs.append(dm.map_batches(tag, batch_format="pyarrow"))
    alldm = srcs[0]
    for s in srcs[1:]:
        alldm = alldm.union(s)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = url_bucket(batch.column("url").to_pylist(), num_buckets)
        return batch.append_column("bucket", pa.array(b.astype(np.int64)))

    # first-source-wins happens INSIDE the bucket group (md5 bucketing
    # colocates every copy of a url): a groupby(url) would pay Ray's
    # ~0.2 ms-per-group Python cost over the whole corpus
    won = alldm.map_batches(add_bucket, batch_format="pyarrow")

    dmdir = _data(docmap_dir)

    def assign_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = g.take(
            pc.sort_indices(g, [("url", "ascending"), ("src", "ascending")])
        )
        n0 = g.num_rows
        if n0 > 1:
            u = g.column("url").combine_chunks()
            eq = pc.equal(u.slice(1, n0 - 1), u.slice(0, n0 - 1)).to_numpy(
                zero_copy_only=False
            )
            starts = np.concatenate(([0], np.flatnonzero(~eq) + 1))
            g = g.take(pa.array(starts))
        n = g.num_rows
        bucket = int(g.column("bucket")[0].as_py())
        ids = (np.uint64(bucket) << np.uint64(BUCKET_SHIFT)) + np.arange(n, dtype=np.uint64)
        docmap = pa.table(
            {
                "url": g.column("url"),
                "doc_id": pa.array(ids, pa.uint64()),
                "segment_id": pa.array(np.full(n, bucket, dtype=np.uint32), pa.uint32()),
                "local_doc_id": pa.array(np.arange(n, dtype=np.uint64), pa.uint64()),
                "dl": g.column("dl").cast(pa.uint32()),
                "n_words": g.column("n_words").cast(pa.uint32()),
                "doctype": g.column("doctype"),
            }
        )
        tmp = os.path.join(dmdir, "docmap-%05d.parquet.tmp" % bucket)
        pq.write_table(docmap, tmp)
        os.replace(tmp, os.path.join(dmdir, "docmap-%05d.parquet" % bucket))
        return pa.table(
            {
                "src": g.column("src"),
                "old_id": g.column("old_id").cast(pa.uint64()),
                "new_id": pa.array(ids, pa.uint64()),
                "dl": g.column("dl").cast(pa.uint32()),
            }
        )

    # compact remap relation: 4 fixed-width columns, no urls/doctypes
    remap_df = (
        won.groupby("bucket")
        .map_groups(assign_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    _commit(docmap_dir, {"phase": "merge-docmap", "sources": index_dirs})

    n_docs = len(remap_df)
    total_dl = int(remap_df["dl"].sum()) if n_docs else 0
    avgdl = total_dl / n_docs if n_docs else 0.0

    # per-source sorted remap arrays (winners only; a source's dropped
    # duplicates simply miss the membership probe)
    remaps = []
    src_arr = remap_df["src"].to_numpy()
    old_arr = remap_df["old_id"].to_numpy().astype(np.uint64)
    new_arr = remap_df["new_id"].to_numpy().astype(np.int64)
    for si in range(len(index_dirs)):
        m = src_arr == si
        old, new = old_arr[m], new_arr[m]
        order = np.argsort(old)
        remaps.append((old[order], new[order]))

    # dense per-bucket dl lookup (the reader's layout): position =
    # bucket_offset[bucket] + local rank
    shift = np.uint64(BUCKET_SHIFT)
    mask = np.uint64((1 << BUCKET_SHIFT) - 1)
    nid = remap_df["new_id"].to_numpy().astype(np.uint64)
    dl_all = remap_df["dl"].to_numpy().astype(np.uint32)
    bkt = (nid >> shift).astype(np.int64)
    nb = int(bkt.max()) + 1 if n_docs else 1
    counts = np.bincount(bkt, minlength=nb)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    dense_dl = np.zeros(n_docs, dtype=np.uint32)
    if n_docs:
        dense_dl[offs[bkt] + (nid & mask).astype(np.int64)] = dl_all
    dl_ref = ray.put((dense_dl, offs))

    # ---- postings: decode + remap per source, union, re-sort, re-encode ---
    def make_decode_remap(old_ids: np.ndarray, new_ids: np.ndarray):
        def fn(batch: pa.Table) -> pa.Table:
            dense, offsets = ray.get(dl_ref)
            terms_out, ids_out, tfs_out = [], [], []
            for term, docs_b, tfs_b in zip(
                batch.column("term").to_pylist(),
                batch.column("docs").to_pylist(),
                batch.column("tfs").to_pylist(),
            ):
                ids = delta_decode(docs_b)
                tfs = decode_tfs(tfs_b)
                pos = np.searchsorted(old_ids, ids)
                pos = np.minimum(pos, max(old_ids.size - 1, 0))
                keep = old_ids.size > 0
                keep = (old_ids[pos] == ids) if keep else np.zeros(ids.size, bool)
                if keep.any():
                    terms_out.extend([term] * int(keep.sum()))
                    ids_out.append(new_ids[pos[keep]].astype(np.uint64))
                    tfs_out.append(tfs[keep])
            if not ids_out:
                return pa.table(
                    {"term": pa.array([], pa.string()),
                     "doc_id": pa.array([], pa.uint64()),
                     "tf": pa.array([], pa.uint32()),
                     "dl": pa.array([], pa.uint32())}
                )
            ids_all = np.concatenate(ids_out)
            b = (ids_all >> shift).astype(np.int64)
            dls = dense[offsets[b] + (ids_all & mask).astype(np.int64)]
            return pa.table(
                {
                    "term": pa.array(terms_out, pa.string()),
                    "doc_id": pa.array(ids_all, pa.uint64()),
                    "tf": pa.array(np.concatenate(tfs_out).astype(np.uint32), pa.uint32()),
                    "dl": pa.array(dls, pa.uint32()),
                }
            )

        return fn

    parts = []
    for (old, new), d in zip(remaps, index_dirs):
        src = ray.data.read_parquet(
            _data(os.path.join(d, "index")), columns=["term", "docs", "tfs"]
        )
        parts.append(src.map_batches(make_decode_remap(old, new), batch_format="pyarrow"))
    postings = parts[0]
    for p in parts[1:]:
        postings = postings.union(p)

    chunks = postings.sort(["term", "doc_id"]).map_batches(
        make_encode_chunks(chunk_size), batch_format="pyarrow"
    )
    chunks.write_parquet(_data(index_dir))
    _commit(index_dir, {"phase": "merge-index", "sources": index_dirs})

    cds = ray.data.read_parquet(_data(index_dir), columns=["term", "n", "cf"])
    if cds.count() > 0:
        build_dict_distributed(_data(index_dir), _data(dict_dir))
    else:
        pq.write_table(
            pa.table({"term": pa.array([], pa.string()),
                      "df": pa.array([], pa.uint64()),
                      "cf": pa.array([], pa.uint64())}),
            os.path.join(_data(dict_dir), "empty.parquet"),
        )
    _commit(dict_dir, {"phase": "merge-dict"})

    meta = {
        "n_docs": n_docs, "total_dl": int(total_dl), "avgdl": float(avgdl),
        "k1": K1, "b": B, "num_buckets": num_buckets,
        "bucket_shift": BUCKET_SHIFT, "chunk_size": chunk_size,
        "merged_from": list(index_dirs), "built_at": time.time(), "timings": {},
    }
    with open(os.path.join(out_dir, "meta.json.tmp"), "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(os.path.join(out_dir, "meta.json.tmp"), os.path.join(out_dir, "meta.json"))
    return meta


def update_index(corpus_path, index_dir: str, *, work_dir: str | None = None,
                 num_buckets: int = 64, chunk_size: int = 1024,
                 membership: str = "auto", exact_limit: int = 1_000_000,
                 fp_rate: float = 0.01, num_partitions: int = 4) -> dict:
    """Incremental indexing: index only not-yet-committed urls, then merge.

    membership picks how the committed-url anti-join runs:
      - "exact": broadcast exact set (small committed sets)
      - "bloom": broadcast Bloom bitmap prefilter (~10 bits/url at 1% FP);
        "definitely new" rows pass immediately, "maybe committed" rows
        (committed urls + FP-rate of the new ones) are resolved EXACTLY
        with a partitioned left_anti join — same result, only the
        maybe-set shuffles
      - "auto": exact when meta n_docs <= exact_limit, else bloom
    Returns the merged meta; the merged index replaces index_dir
    atomically (build aside + read-checked swap).
    """
    import json

    work_dir = work_dir or (index_dir.rstrip("/") + ".work")
    delta_dir = os.path.join(work_dir, "delta")
    merged_dir = os.path.join(work_dir, "merged")
    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(delta_dir, exist_ok=True)

    with open(os.path.join(index_dir, "meta.json")) as f:
        n_committed = int(json.load(f).get("n_docs", 0))
    if membership == "auto":
        membership = "exact" if n_committed <= exact_limit else "bloom"

    ds = ray.data.read_parquet(corpus_path, columns=["url", "html"])

    # committed = LIVE urls only: a deleted (tombstoned) url re-appearing
    # in the corpus is re-indexed (delete.py contract)
    from textindex_ray.index.delete import load_tombstones

    tomb = load_tombstones(index_dir)

    def _drop_tombstoned(batch: pa.Table) -> pa.Table:
        if tomb.size and batch.num_rows:
            ids = batch.column("doc_id").to_numpy().astype(np.uint64)
            pos = np.minimum(np.searchsorted(tomb, ids), tomb.size - 1)
            batch = batch.filter(pa.array(tomb[pos] != ids))
        return batch.select(["url"])

    if membership == "exact":
        dm = _read_docmap(index_dir).select(["url", "doc_id"])
        committed = set(_drop_tombstoned(dm).column("url").to_pylist())
        ref = ray.put(committed)

        def anti_join(batch: pa.Table) -> pa.Table:
            done = ray.get(ref)
            mask = pa.array([u not in done for u in batch.column("url").to_pylist()])
            return batch.filter(mask)

        new_corpus = ds.map_batches(anti_join, batch_format="pyarrow")
    else:
        from textindex_ray.index.bloom import UrlBloom

        # materialize: cds is consumed twice (bloom build stream + the
        # left_anti join) — without this the read + tombstone filter
        # lineage re-executes per consumer
        cds = ray.data.read_parquet(
            _data(os.path.join(index_dir, "docmap")), columns=["url", "doc_id"]
        ).map_batches(_drop_tombstoned, batch_format="pyarrow").materialize()
        bloom = UrlBloom.sized_for(n_committed, fp_rate)

        def partial_bloom(batch: pa.Table) -> pa.Table:
            b = UrlBloom(bloom.m, bloom.k)
            b.add_batch(batch.column("url").to_pylist())
            return pa.table({"words": pa.array([b.words.tobytes()], pa.large_binary())})

        # per-block partial bitmaps, OR-reduced streaming on the driver
        # (one m-bit bitmap resident at a time)
        for bt in cds.map_batches(
            partial_bloom, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for wb in bt.column("words"):
                bloom.words |= np.frombuffer(wb.as_py(), dtype=np.uint64)
        bloom_ref = ray.put((bloom.m, bloom.k, bloom.words))

        def flag(batch: pa.Table) -> pa.Table:
            m, kk, words = ray.get(bloom_ref)
            bl = UrlBloom(m, kk, words)
            maybe = bl.contains_batch(batch.column("url").to_pylist())
            return batch.append_column("maybe", pa.array(maybe))

        import pyarrow.compute as pc

        flagged = ds.map_batches(flag, batch_format="pyarrow").materialize()

        def take_new(batch: pa.Table) -> pa.Table:
            mask = pc.invert(batch.column("maybe").combine_chunks())
            return batch.filter(mask).drop_columns(["maybe"])

        def take_maybe(batch: pa.Table) -> pa.Table:
            return batch.filter(
                batch.column("maybe").combine_chunks()
            ).drop_columns(["maybe"])

        definitely_new = flagged.map_batches(take_new, batch_format="pyarrow")
        # the maybe side can be EMPTY (all-new corpus, zero Bloom false
        # positives); an empty dataset loses its schema through
        # Dataset.join, so materialize and branch on the count — the
        # pattern documented for dedup.minhash_lsh_pairs
        maybe = flagged.map_batches(take_maybe, batch_format="pyarrow").materialize()
        if maybe.count() == 0:
            new_corpus = definitely_new
        else:
            survivors = maybe.join(
                cds, join_type="left_anti", num_partitions=num_partitions,
                on=("url",),
            )
            new_corpus = definitely_new.union(survivors)
    staged = os.path.join(work_dir, "corpus-delta")
    os.makedirs(staged, exist_ok=True)
    new_corpus.write_parquet(staged)
    # ensure readable even when zero new rows
    if not any(f.endswith(".parquet") for f in os.listdir(staged)):
        pq.write_table(
            pa.table({"url": pa.array([], pa.string()),
                      "html": pa.array([], pa.binary())}),
            os.path.join(staged, "empty.parquet"),
        )

    build_index(staged, delta_dir, num_buckets=num_buckets, chunk_size=chunk_size)
    meta = merge_indexes([index_dir, delta_dir], merged_dir,
                         num_buckets=num_buckets, chunk_size=chunk_size)

    # Crash-safe swap: the merged index must pass a read check BEFORE the
    # old index is touched, and the .bak copy survives until the swapped-in
    # index passes a read check too — a failure at any point leaves either
    # the old index in place or a recoverable .bak next to it.
    from textindex_ray.query.engine import IndexReader

    IndexReader(merged_dir)  # pre-swap read check (raises on a bad merge)
    bak = index_dir.rstrip("/") + ".bak"
    shutil.rmtree(bak, ignore_errors=True)
    os.replace(index_dir, bak)
    os.replace(merged_dir, index_dir)
    try:
        IndexReader(index_dir)  # post-swap read check
    except Exception:
        # roll back: restore the old index from .bak
        os.replace(index_dir, merged_dir)
        os.replace(bak, index_dir)
        raise
    shutil.rmtree(bak, ignore_errors=True)
    shutil.rmtree(work_dir, ignore_errors=True)
    return meta

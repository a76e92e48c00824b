"""Distributed index build: corpus Parquet -> inverted index segments.

Ray-Data-first physical plan (SURVEY.md §3.1 / §7):

    Phase T  tokenize   read_parquet(corpus, columns=url/html)
                        -> map_batches(ExtractTokenize, actor pool; the
                           classifier is fused into the actor)
                        -> write_parquet(out/tokenized)   [optional checkpoint]
    Phase P  postings   (tokenized | fused extract)
                        -> groupby(bucket).map_groups(assign+explode)
                           (deterministic docIDs; docmap parts written
                            atomically inside the group task)
                        -> sort(term, doc_id)              [the wide step]
                        -> map_batches(encode_chunks)      [delta+varint]
                        -> write_parquet(out/index)
    Phase S  stats      docmap dl -> N/avgdl (driver-side below 256MB,
                        distributed aggregate above)
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
``metrics.jsonl`` lineage record; a rerun skips committed phases.
Incremental indexing (the reference's have_file dedup,
threads.rs:292-297, made distributed) lives in merge.update_index.
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
from textindex_ray.stages.extract import ExtractTokenize

K1 = 1.2
B = 0.75
BUCKET_SHIFT = 36  # doc_id = (bucket << 36) | local rank

def _data(d: str) -> str:
    """Parquet files live under <phase>/data; markers/metrics at <phase>/."""
    return os.path.join(d, "data")


def _committed(d: str) -> bool:
    return os.path.exists(os.path.join(d, "_COMMITTED"))


def _fresh(d: str) -> None:
    """Reset an uncommitted phase dir: stale partial output from an
    interrupted run must not mix with the rerun's files."""
    import shutil

    shutil.rmtree(_data(d), ignore_errors=True)
    os.makedirs(_data(d), exist_ok=True)


def _commit(d: str, metrics: dict, params: dict | None = None) -> None:
    from textindex_ray import diagnostics

    snap = diagnostics.snapshot()
    if snap:
        metrics = {**metrics, "alloc": snap}
    with open(os.path.join(d, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(metrics) + "\n")
    with open(os.path.join(d, "_COMMITTED.tmp"), "w") as f:
        f.write(json.dumps({"ts": time.time(), "params": params or {}}))
    os.replace(os.path.join(d, "_COMMITTED.tmp"), os.path.join(d, "_COMMITTED"))


def _check_params(d: str, params: dict) -> None:
    """A committed phase must have been built with the same parameters —
    resuming a num_buckets=8 staging under num_buckets=64 would silently
    break the docID contract."""
    try:
        with open(os.path.join(d, "_COMMITTED")) as f:
            stored = json.load(f).get("params") or {}
    except (OSError, json.JSONDecodeError):
        return
    for k, v in params.items():
        if k in stored and stored[k] != v:
            raise ValueError(
                "resume mismatch in %s: committed with %s=%r, rerun wants %r "
                "(use a fresh out_dir or resume=False)" % (d, k, stored[k], v)
            )


def make_assign_and_explode(docmap_dir: str):
    """Per-bucket group fn: assign deterministic docIDs, persist the
    docmap part atomically, and explode (term, doc_id, tf, dl) postings."""

    def assign_and_explode(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column("url"))
        group = group.take(order)
        # duplicate urls (re-crawls): keep one row per url, chosen by a
        # content digest so the winner is deterministic regardless of
        # block arrival order (reference have_file keeps first-seen in
        # walk order, threads.rs:292-297; a distributed build has no
        # walk order, so content-digest-min is the canonical choice)
        url_col = group.column("url").combine_chunks()
        if pc.count_distinct(url_col).as_py() != group.num_rows:
            import hashlib

            urls_np = url_col.to_pylist()
            best: dict[str, tuple[str, int]] = {}
            terms_l = group.column("terms").to_pylist()
            tfs_l = group.column("tfs").to_pylist()
            for i, u in enumerate(urls_np):
                dig = hashlib.md5(
                    repr((terms_l[i], tfs_l[i])).encode()
                ).hexdigest()
                if u not in best or dig < best[u][0]:
                    best[u] = (dig, i)
            keep = sorted(i for _, i in best.values())
            group = group.take(pa.array(keep, pa.int64()))
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


def make_assign_and_build(docmap_dir: str, chunk_size: int):
    """Per-bucket group fn: assign docIDs, persist the docmap part, and
    build the bucket's posting chunks in-task (no global postings sort).

    Buckets own disjoint docID ranges (doc_id = bucket << 36 | rank), so
    per-term chunk rows from different buckets cover disjoint, ordered
    doc ranges — exactly the chunked index format. The only all-to-all
    in the build is therefore the doc-level groupby(bucket); heavy terms
    are spread evenly across buckets by construction (md5 bucketing), so
    term skew cannot concentrate in one task.
    """
    explode = make_assign_and_explode(docmap_dir)
    encode = make_encode_chunks(chunk_size)

    def assign_and_build(group: pa.Table) -> pa.Table:
        postings = explode(group)
        if postings.num_rows == 0:
            return _empty_chunks()
        order = pc.sort_indices(
            postings, [("term", "ascending"), ("doc_id", "ascending")]
        )
        return encode(postings.take(order))

    return assign_and_build


def make_encode_chunks(chunk_size: int):
    """Encode a (term, doc_id, tf, dl)-sorted batch into posting chunks.

    A term whose postings span multiple sorted blocks yields multiple
    chunk rows (doc ranges disjoint and ordered) — that is the index
    format, so range-partition skew needs no special casing.

    Chunks store (max_tf, min_dl): the block-max WAND bound
    idf * max_tf*(k1+1)/(max_tf + k1*(1-b+b*min_dl/avgdl)) is computed at
    query time (impact is increasing in tf and decreasing in dl, so the
    pair gives a valid upper bound) — encoding therefore needs no corpus
    stats and the whole build is a single fused pipeline.
    """

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
        dls = batch.column("dl").to_numpy().astype(np.uint64)

        bounds = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(codes)]))

        o_term, o_first, o_last, o_n, o_maxtf, o_mindl, o_cf, o_docs, o_tfb = (
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
                o_mindl.append(int(dls[cs:ce].min()))
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
                "min_dl": pa.array(o_mindl, pa.uint32()),
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
            "min_dl": pa.array([], pa.uint32()),
            "cf": pa.array([], pa.uint64()),
            "docs": pa.array([], pa.large_binary()),
            "tfs": pa.array([], pa.large_binary()),
        }
    )


SALT_SHIFT = 14  # heavy-term salting: doc-range groups of 2^14 local ids


def build_postings_hash(postings, chunk_size: int, *, heavy_df: int = 100_000):
    """Posting-list construction via explicit term-hash groupby-aggregate
    with heavy-hitter skew splitting (the north-star mechanism; the
    default build uses the range-sort path, which handles skew natively —
    both produce the same postings).

    1. df estimation: per-batch partial term counts (pre-aggregation,
       one row per term per block) -> small groupby(term).sum -> the
       heavy set (df > heavy_df) is collected on the driver (few terms
       by construction) and broadcast via ray.put.
    2. salting: a heavy term's shuffle key becomes
       ``term \x00 hex(doc_id >> SALT_SHIFT)`` — doc-RANGE salts, so each
       salted group holds a contiguous, disjoint docID range and its
       encoded chunks are globally ordered without a re-merge.
    3. coarse-partition groupby: sort by (term, doc_id) inside the
       partition, delta+varint encode (many skey groups per Ray group —
       per-group Python cost stays O(partitions)).
    """
    # the df-estimation pass and the encode pass both consume `postings`;
    # materialize once so the expensive extract+groupby lineage does not
    # re-execute for the second pass
    postings = postings.materialize()

    import zlib

    P = 64  # coarse partition count for the term-keyed steps

    def partial_counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("term").combine_chunks())
        terms = vc.field("values")
        part = pa.array(
            [zlib.crc32(t.encode("utf-8")) % P for t in terms.to_pylist()],
            pa.int32(),
        )
        return pa.table(
            {"term": terms, "c": vc.field("counts").cast(pa.int64()),
             "part": part}
        )

    def part_df_sum(g: pa.Table) -> pa.Table:
        t = g.group_by("term").aggregate([("c", "sum")])
        return pa.table(
            {"term": t.column("term"), "df": t.column("c_sum").cast(pa.int64())}
        )

    def only_heavy(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b.column("df").to_numpy() > heavy_df))

    # partition-bucketed df estimate (a groupby(term) would pay the
    # per-group Python cost over the whole vocabulary); only the heavy
    # rows — few by construction — reach the driver
    heavy_rows = (
        postings.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_df_sum, batch_format="pyarrow")
        .map_batches(only_heavy, batch_format="pyarrow")
        .take_all()
    )
    heavy = {r["term"] for r in heavy_rows}
    heavy_ref = ray.put(heavy)

    def add_skey(batch: pa.Table) -> pa.Table:
        hv = ray.get(heavy_ref)
        terms = batch.column("term").to_pylist()
        if hv:
            ids = batch.column("doc_id").to_numpy()
            skeys = [
                t if t not in hv else "%s\x00%012x" % (t, int(i) >> SALT_SHIFT)
                for t, i in zip(terms, ids)
            ]
        else:
            skeys = terms
        part = pa.array(
            [zlib.crc32(k.encode("utf-8")) % P for k in skeys], pa.int32()
        )
        return batch.append_column(
            "skey", pa.array(skeys, pa.string())
        ).append_column("part", part)

    encode = make_encode_chunks(chunk_size)

    def encode_group(group: pa.Table) -> pa.Table:
        # one coarse partition = many skey groups; each skey RUN encodes
        # separately (a chunk must never span a salt-range gap — two salt
        # ranges of a term in one partition with the middle range
        # elsewhere would otherwise produce overlapping chunk doc-ranges,
        # breaking the reader's sorted-disjoint-chunks contract). The
        # per-run Python cost is microseconds vs Ray's ~0.2 ms per group.
        order = pc.sort_indices(
            group, [("skey", "ascending"), ("doc_id", "ascending")]
        )
        t = group.take(order)
        n = t.num_rows
        if n == 0:
            return _empty_chunks()
        sk = t.column("skey").combine_chunks()
        t = t.drop_columns(["skey", "part"])
        eq = pc.equal(sk.slice(1, n - 1), sk.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(~eq) + 1, [n]))
        parts = [
            encode(t.slice(st, en - st))
            for st, en in zip(starts[:-1], starts[1:])
        ]
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]

    return (
        postings.map_batches(add_skey, batch_format="pyarrow")
        .groupby("part")
        .map_groups(encode_group, batch_format="pyarrow")
    )


def build_dict_distributed(
    index_data_dir: str, dict_data_dir: str, *, num_partitions: int = 64
) -> None:
    """Distributed dictionary aggregate, partition-bucketed: per-block
    Arrow partial combine -> coarse crc32(term) partition -> per-partition
    Arrow sum -> global range sort by term -> write. Ray-level group keys
    stay coarse (a groupby("term") pays ~0.2 ms of Python per group —
    hours at 10^8 terms); the final sort is a sample-based range shuffle
    with no per-group cost."""
    import zlib

    P = int(num_partitions)

    def part_combine(b: pa.Table) -> pa.Table:
        g = b.group_by("term").aggregate([("n", "sum"), ("cf", "sum")])
        part = pa.array(
            [zlib.crc32(t.encode("utf-8")) % P for t in g.column("term").to_pylist()],
            pa.int32(),
        )
        return pa.table(
            {"term": g.column("term"), "n": g.column("n_sum"),
             "cf": g.column("cf_sum"), "part": part}
        )

    def part_sum(g: pa.Table) -> pa.Table:
        t = g.group_by("term").aggregate([("n", "sum"), ("cf", "sum")])
        return pa.table(
            {"term": t.column("term"),
             "df": t.column("n_sum").cast(pa.uint64()),
             "cf": t.column("cf_sum").cast(pa.uint64())}
        )

    (
        ray.data.read_parquet(index_data_dir, columns=["term", "n", "cf"])
        .map_batches(part_combine, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_sum, batch_format="pyarrow")
        .sort("term")
        .write_parquet(dict_data_dir)
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


def default_concurrency() -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    # the streaming executor keeps read/write stages light; nearly every
    # CPU can host an extract actor (measured: cpus-2 beats cpus*3/4 by
    # ~1.45x at 32 CPUs)
    return max(2, cpus - 2)


def read_corpus(corpus_path, input_format: str = "parquet") -> "ray.data.Dataset":
    """Corpus path -> (url:string, html:binary) Dataset for any ingest
    format: "parquet" (column-pruned read), "files" (directory walk,
    sources/files.py), "jsonl" (NDJSON dumps, sources/jsonl.py), or
    "warc" (Common-Crawl archives, sources/warc.py). Shared by
    build_index and merge.update_index so every lifecycle entry point
    accepts every source."""
    if input_format == "files":
        from textindex_ray.sources.files import read_file_corpus

        return read_file_corpus(corpus_path)
    if input_format == "jsonl":
        from textindex_ray.sources.jsonl import read_jsonl_corpus

        return read_jsonl_corpus(corpus_path)
    if input_format == "warc":
        from textindex_ray.sources.warc import read_warc_corpus

        return read_warc_corpus(corpus_path)
    if input_format != "parquet":
        raise ValueError("unknown input_format: %r" % (input_format,))
    return ray.data.read_parquet(corpus_path, columns=["url", "html"])


def _build_postings_shuffled(tok, docmap_dir, index_dir, shuffle, chunk_size,
                             heavy_df, timings, t0):
    """Shuffled postings construction (non-partitioned staging or
    checkpoint=False): one bucket groupby, then in-task build
    ("bucket"), a global (term, doc_id) range sort ("sort"), or the
    salted term-hash groupby ("hash")."""
    if shuffle == "bucket":
        chunks = tok.groupby("bucket").map_groups(
            make_assign_and_build(_data(docmap_dir), chunk_size),
            batch_format="pyarrow",
        )
    else:
        postings = tok.groupby("bucket").map_groups(
            make_assign_and_explode(_data(docmap_dir)), batch_format="pyarrow"
        )
        if shuffle == "hash":
            chunks = build_postings_hash(postings, chunk_size, heavy_df=heavy_df)
        else:
            chunks = postings.sort(["term", "doc_id"]).map_batches(
                make_encode_chunks(chunk_size), batch_format="pyarrow"
            )
    chunks.write_parquet(_data(index_dir))
    timings["postings_sec"] = time.time() - t0
    _commit(docmap_dir, {"phase": "docmap", "sec": timings["postings_sec"]})
    _commit(index_dir, {"phase": "index", "sec": timings["postings_sec"]})


def build_index(
    corpus_path,
    out_dir: str,
    *,
    num_buckets: int = 64,
    chunk_size: int = 1024,
    batch_size: int = 1024,
    concurrency=None,
    keep_text: bool = False,
    checkpoint: bool = True,
    resume: bool = True,
    shuffle: str = "bucket",
    heavy_df: int = 100_000,
    input_format: str = "parquet",
) -> dict:
    """Run the full build. Returns the meta dict (N, avgdl, timings).

    checkpoint=True (default) writes the tokenized staging table and is
    the resume boundary (re-runs skip extraction); checkpoint=False fuses
    extract straight into the postings shuffle (single streaming
    pipeline, index-granular resume only).

    input_format: "parquet" (the corpus table), "files" (a loose-file
    directory tree, the reference's walk source — read_binary_files with
    the O1 name filter applied at the read, sources/files.py), or
    "jsonl" (NDJSON document dumps, the webtext interchange format —
    sources/jsonl.py auto-detects the payload field), or "warc"
    (Common-Crawl WARC/WET archives, one file per read task —
    sources/warc.py).
    """
    import pyarrow.dataset as pads

    os.makedirs(out_dir, exist_ok=True)
    tok_dir = os.path.join(out_dir, "tokenized")
    docmap_dir = os.path.join(out_dir, "docmap")
    index_dir = os.path.join(out_dir, "index")
    dict_dir = os.path.join(out_dir, "dict")
    timings = {}

    params = {"num_buckets": num_buckets, "chunk_size": chunk_size}
    have_tok = resume and checkpoint and _committed(tok_dir)
    have_idx = resume and _committed(index_dir)
    if have_tok:
        _check_params(tok_dir, {"num_buckets": num_buckets})
    if have_idx:
        _check_params(index_dir, params)

    if not (have_tok or have_idx):
        if input_format == "files":
            if not any(files for _, _, files in os.walk(corpus_path)):
                return _write_empty_index(out_dir, num_buckets, chunk_size)
        elif input_format == "jsonl":
            from textindex_ray.sources.jsonl import jsonl_has_rows

            if not jsonl_has_rows(corpus_path):
                return _write_empty_index(out_dir, num_buckets, chunk_size)
        elif input_format == "warc":
            from textindex_ray.sources.warc import warc_has_records

            if not warc_has_records(corpus_path):
                return _write_empty_index(out_dir, num_buckets, chunk_size)
        # metadata-only row count (no Ray job)
        elif pads.dataset(corpus_path).count_rows() == 0:
            return _write_empty_index(out_dir, num_buckets, chunk_size)

    if concurrency is None:
        concurrency = default_concurrency()

    def extract_pipeline():
        ds = read_corpus(corpus_path, input_format)
        # classification is fused into the actor (ExtractTokenize
        # classifies when no doctype column is present)
        return ds.map_batches(
            ExtractTokenize,
            fn_constructor_kwargs={"num_buckets": num_buckets, "keep_text": keep_text},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    # ---- Phase T: tokenize checkpoint (optional) --------------------------
    if checkpoint and not have_tok and not have_idx:
        t0 = time.time()
        _fresh(tok_dir)
        # hive-partitioned by bucket: the map-side scatter IS the shuffle;
        # the postings phase then reads each bucket dir independently
        extract_pipeline().write_parquet(
            _data(tok_dir), partition_cols=["bucket"], min_rows_per_file=50_000
        )
        timings["tokenize_sec"] = time.time() - t0
        _commit(tok_dir, {"phase": "tokenize", "sec": timings["tokenize_sec"]},
                {"num_buckets": num_buckets})

    # ---- Phase P: docIDs + postings (the wide step) -----------------------
    if not have_idx:
        t0 = time.time()
        _fresh(docmap_dir)
        _fresh(index_dir)
        bucket_dirs = (
            sorted(d for d in os.listdir(_data(tok_dir)) if d.startswith("bucket="))
            if checkpoint and os.path.isdir(_data(tok_dir))
            else []
        )
        if checkpoint and not bucket_dirs and not any(
            f.endswith(".parquet") for f in os.listdir(_data(tok_dir))
        ):
            # rows existed but every document classified 'ignore'
            return _write_empty_index(out_dir, num_buckets, chunk_size)
        if checkpoint and shuffle == "bucket" and bucket_dirs:
            # the staging write already scattered docs by bucket: build each
            # bucket's mini-index from its own partition dir — zero Ray
            # shuffle in this phase (embarrassingly parallel over buckets)
            bds = ray.data.from_items(
                [{"bucket_dir": os.path.join(_data(tok_dir), d),
                  "bucket": int(d.split("=")[1])} for d in bucket_dirs]
            )
            build_one = make_assign_and_build(_data(docmap_dir), chunk_size)

            def build_bucket(batch: pa.Table) -> pa.Table:
                outs = []
                for bdir, bucket in zip(
                    batch.column("bucket_dir").to_pylist(),
                    batch.column("bucket").to_pylist(),
                ):
                    g = pq.read_table(
                        bdir,
                        columns=["url", "doctype", "dl", "n_words", "terms", "tfs"],
                    )
                    g = g.append_column(
                        "bucket", pa.array(np.full(g.num_rows, bucket, np.int64))
                    )
                    outs.append(build_one(g))
                return pa.concat_tables(outs) if outs else _empty_chunks()

            chunks = bds.map_batches(
                build_bucket, batch_format="pyarrow", batch_size=1
            )
            chunks.write_parquet(_data(index_dir))
            timings["postings_sec"] = time.time() - t0
            _commit(docmap_dir, {"phase": "docmap", "sec": timings["postings_sec"]}, params)
            _commit(index_dir, {"phase": "index", "sec": timings["postings_sec"]}, params)
        else:
            _build_postings_shuffled(
                extract_pipeline() if not checkpoint else ray.data.read_parquet(
                    _data(tok_dir),
                    columns=["url", "bucket", "doctype", "dl", "n_words", "terms", "tfs"],
                ),
                docmap_dir, index_dir, shuffle, chunk_size, heavy_df, timings, t0,
            )


    # ---- Phase S: corpus stats (from the docmap; driver-side when small) --
    t0 = time.time()
    dm_files = [
        os.path.join(_data(docmap_dir), f)
        for f in os.listdir(_data(docmap_dir))
        if f.endswith(".parquet")
    ]
    dm_bytes = sum(os.path.getsize(f) for f in dm_files)
    if dm_bytes < 256 * 1024 * 1024:
        dl_col = pq.read_table(_data(docmap_dir), columns=["dl"]).column("dl")
        n_docs = len(dl_col)
        total_dl = int(pc.sum(dl_col).as_py() or 0)
    else:  # scale path: distributed aggregate
        sds = ray.data.read_parquet(_data(docmap_dir), columns=["dl"])
        n_docs = sds.count()
        total_dl = int(sds.sum("dl")) if n_docs else 0
    avgdl = (total_dl / n_docs) if n_docs else 0.0
    timings["stats_sec"] = time.time() - t0

    # ---- Phase D: dictionary ---------------------------------------------
    if not (resume and _committed(dict_dir)):
        t0 = time.time()
        _fresh(dict_dir)
        idx_files = [
            os.path.join(_data(index_dir), f)
            for f in os.listdir(_data(index_dir))
            if f.endswith(".parquet")
        ]
        idx_bytes = sum(os.path.getsize(f) for f in idx_files)
        driver_limit = int(
            os.environ.get("GRAFT_DICT_DRIVER_LIMIT", 512 * 1024 * 1024)
        )
        if idx_bytes < driver_limit:
            # the chunk metadata table is tiny relative to the corpus: a
            # driver-side arrow group_by beats a Ray job's fixed costs
            ct = pq.read_table(_data(index_dir), columns=["term", "n", "cf"])
            if ct.num_rows:
                g = ct.group_by("term").aggregate([("n", "sum"), ("cf", "sum")])
                d = pa.table({"term": g.column("term"),
                              "df": g.column("n_sum").cast(pa.uint64()),
                              "cf": g.column("cf_sum").cast(pa.uint64())})
                d = d.take(pc.sort_indices(d.column("term")))
            else:
                d = pa.table({"term": pa.array([], pa.string()),
                              "df": pa.array([], pa.uint64()),
                              "cf": pa.array([], pa.uint64())})
            pq.write_table(d, os.path.join(_data(dict_dir), "dict.parquet"))
        else:  # scale path: distributed, partition-bucketed aggregate
            build_dict_distributed(_data(index_dir), _data(dict_dir))
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

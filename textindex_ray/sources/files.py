"""Loose-file directory source (S1's walk-the-tree alternative).

The reference's primary source is a recursive directory walk with the
name filter applied per file (walk_proc,
/root/reference/src/proc3/threads.rs:203-315 + proc3.rs:203-299). For a
filesystem corpus this engine uses ``ray.data.read_binary_files`` (the
datasource does the listing/sharding) and applies the same O1 name
filter vectorized per batch; urls are the paths relative to the corpus
root, matching the reference's relative-path document identity.

Output schema: (url:string, html:binary) — directly consumable by
``build_index(..., input_format="files")`` and identical downstream to
the Parquet corpus path.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data

from textindex_ray.kernel.name_filter import name_filter


def read_file_corpus(root: str) -> "ray.data.Dataset":
    root = os.path.abspath(root)
    ds = ray.data.read_binary_files(root, include_paths=True)

    def adapt(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        rels = [os.path.relpath(p, root) for p in paths]
        keep = pa.array([name_filter(r) == "inspect" for r in rels])
        data = batch.column("bytes").filter(keep)
        urls = [r for r, k in zip(rels, keep.to_pylist()) if k]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": data.cast(pa.binary()) if data.type != pa.binary() else data,
            }
        )

    return ds.map_batches(adapt, batch_format="pyarrow")

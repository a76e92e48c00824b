"""Loose-file directory source (S1's walk-the-tree alternative).

The reference's primary source is a recursive directory walk with the
name filter applied per file BEFORE the file is opened (walk_proc,
/root/reference/src/proc3/threads.rs:203-315 + proc3.rs:203-299). This
engine mirrors that ordering: the tree is listed (names only — the same
driver-side metadata walk ``read_binary_files`` would do internally),
the O1 name filter drops blacklisted paths, and only the surviving
files are handed to ``ray.data.read_binary_files`` — a jpg/media
payload is never read just to be discarded. Urls are the paths relative
to the corpus root, matching the reference's relative-path document
identity.

Output schema: (url:string, html:binary) — directly consumable by
``build_index(..., input_format="files")`` and identical downstream to
the Parquet corpus path.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data

from textindex_ray.kernel.name_filter import name_filter


def list_file_corpus(root: str) -> list[str]:
    """Deterministic (sorted) recursive listing of inspectable files —
    the name filter runs on the RELATIVE path before any file is
    opened."""
    root = os.path.abspath(root)
    keep: list[str] = []
    for dirpath, dirs, files in os.walk(root):
        dirs.sort()
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            if name_filter(os.path.relpath(p, root)) == "inspect":
                keep.append(p)
    return keep


def read_file_corpus(root: str) -> "ray.data.Dataset":
    root = os.path.abspath(root)
    paths = list_file_corpus(root)
    if not paths:
        return ray.data.from_arrow(
            pa.table({"url": pa.array([], pa.string()),
                      "html": pa.array([], pa.binary())})
        )
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def adapt(batch: pa.Table) -> pa.Table:
        rels = [os.path.relpath(p, root) for p in batch.column("path").to_pylist()]
        data = batch.column("bytes")
        if isinstance(data, pa.ChunkedArray):
            data = data.combine_chunks()
        return pa.table(
            {
                "url": pa.array(rels, pa.string()),
                "html": data.cast(pa.binary()) if data.type != pa.binary() else data,
            }
        )

    return ds.map_batches(adapt, batch_format="pyarrow")

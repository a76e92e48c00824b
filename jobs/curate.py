"""`ray job submit` entry point: curated training-data export.

Usage (cluster):
    ray job submit --working-dir . -- python jobs/curate.py \
        --docs /data/documents.parquet --out /data/curated \
        [--langs en] [--min-tokens 24] [--min-stop-ppm 10000] \
        [--max-punct-ppm 200000] [--shards 16]

Runs the composed curation pipeline (fused language/quality gates +
exact content dedup, pipelines/curate.py), assigns every survivor its
deterministic export shard (md5 docID math, textstats.shuffle_shards
contract), and writes hive-partitioned parquet `shard=K/` directories
under `<out>/data/`. A re-run after a mid-write crash WIPES
`<out>/data/` first (only `_COMMITTED` marks success — uuid-named part
files from a partial run would otherwise survive next to the fresh
output and duplicate rows). Idempotent: the `_COMMITTED` marker with
the gate parameters is written last; a resubmit with the marker
present is a no-op, and with DIFFERENT parameters it raises (the index
build's resume contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--langs", default="en", help="comma-separated keep set")
    ap.add_argument("--min-tokens", type=int, default=24)
    ap.add_argument("--min-stop-ppm", type=int, default=10_000)
    ap.add_argument("--max-punct-ppm", type=int, default=200_000)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--bench", default=None,
                    help="benchmark parquet (doc_id, text): drop docs whose "
                         "k-shingle overlap reaches --max-hit-ppm "
                         "(eval-leakage decontamination gate)")
    ap.add_argument("--max-hit-ppm", type=int, default=100_000)
    ap.add_argument("--format", choices=["parquet", "jsonl", "wet"],
                    default="parquet",
                    help="export format: hive-partitioned parquet (default), "
                         "NDJSON shards (the webtext interchange format), or "
                         "WET archives (one .warc.gz of conversion records "
                         "per shard, re-ingestable via --warc)")
    args = ap.parse_args(argv)

    params = {
        "langs": sorted(args.langs.split(",")),
        "min_tokens": args.min_tokens,
        "min_stop_ppm": args.min_stop_ppm,
        "max_punct_ppm": args.max_punct_ppm,
        "shards": args.shards,
        "bench": args.bench,
        "max_hit_ppm": args.max_hit_ppm,
        "format": args.format,
    }
    marker = os.path.join(args.out, "_COMMITTED")
    if os.path.exists(marker):
        committed = json.load(open(marker))
        if committed != params:
            raise SystemExit(
                "out dir committed with different parameters: %r vs %r"
                % (committed, params)
            )
        print(json.dumps({"status": "already-committed", **params}))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")

    import numpy as np
    import pyarrow as pa
    import ray.data

    from textindex_ray.pipelines.curate import curate

    docs = ray.data.read_parquet(args.docs, columns=["doc_id", "text"])
    kept = curate(
        docs,
        langs=tuple(params["langs"]),
        min_tokens=args.min_tokens,
        min_stop_ppm=args.min_stop_ppm,
        max_punct_ppm=args.max_punct_ppm,
        keep_text=True,
    )
    if args.bench:
        from textindex_ray.pipelines.curate import decontaminate_filter

        bench = ray.data.read_parquet(args.bench, columns=["doc_id", "text"])
        kept = decontaminate_filter(
            kept, bench, max_hit_ppm=args.max_hit_ppm
        )

    S = args.shards

    from textindex_ray.functions._util import export_shard

    def add_shard(b: pa.Table) -> pa.Table:
        sh = export_shard(b.column("doc_id").to_pylist(), S)
        return b.append_column("shard", pa.array(sh, pa.int64()))

    data_dir = os.path.join(args.out, "data")
    # Uncommitted leftovers from a crashed run would sit beside (and
    # double-count with) this run's uuid-named part files: start clean.
    if os.path.isdir(data_dir):
        import shutil

        shutil.rmtree(data_dir)
    sharded = kept.map_batches(add_shard, batch_format="pyarrow")
    if args.format == "jsonl":
        # NDJSON export: shard travels as a row field (write_json has no
        # hive partitioning); consumers re-shard on it or re-ingest via
        # sources/jsonl.py
        sharded.write_json(data_dir, min_rows_per_file=50_000)
        n = ray.data.read_json(data_dir).count()
    elif args.format == "wet":
        # WET export: one .warc.gz per shard, per-record gzip members
        # (the Common Crawl layout, so re-ingest streams member-wise);
        # rows sort by doc_id inside a shard for deterministic bytes
        import gzip

        from textindex_ray.sources.warc import wet_record

        os.makedirs(data_dir, exist_ok=True)

        def write_shard(g: pa.Table) -> pa.Table:
            g = g.sort_by("doc_id")
            sh = int(g.column("shard")[0].as_py())
            path = os.path.join(data_dir, "shard-%05d.warc.gz" % sh)
            with open(path, "wb") as f:
                for did, text in zip(g.column("doc_id").to_pylist(),
                                     g.column("text").to_pylist()):
                    f.write(gzip.compress(
                        wet_record(str(did), text.encode("utf-8"))))
            return pa.table({"n": pa.array([g.num_rows], pa.int64())})

        parts = (
            sharded.groupby("shard")
            .map_groups(write_shard, batch_format="pyarrow")
            .to_pandas()
        )
        n = int(parts["n"].sum()) if len(parts) else 0
    else:
        sharded.write_parquet(
            data_dir, partition_cols=["shard"], min_rows_per_file=50_000
        )
        n = ray.data.read_parquet(data_dir).count()
    with open(marker, "w") as f:
        json.dump(params, f)
    print(json.dumps({"status": "ok", "kept_docs": int(n), **params}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

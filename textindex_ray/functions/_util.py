"""Shared Dataset helpers for the operator families."""

from __future__ import annotations


def probe_count(ds):
    """Return ``(ds, n_rows)`` executing the lineage at most once.

    Many operators need the corpus size N up front (df caps, LSH plane
    counts, budget fractions) and then consume the same Dataset again.
    For a bare ``read_parquet`` the ``count()`` probe is answered from
    parquet file metadata (free), but for any DERIVED pipeline the
    probe executes the whole upstream lineage once and the real
    consumption executes it AGAIN (the shared-Dataset re-execution
    hazard in CLAUDE.md). Branch: metadata-countable inputs pass
    through untouched; derived inputs are materialized first so the
    probe and every downstream consumer share one set of blocks.

    ``_meta_count`` is a private Dataset attribute, but it is the exact
    fast path ``Dataset.count()`` itself uses; guarded with a fallback
    so a Ray upgrade degrades to materialize-always, never to wrong
    counts.
    """
    try:
        if ds._plan.initial_num_blocks() == 0:
            return ds, 0
        n = ds._meta_count()
    except Exception:
        n = None
    if n is not None:
        return ds, int(n)
    ds = ds.materialize()
    return ds, ds.count()


def sampled_range_bounds(ds, col: str, num_ranges: int, per_block: int = 256):
    """Deterministic sampled-quantile range boundaries over ``ds[col]``.

    Each block contributes up to ``per_block`` evenly spaced values of
    its sorted column (a tiny driver collect, O(blocks x per_block));
    the boundaries are the 1/B..(B-1)/B quantiles of the concatenated
    sample — skew-robust where equal-width min/max splits collapse
    (clustered ids, quality-sorted keys), at the cost of one extra tiny
    pass. Ties across a boundary are safe for callers that assign with
    ``searchsorted(bounds, v, side="right")``: equal values land in one
    range. Returns an ascending int64 array of B-1 boundaries (possibly
    with duplicates under extreme skew -> some ranges empty, which
    offset cumsum callers already tolerate), or None when the dataset
    has no rows.
    """
    import numpy as np
    import pyarrow as pa

    def block_sample(b: "pa.Table") -> "pa.Table":
        v = b.column(col).to_numpy()
        if v.size == 0:
            return pa.table({"sid": pa.array([], pa.int64())})
        s = np.sort(v.astype(np.int64))
        idx = np.linspace(0, s.size - 1, min(per_block, s.size)).astype(np.int64)
        return pa.table({"sid": pa.array(s[idx], pa.int64())})

    rows = ds.map_batches(block_sample, batch_format="pyarrow").take_all()
    sample = np.array([r["sid"] for r in rows], dtype=np.int64)
    if sample.size == 0:
        return None
    B = int(num_ranges)
    return np.quantile(
        sample, np.arange(1, B) / B, method="nearest"
    ).astype(np.int64)


def join_right(ds, num_partitions: int):
    """Prepare a Dataset to be the RIGHT side of ``Dataset.join``.

    Ray 2.49's hash-shuffle join raises ``ArrowInvalid: No match or
    multiple matches for key field ... on right side`` when the right
    dataset contains ZERO-ROW BLOCKS (a filter/map_batches that empties
    some blocks — empty *datasets* are a separately documented hazard,
    and empty LEFT blocks are fine; verified both ways on 2.49.2).
    ``repartition(n)`` rebalances rows into n non-empty blocks, which
    both removes the hazard and right-sizes the build side of the join.
    """
    return ds.repartition(max(1, int(num_partitions)))


def sorted_min_gap(a, b) -> int:
    """Smallest |x - y| over x in a, y in b — both SORTED int arrays
    (np.iinfo(int64).max when either is empty). Nearest-neighbor gap via
    merge: for each a-position the closest b-position sits at its
    searchsorted insertion point or one before it. Shared by the
    scan-verify proximity check (pipelines/documents._min_token_gap) and
    the positional-store one (index/positions.proximity_docs)."""
    import numpy as np

    big = np.iinfo(np.int64).max
    if len(a) == 0 or len(b) == 0:
        return int(big)
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    j = np.searchsorted(b, a)
    best = np.full(a.shape, big, np.int64)
    lo = j > 0
    best[lo] = a[lo] - b[j[lo] - 1]
    hi = j < b.size
    best[hi] = np.minimum(best[hi], b[j[hi]] - a[hi])
    return int(best.min())


def default_join_partitions(floor: int = 4, cap: int = 64) -> int:
    """CPU-scaled default for Dataset.join ``num_partitions``.

    The hash-shuffle join spawns ``num_partitions`` aggregator ACTORS
    (0.125 CPU each on 2.49): too many starves a small session's CPU
    budget (the documented P=32 deadlock on 4 CPUs), too few squeezes
    the joined relation into a handful of giant blocks at cluster
    scale. cluster_CPUs // 4 keeps the aggregator pool a small
    fraction of the budget at every size; bounded to [floor, cap].
    """
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", floor * 4))
    except Exception:
        cpus = floor * 4
    return max(floor, min(cap, cpus // 4))


def export_shard(ids, num_shards: int):
    """The cross-job export-shard rule: md5 of the DECIMAL doc_id
    string, first 8 hex digits, mod num_shards. One definition shared
    by jobs/ingest.py, jobs/curate.py and textstats.shuffle_shards so
    exports stay resume-compatible across jobs.

    DuckDB twin: ``('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
    % num_shards``.
    """
    import hashlib

    md5 = hashlib.md5
    return [
        int(md5(str(int(i)).encode("ascii")).hexdigest()[:8], 16) % num_shards
        for i in ids
    ]

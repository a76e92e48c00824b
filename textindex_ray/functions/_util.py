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

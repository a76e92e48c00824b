"""Opt-in memory diagnostics — the analog of the reference's feature-gated
allocation tracker (``/root/reference/src/main.rs:33-111``, the
``allocator`` cargo feature that wraps the global allocator and prints
per-group live-byte counters).

A Ray driver cannot see worker heaps through an allocator hook, so the
distributed analog records, at every phase commit:

- driver RSS and peak RSS (``/proc/self/status`` VmRSS / VmHWM),
- driver tracemalloc current/peak when tracing is active (started by
  ``jobs/build.py --track-alloc``),
- cluster object-store capacity and free bytes (the number that
  actually gates a Ray Data build: blocks spill when it fills).

Enabled by ``GRAFT_TRACK_ALLOC=1`` (or ``jobs/build.py --track-alloc``,
mirroring the reference's opt-in feature flag); snapshots land in each
phase's ``metrics.jsonl`` lineage record under the ``"alloc"`` key, so
an interrupted or slow build can be audited phase-by-phase after the
fact — the same workflow the reference's stdout counters serve.
"""

from __future__ import annotations

import os
import tracemalloc


def enabled() -> bool:
    return os.environ.get("GRAFT_TRACK_ALLOC") == "1"


def _proc_status_kb(keys: tuple[str, ...]) -> dict[str, int]:
    out: dict[str, int] = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                k = line.split(":", 1)[0]
                if k in keys:
                    out[k] = int(line.split()[1])  # kB
    except OSError:
        pass
    return out


def snapshot() -> dict | None:
    """One memory snapshot, or None when tracking is off."""
    if not enabled():
        return None
    out: dict = {}
    st = _proc_status_kb(("VmRSS", "VmHWM"))
    if "VmRSS" in st:
        out["driver_rss_mb"] = st["VmRSS"] // 1024
    if "VmHWM" in st:
        out["driver_peak_rss_mb"] = st["VmHWM"] // 1024
    if tracemalloc.is_tracing():
        cur, peak = tracemalloc.get_traced_memory()
        out["tracemalloc_mb"] = cur // (1024 * 1024)
        out["tracemalloc_peak_mb"] = peak // (1024 * 1024)
    try:
        import ray

        if ray.is_initialized():
            total = ray.cluster_resources().get("object_store_memory")
            free = ray.available_resources().get("object_store_memory")
            if total is not None:
                out["object_store_mb"] = int(total) // (1024 * 1024)
            if free is not None:
                out["object_store_free_mb"] = int(free) // (1024 * 1024)
    except Exception:
        pass
    return out


def start_tracing() -> None:
    """Enable tracking + driver tracemalloc (jobs/build.py --track-alloc)."""
    os.environ["GRAFT_TRACK_ALLOC"] = "1"
    if not tracemalloc.is_tracing():
        tracemalloc.start()

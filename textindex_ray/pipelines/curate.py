"""End-to-end training-data curation: the composed filter job a
corpus runs before tokenize/pack.

Composes the graded primitives — language ID, quality ratios, exact
content dedup — into ONE fused pipeline:

1. a single tokenization pass per batch computes every gate signal
   (``lang_id_batch`` / ``quality_batch`` each re-tokenize; at corpus
   scale the tokenizer IS the dominant cost, so the fused stage pays it
   once) and drops failing docs immediately, so only survivors carry
   any payload downstream;
2. exact near-dup removal on the whitespace-normalized content
   fingerprint, partition-bucketed exactly like
   :func:`textindex_ray.functions.dedup.exact_dedup` (coarse
   hash-prefix shuffle, per-partition sort + run-first) — no driver
   state, no fine-grained Ray groupby.

Gate semantics are identical to the individual operators (same
``_tokens`` regex, same marker sets, same integer-ppm floor contracts),
so the SQL oracle is the conjunction of the already-verified per-
operator oracles.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterable, Optional

import numpy as np
import pyarrow as pa


def curate(
    ds: "ray.data.Dataset",
    *,
    langs: Iterable[str] = ("en",),
    min_tokens: int = 24,
    max_tokens: Optional[int] = None,
    min_stop_ppm: int = 10_000,
    max_punct_ppm: int = 200_000,
    num_partitions: int = 32,
    keep_text: bool = False,
) -> "ray.data.Dataset":
    """(doc_id, lang_pred, n_tokens[, text]) of curated survivors.

    ``keep_text=True`` carries the document text through for export
    (jobs/curate.py); the dedup shuffle then moves survivor text — at
    corpus scale prefer the id-only manifest (default) plus a pruned
    re-read of the kept rows.

    A doc survives when its predicted language is in ``langs``, its
    token count is in ``[min_tokens, max_tokens]``, its stopword ratio
    is at least ``min_stop_ppm`` and its punctuation ratio at most
    ``max_punct_ppm`` (integer ppm, floor division — the oracle
    contract), and it is the minimum doc_id among survivors sharing its
    whitespace-normalized lowercase md5 fingerprint.
    """
    import pyarrow.compute as pc

    from textindex_ray.functions.textstats import (
        _ALL_STOP_MARKERS,
        _punct_count,
        _tokens,
        LANG_MARKERS,
    )

    out_schema = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "lang_pred": pa.array([], pa.string()),
         "n_tokens": pa.array([], pa.int64()),
         **({"text": pa.array([], pa.string())} if keep_text else {})}
    )
    # lineage-safe probe: metadata count for bare reads, materialize-once
    # for derived inputs (the count()-then-reconsume double execution)
    from textindex_ray.functions._util import probe_count

    ds, _n = probe_count(ds)
    if _n == 0:
        return out_schema  # schema-preserving degenerate result

    keep_langs = frozenset(langs)
    P = int(num_partitions)
    lang_order = ("de", "en", "fr")

    def gate(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_id: list = []
        o_lang: list = []
        o_nt: list = []
        o_fp: list = []
        o_part: list = []
        o_text: list = []
        for did, t in zip(ids, texts):
            toks = _tokens(t)
            nt = len(toks)
            if nt < min_tokens or (max_tokens is not None and nt > max_tokens):
                continue
            best_lang, best_n = "und", 0
            for lang in lang_order:  # fixed tie-break order (lang_id_batch)
                n = sum(1 for w in toks if w in LANG_MARKERS[lang])
                if n > best_n:
                    best_lang, best_n = lang, n
            if best_lang not in keep_langs:
                continue
            if sum(1 for w in toks if w in _ALL_STOP_MARKERS) * 1_000_000 // nt < min_stop_ppm:
                continue
            if t and _punct_count(t) * 1_000_000 // len(t) > max_punct_ppm:
                continue
            fp = hashlib.md5(
                re.sub(r"\s+", " ", t.lower()).encode("utf-8")
            ).hexdigest()
            o_id.append(did)
            o_lang.append(best_lang)
            o_nt.append(nt)
            o_fp.append(fp)
            o_part.append(int(fp[:4], 16) % P)
            if keep_text:
                o_text.append(t)
        cols = {
            "doc_id": pa.array(o_id, pa.int64()),
            "lang_pred": pa.array(o_lang, pa.string()),
            "n_tokens": pa.array(o_nt, pa.int64()),
            "fp": pa.array(o_fp, pa.string()),
            "part": pa.array(o_part, pa.int32()),
        }
        if keep_text:
            cols["text"] = pa.array(o_text, pa.string())
        t = pa.table(cols)
        # per-batch combiner: only the batch-minimum doc per fingerprint
        # ships through the dedup shuffle (a smaller doc_id in the same
        # batch already disqualifies the others globally — exact)
        if t.num_rows > 1:
            t = t.sort_by([("fp", "ascending"), ("doc_id", "ascending")])
            fpc = t.column("fp").combine_chunks()
            nn = len(fpc)
            eq = pc.equal(fpc.slice(1, nn - 1), fpc.slice(0, nn - 1)).to_numpy(
                zero_copy_only=False
            )
            t = t.take(pa.array(np.concatenate(([0], np.flatnonzero(~eq) + 1))))
        return t

    out_cols = ["doc_id", "lang_pred", "n_tokens"] + (
        ["text"] if keep_text else []
    )

    def part_keep(g: pa.Table) -> pa.Table:
        t = g.sort_by([("fp", "ascending"), ("doc_id", "ascending")])
        fp = t.column("fp").combine_chunks()
        n = len(fp)
        if n == 0:
            return t.select(out_cols)
        eq = pc.equal(fp.slice(1, n - 1), fp.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(~eq) + 1))
        return t.take(pa.array(starts)).select(out_cols)

    return (
        ds.map_batches(gate, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_keep, batch_format="pyarrow")
    )


def decontaminate_filter(
    ds: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    *,
    k: int = 5,
    max_hit_ppm: int = 100_000,
    join_partitions: int = 8,
):
    """Drop curated docs whose benchmark k-shingle overlap reaches
    ``max_hit_ppm`` — the eval-leakage gate composed onto the curation
    output (``jobs/curate.py --bench``).

    Plan: :func:`textindex_ray.functions.dedup.decontaminate` scores
    every doc (broadcast benchmark set for eval-sized benchmarks,
    partitioned shingle plan past the limit); the clean doc_ids come
    back to the payload rows via a partitioned inner Dataset.join —
    never a driver-side id set, so a dup-heavy / fully-clean corpus
    costs the same. Keeps ``ds``'s columns. The all-contaminated edge
    (empty join side) returns the schema-preserving empty table.
    """
    import pyarrow.compute as pc

    from textindex_ray.functions._util import probe_count
    from textindex_ray.functions.dedup import decontaminate

    # ds is consumed TWICE (shingle scoring + the payload join):
    # materialize derived lineages once up front, or the whole curate
    # pipeline re-executes per consumer (CLAUDE.md shared-Dataset rule)
    ds, _n = probe_count(ds)
    scores = decontaminate(ds, bench, k=k)
    if isinstance(scores, pa.Table):  # empty-input degenerate form
        return ds.limit(0)
    thr = int(max_hit_ppm)

    def clean_ids(b: pa.Table) -> pa.Table:
        keep = pc.less(b.column("hit_ppm"), thr)
        return pa.table({"doc_id": b.filter(keep).column("doc_id")})

    from textindex_ray.functions._util import join_right

    clean = scores.map_batches(
        clean_ids, batch_format="pyarrow"
    ).materialize()  # maybe-empty join side: materialize + branch (CLAUDE.md)
    if clean.count() == 0:
        return ds.limit(0)
    return ds.join(
        join_right(clean, join_partitions), join_type="inner",
        num_partitions=join_partitions, on=("doc_id",),
    )

"""Embedding-generation stage: text -> dense vectors, as an actor-pool
``map_batches`` stage (the missing front of the similarity family, which
otherwise consumes precomputed ``embeddings.parquet``).

The in-sandbox "model" is a deterministic FEATURE-HASH projection
(Weinberger et al., "Feature Hashing for Large Scale Multitask
Learning", ICML 2009): token w contributes ``sign(w) * tf`` to
dimension ``h(w) % d``, with h and sign drawn from md5 — the repo's
oracle-reproducible hash contract (CLAUDE.md docID contract), so DuckDB
recomputes the exact integer vectors:

    dim    = ('0x' || substr(md5(w), 1, 8))::BIGINT % d
    sign   = CASE WHEN ('0x' || substr(md5(w), 9, 1))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END

A real sentence-transformer drops into the same actor shape: load the
model in ``__init__`` (once per actor), batch-encode in ``__call__`` —
the multimodal decode stages (functions/multimodal.py) document the
identical pattern for images.

Tokenization is the word-run tokenizer shared with the graded textstats
family (``\\pL+`` on lowercased text — matches DuckDB
``regexp_extract_all(lower(text), '\\pL+')`` on the testdata charset).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from textindex_ray.functions.textstats import _WORD_RE

DEFAULT_DIM = 16


def token_projection(w: str, d: int) -> tuple[int, int]:
    """(dimension, sign) for one token — md5-derived, DuckDB-reproducible."""
    hx = hashlib.md5(w.encode("utf-8")).hexdigest()
    return int(hx[:8], 16) % d, (1 if int(hx[8], 16) % 2 == 0 else -1)


class EmbedDocs:
    """Actor-pool encoder: (id_col, text_col) -> (id_col, embedding).

    __init__ = the once-per-actor model load (here: the projection
    config + a token->(dim, sign) memo cache that persists across
    batches — hot vocabulary hashes once per actor, not once per
    occurrence). __call__ = batched encode.

    ``normalize=True`` L2-normalizes to float32 unit vectors (the
    similarity family's input convention); ``normalize=False`` emits the
    raw integer counts as float32 (exact, for tests/oracles).
    """

    def __init__(self, d: int = DEFAULT_DIM, *, text_col: str = "text",
                 id_col: str = "doc_id", normalize: bool = True):
        self.d = int(d)
        self.text_col = text_col
        self.id_col = id_col
        self.normalize = normalize
        self._memo: dict[str, tuple[int, int]] = {}

    def _vec(self, text: str) -> np.ndarray:
        v = np.zeros(self.d, np.int64)
        memo = self._memo
        for w in _WORD_RE.findall(text.lower()):
            p = memo.get(w)
            if p is None:
                p = token_projection(w, self.d)
                memo[w] = p
            v[p[0]] += p[1]
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        mat = np.empty((len(texts), self.d), np.float64)
        for i, t in enumerate(texts):
            mat[i] = self._vec(t)
        if self.normalize:
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = np.divide(mat, norms, out=np.zeros_like(mat), where=norms > 0)
        flat = mat.astype(np.float32).ravel()
        offs = np.arange(len(texts) + 1, dtype=np.int64) * self.d
        emb = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), pa.array(flat, pa.float32())
        ).cast(pa.list_(pa.float32()))
        return pa.table({self.id_col: batch.column(self.id_col), "embedding": emb})


def embed_documents(ds, *, d: int = DEFAULT_DIM, concurrency: int = 2,
                    batch_size: int = 1024, normalize: bool = True,
                    text_col: str = "text", id_col: str = "doc_id"):
    """(id, text) Dataset -> (id, embedding list<float32>) Dataset via the
    EmbedDocs actor pool — feeds similarity.knn_* / lsh_dup_pairs
    directly (end-to-end text -> ANN, tested)."""
    return ds.map_batches(
        EmbedDocs,
        fn_constructor_kwargs={
            "d": d, "text_col": text_col, "id_col": id_col,
            "normalize": normalize,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def embed_rows_batch(d: int = DEFAULT_DIM):
    """Batch fn emitting the INTEGER projection as (doc_id, dim, val)
    rows (nonzero dims only) — the SQL-twinned graded form; exact int64
    sums, so the DuckDB oracle matches bit-for-bit."""

    enc = EmbedDocs(d=d, normalize=False)  # memo persists across batches

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        o_id, o_dim, o_val = [], [], []
        for did, t in zip(ids, batch.column("text").to_pylist()):
            v = enc._vec(t)
            nz = np.flatnonzero(v)
            o_id.append(np.full(nz.size, did, np.int64))
            o_dim.append(nz.astype(np.int64))
            o_val.append(v[nz])
        if not o_id:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "dim": pa.array([], pa.int64()),
                 "val": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(o_id), pa.int64()),
                "dim": pa.array(np.concatenate(o_dim), pa.int64()),
                "val": pa.array(np.concatenate(o_val), pa.int64()),
            }
        )

    return fn

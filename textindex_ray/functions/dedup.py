"""Deduplication operators over a documents table.

Large-scale training-data pipeline components, each built Ray-Data-first:

- exact_dedup: content-hash -> hash-partitioned groupby -> keep the
  minimum doc_id per group (deterministic "first").
- minhash_lsh_pairs: exact-dup collapse -> minhash signatures over
  representatives (actor pool) -> LSH band explode -> band-bucket
  groupby -> candidate pairs -> partitioned hash joins attach texts ->
  exact Jaccard verify -> expansion joins back to member pairs. No
  driver-side materialization; only candidate rows carry text through
  a shuffle.
- simhash64: 64-bit simhash per doc (token-hash bit voting).
- ngram_jaccard_pairs: EXACT character-n-gram Jaccard pairs via the
  distributed shingle-inverted-index plan (explode distinct shingles ->
  per-shingle pair partials -> pair-count aggregate -> size joins ->
  integer-ppm filter); the all-pairs bitset form survives as the
  small-scale verifier (ngram_jaccard_pairs_allpairs).

Determinism: all hashes derive from md5/blake2b of the content — no
process-salted ``hash()`` anywhere, so results are identical across
runs and cluster sizes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from textindex_ray.functions._util import join_right


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def add_text_hash(batch: pa.Table) -> pa.Table:
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch.column("text").to_pylist()]
    return batch.append_column("text_hash", pa.array(h, pa.string()))


def exact_dedup_groups(
    ds: "ray.data.Dataset", *, num_partitions: int = 32
) -> "ray.data.Dataset":
    """(text_hash, keep_doc_id, dup_count): one row per distinct content.

    Partition-bucketed: rows shuffle by a coarse hash-prefix partition
    (so every text_hash lands wholly in one partition) and the
    fine-grained per-hash grouping runs inside the partition with the
    Arrow C++ hash aggregate — Ray's sort-based groupby costs ~0.2 ms of
    Python per group, which dominates at millions of distinct texts."""
    P = int(num_partitions)

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        t = pa.table(
            {"doc_id": batch.column("doc_id"),
             "text_hash": pa.array(h, pa.string())}
        )
        # per-batch combiner: one (min, count) partial per distinct hash
        # ships through the shuffle instead of one row per doc — exact,
        # since min-of-mins and sum-of-counts are order-free
        t = t.group_by("text_hash").aggregate(
            [("doc_id", "min"), ("doc_id", "count")]
        )
        part = pa.array(
            [int(x[:4], 16) % P for x in t.column("text_hash").to_pylist()],
            pa.int32(),
        )
        return pa.table(
            {"text_hash": t.column("text_hash"),
             "min_id": t.column("doc_id_min").cast(pa.int64()),
             "cnt": t.column("doc_id_count").cast(pa.int64()),
             "part": part}
        )

    def part_agg(g: pa.Table) -> pa.Table:
        t = g.group_by("text_hash").aggregate(
            [("min_id", "min"), ("cnt", "sum")]
        )
        return pa.table(
            {
                "text_hash": t.column("text_hash"),
                "keep_doc_id": t.column("min_id_min").cast(pa.int64()),
                "dup_count": t.column("cnt_sum").cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_agg, batch_format="pyarrow")
    )


def exact_dedup(
    ds: "ray.data.Dataset", *, num_partitions: int = 32
) -> "ray.data.Dataset":
    """Keep one row (min doc_id) per distinct text (partition-bucketed
    run-first, like exact_dedup_groups)."""
    import pyarrow.compute as pc

    P = int(num_partitions)

    def add_hp(b: pa.Table) -> pa.Table:
        part = pa.array(
            [int(h[:4], 16) % P for h in b.column("text_hash").to_pylist()],
            pa.int32(),
        )
        return b.append_column("part", part)

    def part_first(g: pa.Table) -> pa.Table:
        t = g.sort_by([("text_hash", "ascending"), ("doc_id", "ascending")])
        th = t.column("text_hash").combine_chunks()
        n = len(th)
        eq = pc.equal(th.slice(1, n - 1), th.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(~eq) + 1))
        return t.take(pa.array(starts)).drop_columns(["part"])

    return (
        ds.map_batches(add_text_hash, batch_format="pyarrow")
        .map_batches(add_hp, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH

def _shingles(text: str, k: int) -> set[bytes]:
    t = " ".join(text.lower().split())
    if len(t) < k:
        return {t.encode("utf-8")} if t else set()
    return {t[i : i + k].encode("utf-8") for i in range(len(t) - k + 1)}


class MinHasher:
    """Actor-pool stage: text -> minhash signature (num_perm x uint64).

    Universal hashing a*x+b mod p over 64-bit shingle hashes; the
    (a, b) coefficients are seeded deterministically in __init__ (once
    per actor).
    """

    P = (1 << 61) - 1

    def __init__(self, num_perm: int = 128, shingle_k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self.P, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, self.P, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = np.fromiter(
            (int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big") for s in sh),
            dtype=np.uint64,
            count=len(sh),
        )
        # (a*x + b) mod p, computed in object ints to avoid overflow:
        # vectorized via Python ints per permutation is slow; use float-free
        # modmul with uint128 emulation through np.uint64 pairs is overkill —
        # num_perm x |shingles| fits comfortably as object-free using
        # np.mod on uint64 after splitting: here we use the simpler
        # (a * x) % 2**64 + b) % p which is NOT a universal family mod p,
        # but is a fixed deterministic mixing; adequate for LSH bucketing.
        mixed = (x[None, :] * self.a[:, None] + self.b[:, None])  # mod 2**64 wraparound
        return mixed.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array([s.tolist() for s in sigs], pa.list_(pa.uint64())),
            }
        )


def lsh_band_explode(num_bands: int, rows_per_band: int,
                     num_partitions: int | None = None):
    """Signature -> (band_id, band_hash, doc_id[, part]) rows; ``part``
    is the coarse bucket-colocating hash partition (every (band, hash)
    bucket lands wholly in one partition)."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        sigs = batch.column("sig").to_pylist()
        out_doc, out_band, out_hash, out_part = [], [], [], []
        for d, sig in zip(doc_ids, sigs):
            for b in range(num_bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.md5(np.array(chunk, dtype=np.uint64).tobytes()).hexdigest()[:16]
                out_doc.append(d)
                out_band.append(b)
                out_hash.append(h)
                if num_partitions:
                    out_part.append((int(h[:8], 16) ^ b) % num_partitions)
        cols = {
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
            "doc_id": pa.array(out_doc, pa.int64()),
        }
        if num_partitions:
            cols["part"] = pa.array(out_part, pa.int32())
        return pa.table(cols)

    return fn


_EMPTY_PAIRS = pa.table(
    {"doc_a": pa.array([], pa.int64()),
     "doc_b": pa.array([], pa.int64()),
     "jaccard_ppm": pa.array([], pa.int64())}
)

_EMPTY_AB = pa.table(
    {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
)


def _run_starts_eq(eq: "np.ndarray", n: int) -> "np.ndarray":
    """Run starts (with trailing n) from an adjacent-equality mask."""
    return np.concatenate(([0], np.flatnonzero(~eq) + 1, [n]))


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    *,
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 5,
    verify_threshold: float = 0.5,
    num_partitions: int = 4,
    fine_partitions: int = 32,
) -> "ray.data.Dataset":
    """Near-duplicate pairs via MinHash-LSH, verified with exact shingle
    Jaccard. Returns (doc_a, doc_b, jaccard_ppm), doc_a < doc_b —
    identical output to all-bucket-pairs + verify (golden-tested), with
    NO driver-side materialization anywhere:

    1. exact-dup collapse: groupby(text_hash) keeps one representative
       per distinct text (min doc_id). Boilerplate-heavy web data — the
       degenerate-LSH-bucket case — collapses here, before banding.
    2. map_batches(MinHasher actor) over representatives only.
    3. band explode (ids only) -> groupby(band_id, band_hash) ->
       vectorized per-bucket pair emission -> pair dedup across bands.
    4. candidate texts attached via partitioned hash joins back to the
       representative table (only candidate rows shuffle; no broadcast),
       then exact-Jaccard verify per batch.
    5. verified representative pairs expand back to member pairs through
       the membership table (two more hash joins); within-group member
       pairs are exact duplicates (jaccard = 1e6 when the text has any
       shingles, matching the brute path).

    Remaining worst case: a bucket of b DISTINCT near-identical texts
    still emits O(b^2) candidate pairs — that is the LSH candidate set
    itself, not an artifact; emission is one vectorized block per
    bucket.

    Every fine-grained grouping (text_hash rep-selection, band buckets,
    pair dedup, within-group member pairs) shuffles on a COARSE
    ``fine_partitions`` hash partition and runs the fine grouping inside
    the partition with Arrow sort/run-detection — Ray's per-group Python
    cost (~0.2 ms) would dominate at millions of buckets.
    """
    import pyarrow.compute as pc

    rows_per_band = num_perm // num_bands
    k = shingle_k
    thr = int(verify_threshold * 1_000_000)

    hashed = ds.select_columns(["doc_id", "text"]).map_batches(
        add_text_hash, batch_format="pyarrow"
    )
    members = hashed.select_columns(["doc_id", "text_hash"])

    fine = int(fine_partitions)

    def add_hpart(b: pa.Table) -> pa.Table:
        part = pa.array(
            [int(h[:4], 16) % fine for h in b.column("text_hash").to_pylist()],
            pa.int32(),
        )
        return b.append_column("part", part)

    def part_first(g: pa.Table) -> pa.Table:
        # min-doc_id row per text_hash: sort, take each run's first row
        t = g.sort_by([("text_hash", "ascending"), ("doc_id", "ascending")])
        th = t.column("text_hash").combine_chunks()
        n = len(th)
        eq = pc.equal(th.slice(1, n - 1), th.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(~eq) + 1))
        return t.take(pa.array(starts)).drop_columns(["part"])

    reps = (
        hashed.map_batches(add_hpart, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_first, batch_format="pyarrow")
    )

    def add_flag(b: pa.Table) -> pa.Table:
        ne = [len(" ".join(t.split())) > 0 for t in b.column("text").to_pylist()]
        return b.append_column("has_shingles", pa.array(ne, pa.bool_()))

    # reps is consumed by three branches (signatures, two text joins,
    # membership join): materialize once so the text_hash shuffle is not
    # re-executed per consumer (and the streaming DAG at low CPU counts
    # is not starved by concurrent shuffles); the object store spills it
    # if the distinct-text set is large.
    reps = reps.map_batches(add_flag, batch_format="pyarrow").materialize()

    sigs = reps.select_columns(["doc_id", "text"]).map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )
    bands = sigs.map_batches(
        lsh_band_explode(num_bands, rows_per_band, num_partitions=fine),
        batch_format="pyarrow",
    )

    def part_band_pairs(g: pa.Table) -> pa.Table:
        # all bucket runs of one partition: sort, detect runs, emit each
        # run's triu pair block, locally dedup with the Arrow aggregate
        n = g.num_rows
        if n < 2:
            return _EMPTY_AB
        t = g.sort_by([
            ("band_id", "ascending"), ("band_hash", "ascending"),
            ("doc_id", "ascending"),
        ])
        bh = t.column("band_hash").combine_chunks()
        bid = t.column("band_id").to_numpy()
        ids = t.column("doc_id").to_numpy()
        eq = pc.equal(bh.slice(1, n - 1), bh.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        ) & (bid[1:] == bid[:-1])
        starts = _run_starts_eq(eq, n)
        oa, ob = [], []
        for st, en in zip(starts[:-1], starts[1:]):
            if en - st < 2:
                continue
            iu, ju = np.triu_indices(en - st, k=1)
            oa.append(ids[st + iu])
            ob.append(ids[st + ju])
        if not oa:
            return _EMPTY_AB
        tt = pa.table(
            {"doc_a": pa.array(np.concatenate(oa), pa.int64()),
             "doc_b": pa.array(np.concatenate(ob), pa.int64())}
        )
        return tt.group_by(["doc_a", "doc_b"]).aggregate([])

    def add_pair_part(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy().astype(np.uint64)
        bb = b.column("doc_b").to_numpy().astype(np.uint64)
        h = a * np.uint64(0x9E3779B97F4A7C15) + bb * np.uint64(0xC2B2AE3D27D4EB4F)
        return b.append_column(
            "part", pa.array((h % np.uint64(fine)).astype(np.int32), pa.int32())
        )

    def part_distinct(g: pa.Table) -> pa.Table:
        return g.select(["doc_a", "doc_b"]).group_by(
            ["doc_a", "doc_b"]
        ).aggregate([])

    # candidate pairs are consumed by the verify joins and can be empty
    # (empty blocks lose their schema through a hash join): materialize —
    # it is the small side by construction — and branch on the count
    # (metadata-only on a materialized dataset)
    pairs = (
        bands.groupby("part")
        .map_groups(part_band_pairs, batch_format="pyarrow")
        .map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_distinct, batch_format="pyarrow")
        .materialize()
    )

    # attach both representative texts with partitioned hash joins (the
    # right key column is consumed by the join; only `text` is added)
    rtext = join_right(
        reps.select_columns(["doc_id", "text"]), num_partitions
    )  # right side must hold no zero-row blocks (_util.join_right)
    j1 = pairs.join(
        rtext, join_type="inner", num_partitions=num_partitions,
        on=("doc_a",), right_on=("doc_id",),
    ).rename_columns({"text": "text_a"})
    j2 = j1.join(
        rtext, join_type="inner", num_partitions=num_partitions,
        on=("doc_b",), right_on=("doc_id",),
    ).rename_columns({"text": "text_b"})

    def verify(batch: pa.Table) -> pa.Table:
        cache: dict[int, set[bytes]] = {}

        def sh(key, text):
            s = cache.get(key)
            if s is None:
                s = _shingles(text, k)
                cache[key] = s
            return s

        oa, ob, oj = [], [], []
        for x, y, ta, tb in zip(
            batch.column("doc_a").to_pylist(),
            batch.column("doc_b").to_pylist(),
            batch.column("text_a").to_pylist(),
            batch.column("text_b").to_pylist(),
        ):
            sa, sb = sh(x, ta), sh(y, tb)
            union = len(sa | sb)
            j = (len(sa & sb) * 1_000_000 // union) if union else 0
            if j >= thr:
                oa.append(x)
                ob.append(y)
                oj.append(j)
        return pa.table(
            {"doc_a": pa.array(oa, pa.int64()),
             "doc_b": pa.array(ob, pa.int64()),
             "jaccard_ppm": pa.array(oj, pa.int64())}
        )

    # verified representative pairs feed two expansion joins: materialize
    # (tiny: one row per verified near-dup pair of distinct texts)
    if pairs.count() == 0:
        rep_pairs = ray.data.from_arrow(_EMPTY_PAIRS)
    else:
        rep_pairs = j2.map_batches(verify, batch_format="pyarrow").materialize()

    # ---- expand representative pairs back to member pairs -----------------
    minfo = members.join(
        join_right(reps.select_columns(["text_hash", "doc_id", "has_shingles"]),
                   num_partitions),
        join_type="inner", num_partitions=num_partitions,
        on=("text_hash",), left_suffix="", right_suffix="_rep",
    ).materialize()

    def part_group_pairs(g: pa.Table) -> pa.Table:
        t = g.sort_by([("text_hash", "ascending"), ("doc_id", "ascending")])
        th = t.column("text_hash").combine_chunks()
        ids = t.column("doc_id").to_numpy()
        hs = t.column("has_shingles").to_numpy(zero_copy_only=False)
        n = ids.size
        if n < 2:
            return _EMPTY_PAIRS
        eq = pc.equal(th.slice(1, n - 1), th.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = _run_starts_eq(eq, n)
        oa, ob = [], []
        for st, en in zip(starts[:-1], starts[1:]):
            if en - st < 2 or not hs[st]:
                continue
            iu, ju = np.triu_indices(en - st, k=1)
            oa.append(ids[st + iu])
            ob.append(ids[st + ju])
        if not oa:
            return _EMPTY_PAIRS
        a = np.concatenate(oa)
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()),
             "doc_b": pa.array(np.concatenate(ob), pa.int64()),
             "jaccard_ppm": pa.array(
                 np.full(a.size, 1_000_000, dtype=np.int64), pa.int64())}
        )

    within = (
        minfo.map_batches(add_hpart, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_group_pairs, batch_format="pyarrow")
    )
    if thr > 1_000_000:
        within = within.filter(lambda r: False)

    if rep_pairs.count() == 0:
        return within.union(ray.data.from_arrow(_EMPTY_PAIRS))

    mrep = minfo.select_columns(["doc_id", "doc_id_rep"])
    e1 = rep_pairs.join(
        mrep, join_type="inner", num_partitions=num_partitions,
        on=("doc_a",), right_on=("doc_id_rep",),
    ).drop_columns(["doc_a"]).rename_columns({"doc_id": "a_id"})
    e2 = e1.join(
        mrep, join_type="inner", num_partitions=num_partitions,
        on=("doc_b",), right_on=("doc_id_rep",),
    ).drop_columns(["doc_b"]).rename_columns({"doc_id": "b_id"})

    def orient(batch: pa.Table) -> pa.Table:
        a = batch.column("a_id").to_numpy()
        b = batch.column("b_id").to_numpy()
        return pa.table(
            {"doc_a": pa.array(np.minimum(a, b), pa.int64()),
             "doc_b": pa.array(np.maximum(a, b), pa.int64()),
             "jaccard_ppm": batch.column("jaccard_ppm").cast(pa.int64())}
        )

    cross = e2.map_batches(orient, batch_format="pyarrow")
    return within.union(cross)


# ---------------------------------------------------------------------------
# SimHash

_WORD_RE = __import__("re").compile(r"[^\W\d_]+")
# token -> md5_64 cache, persistent per worker process (vocabulary is
# bounded; common words repeat across every batch)
_SIMHASH_CACHE: dict[str, int] = {}


def simhash64_batch(batch: pa.Table) -> pa.Table:
    """64-bit SimHash over word tokens (md5-derived token hashes).

    Deterministic; returned as int64 (two's complement of the uint64).
    Vectorized: each distinct token in the batch is hashed once (cached
    across batches), token-hash bits come from one ``np.unpackbits`` over
    the hash array, and per-doc votes are count-weighted matrix rows
    reduced with ``np.add.reduceat`` — no per-token Python bit loop.
    """
    from collections import Counter

    texts = batch.column("text").to_pylist()
    counters = [Counter(_WORD_RE.findall(t.lower())) for t in texts]
    vocab: dict[str, int] = {}
    for c in counters:
        for w in c:
            if w not in vocab:
                vocab[w] = len(vocab)
    n = len(texts)
    if not vocab:
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "simhash": pa.array([0] * n, pa.int64())}
        )
    hs = np.empty(len(vocab), dtype=np.uint64)
    for w, i in vocab.items():
        h = _SIMHASH_CACHE.get(w)
        if h is None:
            h = _md5_64(w)
            _SIMHASH_CACHE[w] = h
        hs[i] = h
    # (V, 64) ±1 matrix; column i == bit i of the hash (little-endian host)
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    pm = (bits.astype(np.int64) << 1) - 1
    # flatten (doc, distinct-token) pairs, count-weighted
    idx = np.fromiter(
        (vocab[w] for c in counters for w in c), dtype=np.int64,
        count=sum(len(c) for c in counters),
    )
    cnt = np.fromiter(
        (v for c in counters for v in c.values()), dtype=np.int64, count=idx.size
    )
    lens = np.fromiter((len(c) for c in counters), dtype=np.int64, count=n)
    votes = np.zeros((n, 64), dtype=np.int64)
    nonempty = np.flatnonzero(lens)
    if nonempty.size:
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[nonempty]
        votes[nonempty] = np.add.reduceat(cnt[:, None] * pm[idx], starts, axis=0)
    vals = np.packbits(votes > 0, axis=1, bitorder="little").view(np.int64).ravel()
    vals = vals.copy()  # own the buffer (two's complement bit reinterpret)
    vals[lens == 0] = 0
    return pa.table(
        {"doc_id": batch.column("doc_id"), "simhash": pa.array(vals, pa.int64())}
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact)

def ngram_jaccard_pairs(
    ds: "ray.data.Dataset", *, k: int = 5, min_ppm: int = 500_000,
    num_partitions: int = 32, size_broadcast_limit: int = 4_000_000,
    join_partitions: int = 4, score: str = "jaccard",
) -> "ray.data.Dataset":
    """EXACT char-n-gram Jaccard pairs, fully distributed — the
    shingle-inverted-index plan (the same plan the SQL oracle's
    self-join compiles to), with NO driver-side materialization:

    1. explode: per doc, DISTINCT k-shingles -> (doc_id, g, part) rows,
       part = crc32(g) % num_partitions
    2. groupby(part).map_groups: inside each partition, shingle runs
       (sort by g) emit vectorized triu pair blocks — one +1
       intersection partial per co-occurring pair per shared shingle —
       locally collapsed with the Arrow C++ hash aggregate
    3. pair partials re-partitioned by a pair hash ->
       groupby(part).map_groups Arrow-sum -> exact intersection sizes
    4. two partitioned hash joins attach |A| and |B| (computed by a
       second cheap streaming pass over the input — no shared-lineage
       re-execution, no materialize)
    5. integer-ppm filter: inter*1e6 >= min_ppm*(|A|+|B|-inter),
       emitting jaccard_ppm = inter*1e6 // union

    Output (doc_a, doc_b, jaccard_ppm), doc_a < doc_b — identical rows
    to the all-pairs bitset verifier (pytest-gated equality).
    ``score="containment"`` swaps the denominator for min(|A|, |B|)
    (and the column for containment_ppm) — the quote/boilerplate
    detector where a short doc embedded in a long one scores ~1e6 while
    its Jaccard stays low; everything up to the finisher is shared.

    Both wide steps group on the COARSE hash partition (num_partitions
    groups), never on the fine key: Ray's sort-based groupby spends
    ~0.2 ms of Python per group, which is fine for dozens of partitions
    and fatal for millions of shingles / pairs; all fine-grained
    grouping happens inside the partition with Arrow kernels.

    Scale note: a shingle shared by d docs emits C(d, 2) partials —
    inherent to EXACT Jaccard (the oracle's self-join pays the same);
    boilerplate-heavy corpora should run exact_dedup first (as
    minhash_lsh_pairs does) and use the LSH path for unknown-size data.
    num_partitions bounds per-task group size: raise it until one
    partition's shingle rows fit a worker heap.
    """
    import zlib

    if score not in ("jaccard", "containment"):
        raise ValueError("score must be 'jaccard' or 'containment'")
    containment = score == "containment"
    out_col = "containment_ppm" if containment else "jaccard_ppm"
    _empty_out = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         out_col: pa.array([], pa.int64())}
    )
    shingle_k = k
    P = int(num_partitions)

    _EMPTY_C = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         "c": pa.array([], pa.int64())}
    )

    def explode(batch: pa.Table) -> pa.Table:
        out_doc: list[int] = []
        out_g: list[bytes] = []
        out_p: list[int] = []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sh = _shingles(t, shingle_k)
            out_doc.extend([d] * len(sh))
            out_g.extend(sh)
            out_p.extend(zlib.crc32(s) % P for s in sh)
        return pa.table(
            {"doc_id": pa.array(out_doc, pa.int64()),
             "g": pa.array(out_g, pa.binary()),
             "part": pa.array(out_p, pa.int32())}
        )

    def sizes_batch(batch: pa.Table) -> pa.Table:
        ids, ns = [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            n = len(_shingles(t, shingle_k))
            if n:
                ids.append(d)
                ns.append(n)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "n": pa.array(ns, pa.int64())}
        )

    import pyarrow.compute as pc

    def part_pairs(g: pa.Table) -> pa.Table:
        """All pair partials of one shingle partition, locally combined."""
        t = g.sort_by([("g", "ascending"), ("doc_id", "ascending")])
        garr = t.column("g").combine_chunks()
        ids = t.column("doc_id").to_numpy()
        n = ids.size
        if n < 2:
            return _EMPTY_C
        eq = pc.equal(garr.slice(1, n - 1), garr.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(~eq) + 1, [n]))
        oa, ob = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            run = e - s
            if run < 2:
                continue
            iu, ju = np.triu_indices(run, k=1)
            oa.append(ids[s + iu])
            ob.append(ids[s + ju])
        if not oa:
            return _EMPTY_C
        tt = pa.table(
            {"doc_a": pa.array(np.concatenate(oa), pa.int64()),
             "doc_b": pa.array(np.concatenate(ob), pa.int64())}
        )
        cg = tt.group_by(["doc_a", "doc_b"]).aggregate([("doc_a", "count")])
        return pa.table(
            {"doc_a": cg.column("doc_a"), "doc_b": cg.column("doc_b"),
             "c": cg.column("doc_a_count").cast(pa.int64())}
        )

    def add_pair_part(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.uint64)
        b = batch.column("doc_b").to_numpy().astype(np.uint64)
        h = a * np.uint64(0x9E3779B97F4A7C15) + b * np.uint64(0xC2B2AE3D27D4EB4F)
        return batch.append_column(
            "part", pa.array((h % np.uint64(P)).astype(np.int32), pa.int32())
        )

    def part_sum(g: pa.Table) -> pa.Table:
        cg = g.group_by(["doc_a", "doc_b"]).aggregate([("c", "sum")])
        return pa.table(
            {"doc_a": cg.column("doc_a"), "doc_b": cg.column("doc_b"),
             "inter": cg.column("c_sum").cast(pa.int64())}
        )

    src = ds.select_columns(["doc_id", "text"])
    inter = (
        src.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pyarrow")
        .map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_sum, batch_format="pyarrow")
    )
    thr = int(min_ppm)

    # ---- attach |A| / |B| and apply the ppm filter ------------------------
    # The sizes side is ONE int64 pair per doc: broadcast it (ray.put once,
    # searchsorted per batch) while it fits a worker heap; partitioned hash
    # joins are the fallback above the limit. Same size-gated short-circuit
    # pattern as index/build.py's global-stats step.
    sizes_stream = src.map_batches(sizes_batch, batch_format="pyarrow")
    sid_parts, sn_parts, too_big, total = [], [], False, 0
    for bt in sizes_stream.iter_batches(batch_format="pyarrow"):
        total += bt.num_rows
        if total > size_broadcast_limit:
            too_big = True
            break
        sid_parts.append(bt.column("doc_id").to_numpy())
        sn_parts.append(bt.column("n").to_numpy())

    if not too_big:
        if total == 0:
            # 0-row Datasets lose their schema on pandas conversion; the
            # schema-preserving degenerate result is the Arrow table itself
            return _empty_out
        sid = np.concatenate(sid_parts)
        sn = np.concatenate(sn_parts).astype(np.int64)
        order = np.argsort(sid)
        ref = ray.put((sid[order], sn[order]))

        def finish_broadcast(batch: pa.Table) -> pa.Table:
            ids_s, ns_s = ray.get(ref)
            a = batch.column("doc_a").to_numpy()
            b = batch.column("doc_b").to_numpy()
            it = batch.column("inter").to_numpy().astype(np.int64)
            na = ns_s[np.searchsorted(ids_s, a)]
            nb = ns_s[np.searchsorted(ids_s, b)]
            den = np.minimum(na, nb) if containment else na + nb - it
            den = np.maximum(den, 1)
            jac = it * 1_000_000 // den
            keep = jac >= thr
            return pa.table(
                {"doc_a": pa.array(a[keep], pa.int64()),
                 "doc_b": pa.array(b[keep], pa.int64()),
                 out_col: pa.array(jac[keep], pa.int64())}
            )

        return inter.map_batches(finish_broadcast, batch_format="pyarrow")

    # big-corpus path: partitioned hash joins (empty-side guard first —
    # an empty dataset loses its schema through Dataset.join)
    inter = inter.materialize()
    if inter.count() == 0:
        return _empty_out
    sizes = src.map_batches(sizes_batch, batch_format="pyarrow")
    # join_partitions is deliberately separate from num_partitions: the
    # hash join spins an actor pool per partition and deadlocks when it
    # exceeds the CPU budget (num_partitions only shapes task-based
    # groupby fan-out, which has no such constraint)
    sizes = join_right(sizes, join_partitions)
    j1 = inter.join(
        sizes, join_type="inner", num_partitions=join_partitions,
        on=("doc_a",), right_on=("doc_id",),
    ).rename_columns({"n": "n_a"})
    j2 = j1.join(
        sizes, join_type="inner", num_partitions=join_partitions,
        on=("doc_b",), right_on=("doc_id",),
    ).rename_columns({"n": "n_b"})

    def finish(batch: pa.Table) -> pa.Table:
        it = batch.column("inter").to_numpy().astype(np.int64)
        na = batch.column("n_a").to_numpy().astype(np.int64)
        nb = batch.column("n_b").to_numpy().astype(np.int64)
        den = np.minimum(na, nb) if containment else na + nb - it
        den = np.maximum(den, 1)
        jac = it * 1_000_000 // den
        keep = jac >= thr
        return pa.table(
            {"doc_a": pa.array(batch.column("doc_a").to_numpy()[keep], pa.int64()),
             "doc_b": pa.array(batch.column("doc_b").to_numpy()[keep], pa.int64()),
             out_col: pa.array(jac[keep], pa.int64())}
        )

    return j2.map_batches(finish, batch_format="pyarrow")


def ngram_containment_pairs(
    ds: "ray.data.Dataset", *, k: int = 5, min_ppm: int = 900_000,
    **kw,
) -> "ray.data.Dataset":
    """(doc_a, doc_b, containment_ppm): exact n-gram CONTAINMENT pairs —
    inter * 1e6 // min(|A|, |B|) >= min_ppm. The quote/boilerplate
    detector: a short doc embedded in a long one scores ~1e6 while its
    Jaccard stays low. Same distributed shingle-inverted-index plan as
    :func:`ngram_jaccard_pairs` (score="containment")."""
    return ngram_jaccard_pairs(ds, k=k, min_ppm=min_ppm,
                               score="containment", **kw)


# all-pairs bitset form: small-scale verifier for the distributed plan

_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


# ---------------------------------------------------------------------------
# Connected components over a near-dup pair list (cluster assignment)

_EMPTY_CLUSTERS = pa.table(
    {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
)

_CC_K1 = np.uint64(0x9E3779B97F4A7C15)
_CC_K2 = np.uint64(0xC2B2AE3D27D4EB4F)


def dup_clusters(
    pairs: "ray.data.Dataset",
    *,
    fine_partitions: int = 32,
    max_iters: int = 64,
) -> "ray.data.Dataset":
    """(doc_id, cluster_id): connected components over an undirected
    near-dup pair list (doc_a, doc_b); cluster_id is the MINIMUM doc_id
    of the component — the canonical representative a downstream dedup
    keeps.

    Distributed hash-to-min (Rastogi et al., "Finding Connected
    Components in Map-Reduce", ICDE 2013): every node maintains a
    cluster set C(v) (initially its neighbourhood plus itself); each
    round every node sends min(C(v)) to all of C(v) and all of C(v) to
    min(C(v)); converges in O(log d) rounds to stars around each
    component minimum. One round == ONE coarse hash-partition shuffle:
    rows partition by hash(u) % fine_partitions and the per-node fine
    grouping (dedup -> sort -> run detection -> vectorized emission)
    runs inside the partition with Arrow/numpy kernels — the house
    partition-bucket pattern (SCALE.md), never a per-node Ray groupby.

    Convergence is detected with a commutative 64-bit multiset
    fingerprint (count + wrap-around sum of mix(u, v)) over the emitted
    edge multiset: the emission is a deterministic function of the
    canonical (deduped) edge set, so equal fingerprints on consecutive
    rounds imply the canonical set reached its fixpoint. The fingerprint
    partials are one tiny row per block; only those reach the driver.

    Scale: the edge list is O(near-dup pairs) — orders of magnitude
    smaller than the corpus after exact-dup collapse (minhash_lsh_pairs
    already collapses identical texts before pair emission). Worst-case
    intermediate growth is the hash-to-min bound O(|E| log n); each
    round's blocks stream through the object store.
    """
    import pyarrow.compute as pc

    fine = int(fine_partitions)

    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(_EMPTY_CLUSTERS)

    def init_edges(b: pa.Table) -> pa.Table:
        a = b.column("doc_a").to_numpy()
        bb = b.column("doc_b").to_numpy()
        # both directions + self loops (self loops make every node its
        # own C-member, so isolated endpoints and minima label themselves)
        u = np.concatenate([a, bb, a, bb])
        v = np.concatenate([bb, a, a, bb])
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())}
        )

    def add_part(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy().astype(np.uint64)
        p = ((u * _CC_K1) % np.uint64(fine)).astype(np.int32)
        return b.append_column("part", pa.array(p, pa.int32()))

    def _runs(t: pa.Table):
        u = t.column("u").to_numpy()
        v = t.column("v").to_numpy()
        n = u.size
        starts = np.concatenate(
            ([0], np.flatnonzero(u[1:] != u[:-1]) + 1, [n])
        )
        return u, v, starts

    def star(g: pa.Table) -> pa.Table:
        # one coarse partition: dedup incoming multiset, then for every
        # node u (a sorted run) emit (x, m) and (m, x) for x in C(u),
        # m = min C(u) (v sorted ascending => m is the run head)
        t = (
            g.select(["u", "v"])
            .group_by(["u", "v"])
            .aggregate([])
            .sort_by([("u", "ascending"), ("v", "ascending")])
        )
        if t.num_rows == 0:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
            )
        u, v, starts = _runs(t)
        lens = np.diff(starts)
        m_row = np.repeat(v[starts[:-1]], lens)
        ou = np.concatenate([v, m_row])
        ov = np.concatenate([m_row, v])
        tt = pa.table(
            {"u": pa.array(ou, pa.int64()), "v": pa.array(ov, pa.int64())}
        )
        return tt.group_by(["u", "v"]).aggregate([])

    def fp_batch(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy().astype(np.uint64)
        v = b.column("v").to_numpy().astype(np.uint64)
        mix = (u * _CC_K1) ^ (v * _CC_K2)
        return pa.table(
            {"n": pa.array([b.num_rows], pa.int64()),
             "s": pa.array([int(mix.sum(dtype=np.uint64))], pa.uint64())}
        )

    def fingerprint(ds: "ray.data.Dataset") -> tuple:
        parts = ds.map_batches(fp_batch, batch_format="pyarrow").take_all()
        n = sum(p["n"] for p in parts)
        s = 0
        for p in parts:
            s = (s + int(p["s"])) & 0xFFFFFFFFFFFFFFFF
        return (n, s)

    edges = pairs.map_batches(init_edges, batch_format="pyarrow")
    prev_fp = None
    for _ in range(max_iters):
        edges = (
            edges.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(star, batch_format="pyarrow")
            .materialize()
        )
        fp = fingerprint(edges)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            "dup_clusters: no convergence in %d rounds" % max_iters
        )

    def part_labels(g: pa.Table) -> pa.Table:
        t = (
            g.select(["u", "v"])
            .group_by(["u", "v"])
            .aggregate([])
            .sort_by([("u", "ascending"), ("v", "ascending")])
        )
        if t.num_rows == 0:
            return _EMPTY_CLUSTERS
        u, v, starts = _runs(t)
        heads = starts[:-1]
        return pa.table(
            {"doc_id": pa.array(u[heads], pa.int64()),
             "cluster_id": pa.array(v[heads], pa.int64())}
        )

    return (
        edges.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_labels, batch_format="pyarrow")
    )


def dedup_keep(
    docs: "ray.data.Dataset",
    clusters: "ray.data.Dataset",
    *,
    num_partitions: int = 4,
) -> "ray.data.Dataset":
    """End-to-end near-dup removal: keep exactly one document (the
    cluster minimum) per near-dup cluster, plus every unclustered doc.

    Returns the kept (doc_id) rows of ``docs``. The drop set (cluster
    members that are not their cluster's minimum) is removed with a
    partitioned left_anti hash join — no driver-side set, no broadcast;
    only the drop ids shuffle. Empty-drop-set degenerates to the input
    (Dataset.join loses the schema of an empty side — CLAUDE.md rule —
    so the drop side is materialized and branched on count()==0)."""
    import pyarrow.compute as pc

    ids = docs.select_columns(["doc_id"])

    def non_canonical(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(b.column("doc_id"), b.column("cluster_id"))
        return b.filter(keep).select(["doc_id"])

    drop = clusters.map_batches(
        non_canonical, batch_format="pyarrow"
    ).materialize()
    if drop.count() == 0:
        return ids
    return ids.join(
        join_right(drop, num_partitions), join_type="left_anti",
        num_partitions=num_partitions, on=("doc_id",),
    )


def ngram_jaccard_pairs_allpairs(
    ds: "ray.data.Dataset", *, k: int = 5, min_ppm: int = 500_000
):
    """Exact char-n-gram Jaccard over all pairs — bitset/popcount
    vectorized (n x n intersections via uint8 AND + a popcount LUT).
    TEST HELPER / verifier only (driver-side O(n^2)): the distributed
    graded path is :func:`ngram_jaccard_pairs`."""
    rows = ds.select_columns(["doc_id", "text"]).take_all()
    sh = {r["doc_id"]: _shingles(r["text"], k) for r in rows}
    ids = sorted(sh)
    n = len(ids)
    if n == 0:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "jaccard_ppm": pa.array([], pa.int64())}
        )
    vocab: dict[bytes, int] = {}
    for d in ids:
        for g in sh[d]:
            if g not in vocab:
                vocab[g] = len(vocab)
    nbytes = (len(vocab) + 7) // 8
    bits = np.zeros((n, nbytes), dtype=np.uint8)
    sizes = np.empty(n, dtype=np.int64)
    for i, d in enumerate(ids):
        idxs = np.fromiter((vocab[g] for g in sh[d]), dtype=np.int64, count=len(sh[d]))
        np.bitwise_or.at(bits[i], idxs >> 3, np.left_shift(1, (idxs & 7)).astype(np.uint8))
        sizes[i] = len(sh[d])
    ids_np = np.array(ids, dtype=np.int64)
    oa, ob, oj = [], [], []
    for i in range(n - 1):
        inter = _POPCOUNT[np.bitwise_and(bits[i], bits[i + 1 :])].sum(axis=1)
        union = sizes[i] + sizes[i + 1 :] - inter
        union[union == 0] = 1
        jac = inter * 1_000_000 // union
        keep = np.flatnonzero(jac >= min_ppm)
        if keep.size:
            oa.extend([int(ids_np[i])] * keep.size)
            ob.extend(ids_np[i + 1 + keep].tolist())
            oj.extend(jac[keep].tolist())
    return pa.table(
        {
            "doc_a": pa.array(oa, pa.int64()),
            "doc_b": pa.array(ob, pa.int64()),
            "jaccard_ppm": pa.array(oj, pa.int64()),
        }
    )


def tf_cosine_pairs(
    ds: "ray.data.Dataset", *, max_df_ppm: int = 800_000,
    min_cos_ppm: int = 900_000, num_partitions: int = 32,
    size_broadcast_limit: int = 4_000_000, join_partitions: int = 4,
) -> "ray.data.Dataset":
    """EXACT term-frequency cosine similarity pairs over a df-capped
    vocabulary — the bag-of-words near-dup / template detector, fully
    distributed via the same term-inverted-index plan as
    :func:`ngram_jaccard_pairs`.

    Semantics: doc vector = per-term tf over terms whose document
    frequency satisfies df*1e6 <= N*max_df_ppm (the df cap prunes
    ubiquitous vocabulary — the standard mitigation for hot-term pair
    explosion: a term in d docs emits C(d,2) partials, so the cap
    bounds per-term work exactly like an LSH bucket size). Output
    (doc_a, doc_b, cos_ppm), doc_a < doc_b,
    cos_ppm = floor(dot*1e6 / sqrt(n2_a*n2_b)) >= min_cos_ppm.

    Exactness/determinism: every partial (dot products, squared norms)
    is an INTEGER sum, so partitioning never changes them; the single
    float step (sqrt + divide on exact int64 inputs) is correctly
    rounded IEEE in both numpy and DuckDB, so the ppm value is
    partition- and engine-independent. (n2_a*n2_b must stay below
    2^53 for the float sqrt to be exact-input — holds through ~1e7
    weighted tokens per doc. The product is computed in float64 —
    identical to the int64 product below 2^53, since both routes round
    the same exact value — so docs past the bound degrade to a
    correctly-rounded float product instead of silent int64 wraparound;
    note DuckDB's BIGINT n2_a*n2_b raises past 2^63 where this path
    still returns a float-rounded answer.)

    Plan: per-batch per-doc tf rows partitioned by crc32(term) ->
    per-partition term runs apply the df cap (a term lands wholly in
    one partition, so its df is exact there) and emit locally-combined
    integer pair-dot partials PLUS per-doc squared-norm partials ->
    pair partials re-partitioned by pair hash and Arrow-summed ->
    norms attached via the sizes broadcast / partitioned-join
    short-circuit pattern of ngram_jaccard_pairs.
    """
    import zlib
    from collections import Counter

    import pyarrow.compute as pc

    from textindex_ray.functions.textstats import _tokens

    from textindex_ray.functions._util import probe_count

    P = int(num_partitions)
    ds, n_docs = probe_count(ds)
    _EMPTY_COS = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         "cos_ppm": pa.array([], pa.int64())}
    )
    if n_docs == 0:
        # schema-preserving degenerate result (0-row Datasets lose
        # their schema through pandas conversion)
        return _EMPTY_COS
    df_thr = n_docs * int(max_df_ppm)  # keep term iff df*1e6 <= df_thr

    def explode(batch: pa.Table) -> pa.Table:
        out_d: list = []
        out_t: list = []
        out_f: list = []
        out_p: list = []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for w, c in Counter(_tokens(t)).items():
                out_d.append(d)
                out_t.append(w)
                out_f.append(c)
                out_p.append(zlib.crc32(w.encode("utf-8")) % P)
        return pa.table(
            {"doc_id": pa.array(out_d, pa.int64()),
             "term": pa.array(out_t, pa.string()),
             "tf": pa.array(out_f, pa.int64()),
             "part": pa.array(out_p, pa.int32())}
        )

    _EMPTY_PART = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         "c": pa.array([], pa.int64())}
    )

    def part_pairs(g: pa.Table) -> pa.Table:
        """Pair-dot partials + norm partials (doc_b == -1 marker rows)
        of one term partition, df cap applied per term run."""
        t = g.sort_by([("term", "ascending"), ("doc_id", "ascending")])
        term = t.column("term").combine_chunks()
        ids = t.column("doc_id").to_numpy()
        tf = t.column("tf").to_numpy().astype(np.int64)
        n = ids.size
        if n == 0:
            return _EMPTY_PART
        eq = pc.equal(term.slice(1, n - 1), term.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        starts = np.concatenate(([0], np.flatnonzero(~eq) + 1, [n]))
        oa, ob, oc = [], [], []
        norm_acc: Counter = Counter()
        for s, e in zip(starts[:-1], starts[1:]):
            run = e - s
            if run * 1_000_000 > df_thr:  # df cap (df == run length)
                continue
            seg_ids = ids[s:e]
            seg_tf = tf[s:e]
            for d, f in zip(seg_ids.tolist(), seg_tf.tolist()):
                norm_acc[d] += f * f
            if run < 2:
                continue
            iu, ju = np.triu_indices(run, k=1)
            oa.append(seg_ids[iu])
            ob.append(seg_ids[ju])
            oc.append(seg_tf[iu] * seg_tf[ju])
        parts = []
        if oa:
            tt = pa.table(
                {"doc_a": pa.array(np.concatenate(oa), pa.int64()),
                 "doc_b": pa.array(np.concatenate(ob), pa.int64()),
                 "c": pa.array(np.concatenate(oc), pa.int64())}
            )
            cg = tt.group_by(["doc_a", "doc_b"]).aggregate([("c", "sum")])
            parts.append(pa.table(
                {"doc_a": cg.column("doc_a"), "doc_b": cg.column("doc_b"),
                 "c": cg.column("c_sum").cast(pa.int64())}
            ))
        if norm_acc:
            nd = sorted(norm_acc)
            parts.append(pa.table(
                {"doc_a": pa.array(nd, pa.int64()),
                 "doc_b": pa.array([-1] * len(nd), pa.int64()),
                 "c": pa.array([norm_acc[d] for d in nd], pa.int64())}
            ))
        if not parts:
            return _EMPTY_PART
        return pa.concat_tables(parts)

    def add_pair_part(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy().astype(np.uint64)
        b = batch.column("doc_b").to_numpy().astype(np.uint64)
        h = a * np.uint64(0x9E3779B97F4A7C15) + b * np.uint64(0xC2B2AE3D27D4EB4F)
        return batch.append_column(
            "part", pa.array((h % np.uint64(P)).astype(np.int32), pa.int32())
        )

    def part_sum(g: pa.Table) -> pa.Table:
        cg = g.group_by(["doc_a", "doc_b"]).aggregate([("c", "sum")])
        return pa.table(
            {"doc_a": cg.column("doc_a"), "doc_b": cg.column("doc_b"),
             "c": cg.column("c_sum").cast(pa.int64())}
        )

    combined = (
        ds.select_columns(["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pyarrow")
        .map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_sum, batch_format="pyarrow")
    )
    thr = int(min_cos_ppm)

    # norms are ONE int64 per doc with any kept term: broadcast while they
    # fit (ngram_jaccard_pairs pattern), partitioned joins above the limit
    def split_mask(keep_norms: bool):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.equal(b.column("doc_b"), -1)
            return b.filter(m if keep_norms else pc.invert(m))
        return fn

    combined = combined.materialize()  # consumed by two branches
    norms_ds = combined.map_batches(split_mask(True), batch_format="pyarrow")
    pairs_ds = combined.map_batches(split_mask(False), batch_format="pyarrow")

    nid_parts, nn_parts, too_big, total = [], [], False, 0
    for bt in norms_ds.iter_batches(batch_format="pyarrow"):
        total += bt.num_rows
        if total > size_broadcast_limit:
            too_big = True
            break
        nid_parts.append(bt.column("doc_a").to_numpy())
        nn_parts.append(bt.column("c").to_numpy())

    if not too_big:
        if total == 0:
            return _EMPTY_COS
        nid = np.concatenate(nid_parts)
        nn = np.concatenate(nn_parts).astype(np.int64)
        order = np.argsort(nid)
        ref = ray.put((nid[order], nn[order]))

        def finish(batch: pa.Table) -> pa.Table:
            ids_s, n2_s = ray.get(ref)
            a = batch.column("doc_a").to_numpy()
            b = batch.column("doc_b").to_numpy()
            dot = batch.column("c").to_numpy().astype(np.int64)
            n2a = n2_s[np.searchsorted(ids_s, a)]
            n2b = n2_s[np.searchsorted(ids_s, b)]
            ppm = np.floor(
                dot.astype(np.float64) * 1e6
                / np.sqrt(n2a.astype(np.float64) * n2b.astype(np.float64))
            ).astype(np.int64)
            keep = ppm >= thr
            return pa.table(
                {"doc_a": pa.array(a[keep], pa.int64()),
                 "doc_b": pa.array(b[keep], pa.int64()),
                 "cos_ppm": pa.array(ppm[keep], pa.int64())}
            )

        return pairs_ds.map_batches(finish, batch_format="pyarrow")

    # big-corpus path: partitioned hash joins (empty-side guard first)
    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() == 0:
        return _EMPTY_COS
    norms_j = norms_ds.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_a"),
                            "n2": b.column("c")}),
        batch_format="pyarrow",
    )
    norms_j = join_right(norms_j, join_partitions)
    j1 = pairs_ds.join(
        norms_j, join_type="inner", num_partitions=join_partitions,
        on=("doc_a",), right_on=("doc_id",),
    ).rename_columns({"n2": "n2_a"})
    j2 = j1.join(
        norms_j, join_type="inner", num_partitions=join_partitions,
        on=("doc_b",), right_on=("doc_id",),
    ).rename_columns({"n2": "n2_b"})

    def finish_joined(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        dot = batch.column("c").to_numpy().astype(np.int64)
        n2a = batch.column("n2_a").to_numpy().astype(np.int64)
        n2b = batch.column("n2_b").to_numpy().astype(np.int64)
        ppm = np.floor(
            dot.astype(np.float64) * 1e6
            / np.sqrt(n2a.astype(np.float64) * n2b.astype(np.float64))
        ).astype(np.int64)
        keep = ppm >= thr
        return pa.table(
            {"doc_a": pa.array(a[keep], pa.int64()),
             "doc_b": pa.array(b[keep], pa.int64()),
             "cos_ppm": pa.array(ppm[keep], pa.int64())}
        )

    return j2.map_batches(finish_joined, batch_format="pyarrow")


def decontaminate(
    ds: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    *,
    k: int = 5,
    num_partitions: int = 32,
    bench_broadcast_limit: int = 4_000_000,
) -> "ray.data.Dataset":
    """Benchmark decontamination: per training document, the EXACT count
    of its distinct char k-shingles that appear anywhere in the
    benchmark set — the eval-leakage gate of a training-data pipeline.
    Output (doc_id, n_hits, n_shingles, hit_ppm) for EVERY input doc
    (zero-shingle docs emit 0/0/0); hit_ppm = n_hits*1e6 // n_shingles.
    All-integer, so the SQL oracle (shingle CTE + LEFT JOIN on the
    benchmark's distinct shingles) matches bit-for-bit.

    Two plans, picked by benchmark size:

    - broadcast (eval sets are small — the common case): the
      benchmark's distinct shingles are streamed into one driver set,
      ``ray.put`` once, and each doc batch counts membership locally —
      one pass over each side, no shuffle. EXACT byte-string
      membership, not hashes: a 64-bit hash collision would inflate a
      count and break oracle identity.
    - partitioned (benchmark above ``bench_broadcast_limit`` shingles):
      both sides explode to (g, part=crc32(g)%P) rows (doc side keeps
      doc_id; zero-shingle docs emit one PAD row so they surface in the
      output); groupby(part) builds the partition's benchmark set and
      emits per-doc (hits, total) partials; a second doc-hash
      groupby sums partials. Two coarse shuffles, no driver state —
      the 100-TB shape. Bit-identical to the broadcast path (pytest).
    """
    import zlib

    out_schema = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_hits": pa.array([], pa.int64()),
         "n_shingles": pa.array([], pa.int64()),
         "hit_ppm": pa.array([], pa.int64())}
    )
    from textindex_ray.functions._util import probe_count

    ds, n_docs = probe_count(ds)
    if n_docs == 0:
        return out_schema
    P = int(num_partitions)

    def bench_shingles(batch: pa.Table) -> pa.Table:
        out: set = set()
        for t in batch.column("text").to_pylist():
            out |= _shingles(t, k)
        return pa.table({"g": pa.array(sorted(out), pa.binary())})

    bset: set = set()
    too_big = False
    for bt in bench.map_batches(
        bench_shingles, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        bset.update(bt.column("g").to_pylist())
        if len(bset) > bench_broadcast_limit:
            too_big = True
            break

    if not too_big:
        ref = ray.put(bset)

        def count_hits(batch: pa.Table) -> pa.Table:
            bs = ray.get(ref)
            ids, hits, tot, ppm = [], [], [], []
            for d, t in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                sh = _shingles(t, k)
                h = sum(1 for g in sh if g in bs)
                n = len(sh)
                ids.append(d)
                hits.append(h)
                tot.append(n)
                ppm.append((h * 1_000_000) // n if n else 0)
            return pa.table(
                {"doc_id": pa.array(ids, pa.int64()),
                 "n_hits": pa.array(hits, pa.int64()),
                 "n_shingles": pa.array(tot, pa.int64()),
                 "hit_ppm": pa.array(ppm, pa.int64())}
            )

        return ds.select_columns(["doc_id", "text"]).map_batches(
            count_hits, batch_format="pyarrow"
        )

    # partitioned path: explode both sides, membership inside partitions
    del bset

    def explode_docs(batch: pa.Table) -> pa.Table:
        out_d, out_g, out_p, out_pad = [], [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sh = _shingles(t, k)
            if not sh:
                # PAD row: zero-shingle docs must still reach a
                # partition to emit their (0, 0) partial
                out_d.append(d)
                out_g.append(b"")
                out_p.append(0)
                out_pad.append(True)
                continue
            out_d.extend([d] * len(sh))
            out_g.extend(sh)
            out_p.extend(zlib.crc32(s) % P for s in sh)
            out_pad.extend([False] * len(sh))
        return pa.table(
            {"doc_id": pa.array(out_d, pa.int64()),
             "g": pa.array(out_g, pa.binary()),
             "part": pa.array(out_p, pa.int32()),
             "pad": pa.array(out_pad, pa.bool_()),
             "side": pa.array([0] * len(out_d), pa.int8())}
        )

    def explode_bench(batch: pa.Table) -> pa.Table:
        out: set = set()
        for t in batch.column("text").to_pylist():
            out |= _shingles(t, k)
        gs = sorted(out)
        return pa.table(
            {"doc_id": pa.array([-1] * len(gs), pa.int64()),
             "g": pa.array(gs, pa.binary()),
             "part": pa.array([zlib.crc32(s) % P for s in gs], pa.int32()),
             "pad": pa.array([False] * len(gs), pa.bool_()),
             "side": pa.array([1] * len(gs), pa.int8())}
        )

    tagged = ds.select_columns(["doc_id", "text"]).map_batches(
        explode_docs, batch_format="pyarrow"
    ).union(bench.map_batches(explode_bench, batch_format="pyarrow"))

    def part_partials(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("side").to_numpy()
        bench_set = set(g.filter(pa.array(side == 1)).column("g").to_pylist())
        dd = g.filter(pa.array(side == 0))
        ids = dd.column("doc_id").to_numpy()
        pads = dd.column("pad").to_numpy(zero_copy_only=False)
        gs = dd.column("g").to_pylist()
        hit = np.fromiter(
            (gg in bench_set for gg in gs), np.int64, len(gs)
        ) if len(gs) else np.empty(0, np.int64)
        tot = (~pads).astype(np.int64)
        hit = hit * tot  # pad rows count nothing
        t = pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "h": pa.array(hit, pa.int64()),
             "n": pa.array(tot, pa.int64())}
        ).group_by(["doc_id"]).aggregate([("h", "sum"), ("n", "sum")])
        ids2 = t.column("doc_id").to_numpy().astype(np.uint64)
        dpart = (
            (ids2 * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(P)
        ).astype(np.int32)
        return pa.table(
            {"doc_id": t.column("doc_id").cast(pa.int64()),
             "h": t.column("h_sum").cast(pa.int64()),
             "n": t.column("n_sum").cast(pa.int64()),
             "dpart": pa.array(dpart, pa.int32())}
        )

    def doc_sum(g: pa.Table) -> pa.Table:
        t = g.group_by(["doc_id"]).aggregate([("h", "sum"), ("n", "sum")])
        h = t.column("h_sum").to_numpy().astype(np.int64)
        n = t.column("n_sum").to_numpy().astype(np.int64)
        ppm = np.where(n > 0, (h * 1_000_000) // np.maximum(n, 1), 0)
        return pa.table(
            {"doc_id": t.column("doc_id").cast(pa.int64()),
             "n_hits": pa.array(h, pa.int64()),
             "n_shingles": pa.array(n, pa.int64()),
             "hit_ppm": pa.array(ppm, pa.int64())}
        )

    return (
        tagged.groupby("part")
        .map_groups(part_partials, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(doc_sum, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# duplicated-span measurement (exact-substring dedup, Lee et al. 2022 style)

def dup_ngram_stats(
    ds: "ray.data.Dataset",
    *,
    n: int = 8,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Per-document duplicated token-n-gram fraction: for each doc, the
    EXACT count of its DISTINCT n-token grams that also appear in at
    least one OTHER document (cross-doc document frequency >= 2) — the
    corpus-level duplicated-span measure behind exact-substring
    deduplication ("Deduplicating Training Data Makes Language Models
    Better", Lee et al. 2022), as a per-doc filterable statistic rather
    than pair lists (contrast ``ngram_jaccard_pairs``).

    Output (doc_id, n_dup, n_total, dup_ppm) for EVERY input doc;
    docs with fewer than ``n`` tokens emit (0, 0, 0);
    dup_ppm = n_dup * 1e6 // n_total. All-integer, so the SQL oracle
    (token-array slicing CTE + gram-df self-join) matches bit-for-bit.

    Plan (two coarse shuffles, no driver state — the 100-TB shape):
    explode per-doc DISTINCT grams to (doc_id, g, part=crc32(g) % P)
    rows (a gram lives entirely in one partition, so within-partition
    df IS global df); groupby(part) dictionary-encodes grams, bincounts
    df, flags rows with df >= 2, and pre-aggregates per-doc partials;
    a doc-hash groupby sums partials into final ppm rows. Exact byte
    grams travel the shuffle (never 64-bit hashes: one collision would
    inflate a count and break oracle identity).
    """
    import zlib

    from textindex_ray.functions._util import probe_count
    from textindex_ray.functions.textstats import _tokens

    out_schema = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_dup": pa.array([], pa.int64()),
         "n_total": pa.array([], pa.int64()),
         "dup_ppm": pa.array([], pa.int64())}
    )
    ds, n_docs = probe_count(ds)
    if n_docs == 0:
        return out_schema
    P = int(num_partitions)

    def explode(batch: pa.Table) -> pa.Table:
        out_d, out_g, out_p, out_pad = [], [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = _tokens(t)
            grams = {
                " ".join(toks[i : i + n]).encode("utf-8")
                for i in range(len(toks) - n + 1)
            }
            if not grams:
                # PAD row: short docs must still reach a partition to
                # emit their (0, 0) partial (part=P is a sentinel no
                # crc32(g) % P value can hit)
                out_d.append(d)
                out_g.append(b"")
                out_p.append(P)
                out_pad.append(True)
                continue
            out_d.extend([d] * len(grams))
            out_g.extend(grams)
            out_p.extend(zlib.crc32(g) % P for g in grams)
            out_pad.extend([False] * len(grams))
        return pa.table(
            {"doc_id": pa.array(out_d, pa.int64()),
             "g": pa.array(out_g, pa.binary()),
             "part": pa.array(out_p, pa.int32()),
             "pad": pa.array(out_pad, pa.bool_())}
        )

    def part_partials(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        pads = g.column("pad").to_numpy(zero_copy_only=False)
        tot = (~pads).astype(np.int64)
        if bool(pads.all()):
            dup = np.zeros(len(ids), np.int64)
        else:
            # rows are distinct (doc, gram), so per-gram row count IS
            # the cross-doc document frequency
            enc = g.column("g").combine_chunks().dictionary_encode()
            codes = enc.indices.to_numpy().astype(np.int64)
            df = np.bincount(codes)
            dup = (df[codes] >= 2).astype(np.int64) * tot
        t = pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "h": pa.array(dup, pa.int64()),
             "n": pa.array(tot, pa.int64())}
        ).group_by(["doc_id"]).aggregate([("h", "sum"), ("n", "sum")])
        ids2 = t.column("doc_id").to_numpy().astype(np.uint64)
        dpart = (
            (ids2 * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(P)
        ).astype(np.int32)
        return pa.table(
            {"doc_id": t.column("doc_id").cast(pa.int64()),
             "h": t.column("h_sum").cast(pa.int64()),
             "n": t.column("n_sum").cast(pa.int64()),
             "dpart": pa.array(dpart, pa.int32())}
        )

    def doc_sum(g: pa.Table) -> pa.Table:
        t = g.group_by(["doc_id"]).aggregate([("h", "sum"), ("n", "sum")])
        h = t.column("h_sum").to_numpy().astype(np.int64)
        nn = t.column("n_sum").to_numpy().astype(np.int64)
        ppm = np.where(nn > 0, (h * 1_000_000) // np.maximum(nn, 1), 0)
        return pa.table(
            {"doc_id": t.column("doc_id").cast(pa.int64()),
             "n_dup": pa.array(h, pa.int64()),
             "n_total": pa.array(nn, pa.int64()),
             "dup_ppm": pa.array(ppm, pa.int64())}
        )

    return (
        ds.select_columns(["doc_id", "text"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_partials, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(doc_sum, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# corpus-level paragraph (line) dedup, C4 / Dolma style

def paragraph_dedup_stats(
    ds: "ray.data.Dataset",
    *,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """C4-style corpus-level line deduplication, as per-doc statistics:
    every newline-delimited line in the corpus survives only at its
    FIRST occurrence in (doc_id, line_idx) order; all later occurrences
    (in other docs or later in the same doc) are removed ("Exploring the
    Limits of Transfer Learning..." C4 pipeline, three-sentence-span
    dedup; here at line granularity like Dolma's paragraph dedupe).

    Output (doc_id, n_lines, kept_lines, kept_chars) for every doc with
    at least one line; ``text == ''`` docs have NO lines (the SQL
    ``string_split('', chr(10)) = []`` contract, see repetition_batch)
    and are absent from the output. All-integer, so the SQL oracle (a
    row_number() window over exploded lines) matches bit-for-bit.

    Plan (the dup_ngram_stats two-shuffle shape, no driver state):
    1. explode each batch's lines, COMBINE per distinct line to one
       (line_hash, min occurrence key, len) partial — the shuffle moves
       one row per distinct-line-per-batch, never one per occurrence;
    2. groupby(part = crc32-prefix of the line hash): a line lives
       wholly in one partition, so the partition min of the occurrence
       key IS the global first; winners pre-aggregate per doc to
       (doc_id, kept_lines, kept_chars) partials;
    3. union with a cheap per-doc local pass (doc_id, n_lines) and one
       doc-hash groupby sums partials into final rows.
    Occurrence keys are 32-hex-char strings "%016x%016x" % (doc_id,
    line_idx) — string min == tuple min (doc_ids are non-negative by
    the docID contract). Dedup is by md5(line): a collision would merge
    two distinct lines, vanishingly unlikely and accepted corpus-wide
    (same tradeoff as exact_dedup_groups).
    """
    from textindex_ray.functions._util import probe_count

    out_schema = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_lines": pa.array([], pa.int64()),
         "kept_lines": pa.array([], pa.int64()),
         "kept_chars": pa.array([], pa.int64())}
    )
    # probe_count: empty guard + materialize-once for derived inputs
    # (this operator consumes ds TWICE — winner relation + local pass)
    ds, n_docs = probe_count(ds.select_columns(["doc_id", "text"]))
    if n_docs == 0:
        return out_schema
    P = int(num_partitions)
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def explode_lines(batch: pa.Table) -> pa.Table:
        # one partial per distinct line per batch: (md5, min key, len)
        best: dict[bytes, tuple[str, int]] = {}
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if d < 0:
                # the hex occurrence key cannot encode negatives —
                # silent mis-sorting otherwise, so fail loud
                raise ValueError(
                    "paragraph_dedup_stats requires non-negative doc_id")
            lines = t.split("\n") if t else []
            for i, ln in enumerate(lines, start=1):
                lh = hashlib.md5(ln.encode("utf-8")).digest()
                key = "%016x%016x" % (d, i)
                cur = best.get(lh)
                if cur is None or key < cur[0]:
                    best[lh] = (key, len(ln))
        if not best:
            # PAD partial: a batch of all-empty texts must still flow
            # through BOTH groupbys, or a corpus of only empty texts
            # makes every relation zero-row and the groupby loses the
            # output schema (the all-empty-groups map_groups hazard).
            # lh=b'' is unreachable by real lines (theirs is a 16-byte
            # md5 digest); key='' decodes to the pad doc_id -1,
            # dropped after doc_sum.
            best[b""] = ("", 0)
        lhs = list(best)
        return pa.table(
            {"lh": pa.array(lhs, pa.binary()),
             "key": pa.array([best[h][0] for h in lhs], pa.string()),
             "nch": pa.array([best[h][1] for h in lhs], pa.int64()),
             "part": pa.array(
                 [int.from_bytes(h[:4], "big") % P for h in lhs], pa.int32()
             )}
        )

    def part_winners(g: pa.Table) -> pa.Table:
        # global first occurrence per line (min key), then per-doc
        # winner partials
        t = g.group_by("lh").aggregate([("key", "min"), ("nch", "min")])
        keys = t.column("key_min").to_pylist()
        doc = np.array([int(k[:16], 16) if k else -1 for k in keys], np.int64)
        nch = t.column("nch_min").to_numpy().astype(np.int64)
        w = pa.table(
            {"doc_id": pa.array(doc, pa.int64()),
             "kept": pa.array(np.ones(len(doc), np.int64), pa.int64()),
             "chars": pa.array(nch, pa.int64())}
        ).group_by("doc_id").aggregate([("kept", "sum"), ("chars", "sum")])
        ids = w.column("doc_id").to_numpy().astype(np.uint64)
        dpart = ((ids * GOLD) % np.uint64(P)).astype(np.int32)
        z = np.zeros(len(ids), np.int64)
        return pa.table(
            {"doc_id": w.column("doc_id").cast(pa.int64()),
             "n_lines": pa.array(z, pa.int64()),
             "kept_lines": w.column("kept_sum").cast(pa.int64()),
             "kept_chars": w.column("chars_sum").cast(pa.int64()),
             "dpart": pa.array(dpart, pa.int32())}
        )

    def doc_local(batch: pa.Table) -> pa.Table:
        ids, nls = [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            nl = len(t.split("\n")) if t else 0
            if nl:
                ids.append(d)
                nls.append(nl)
        if not ids:
            # PAD row: a batch of all-empty texts must still reach the
            # final groupby, or a corpus of only empty texts makes every
            # relation zero-row and the groupby loses the output schema
            # (the all-empty-groups map_groups hazard); pads are dropped
            # after doc_sum
            ids, nls = [-1], [0]
        a = np.asarray(ids, np.int64).astype(np.uint64)
        dpart = ((a * GOLD) % np.uint64(P)).astype(np.int32)
        z = np.zeros(len(ids), np.int64)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "n_lines": pa.array(nls, pa.int64()),
             "kept_lines": pa.array(z, pa.int64()),
             "kept_chars": pa.array(z, pa.int64()),
             "dpart": pa.array(dpart, pa.int32())}
        )

    def doc_sum(g: pa.Table) -> pa.Table:
        t = g.group_by("doc_id").aggregate(
            [("n_lines", "sum"), ("kept_lines", "sum"), ("kept_chars", "sum")]
        )
        return pa.table(
            {"doc_id": t.column("doc_id").cast(pa.int64()),
             "n_lines": t.column("n_lines_sum").cast(pa.int64()),
             "kept_lines": t.column("kept_lines_sum").cast(pa.int64()),
             "kept_chars": t.column("kept_chars_sum").cast(pa.int64())}
        )

    def drop_pad(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater_equal(b.column("doc_id"), 0))

    winners = (
        ds.map_batches(explode_lines, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_winners, batch_format="pyarrow")
    )
    local = ds.map_batches(doc_local, batch_format="pyarrow")
    return (
        winners.union(local)
        .groupby("dpart")
        .map_groups(doc_sum, batch_format="pyarrow")
        .map_batches(drop_pad, batch_format="pyarrow")
    )


def paragraph_dedup_keep(
    ds: "ray.data.Dataset",
    *,
    num_partitions: int = 32,
    join_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Apply C4-style corpus-level line dedup: return (doc_id, text)
    for EVERY input doc with all non-first line occurrences removed
    (first = minimum (doc_id, line_idx), exactly
    paragraph_dedup_stats' winners; remaining lines re-join with
    '\\n'; a doc whose every line loses — or whose text was empty —
    comes back with text='').

    Plan (one co-partitioned winner flag pass + one doc join):
    occurrences explode to (lh, key, doc_id, idx, part) rows; within
    one lh-prefix partition the min key IS the global winner, so each
    partition flags its kept occurrences locally — no second shuffle
    for the winner join. A per-doc SENTINEL occurrence (lh =
    b'\\x00'+doc_id bytes, 17 bytes — no 16-byte md5 can collide)
    always survives, guaranteeing every doc one row so the final
    docs join is a plain inner join. Kept indexes aggregate per doc,
    join back to the docs table (both sides join_right-wrapped — the
    zero-row-block hazard), and a map reconstructs the text.
    """
    from textindex_ray.functions._util import join_right, probe_count

    out_schema = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "text": pa.array([], pa.string())}
    )
    ds, n_docs = probe_count(ds.select_columns(["doc_id", "text"]))
    if n_docs == 0:
        return out_schema
    P = int(num_partitions)

    def explode(batch: pa.Table) -> pa.Table:
        lhs, keys, dids, idxs, parts = [], [], [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if d < 0:
                raise ValueError(
                    "paragraph_dedup_keep requires non-negative doc_id")
            # sentinel: unique hash per doc, idx 0 (real lines are
            # 1-based), always its own winner
            lhs.append(b"\x00" + d.to_bytes(8, "big"))
            keys.append("%016x%016x" % (d, 0))
            dids.append(d)
            idxs.append(0)
            for i, ln in enumerate(t.split("\n") if t else [], start=1):
                lhs.append(hashlib.md5(ln.encode("utf-8")).digest())
                keys.append("%016x%016x" % (d, i))
                dids.append(d)
                idxs.append(i)
        parts = [int.from_bytes(h[:4], "big") % P for h in lhs]
        return pa.table(
            {"lh": pa.array(lhs, pa.binary()),
             "key": pa.array(keys, pa.string()),
             "doc_id": pa.array(dids, pa.int64()),
             "idx": pa.array(idxs, pa.int64()),
             "part": pa.array(parts, pa.int32())}
        )

    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def flag_kept(g: pa.Table) -> pa.Table:
        # min key per lh within the partition == global first occurrence
        win = g.group_by("lh").aggregate([("key", "min")])
        wmap = dict(zip(win.column("lh").to_pylist(),
                        win.column("key_min").to_pylist()))
        keep = pa.array(
            [wmap[h] == k for h, k in zip(g.column("lh").to_pylist(),
                                          g.column("key").to_pylist())]
        )
        t = g.filter(keep)
        ids = t.column("doc_id").to_numpy().astype(np.uint64)
        dpart = ((ids * GOLD) % np.uint64(P)).astype(np.int32)
        return pa.table(
            {"doc_id": t.column("doc_id"), "idx": t.column("idx"),
             "dpart": pa.array(dpart, pa.int32())}
        )

    def per_part_docs(g: pa.Table) -> pa.Table:
        # coarse doc-hash partition, fine per-doc grouping in-task (the
        # exact_dedup_groups shape — one Ray group per doc would pay
        # ~0.2 ms of Python per doc)
        t = g.sort_by([("doc_id", "ascending"), ("idx", "ascending")])
        ids = t.column("doc_id").to_numpy()
        idxs = t.column("idx").to_numpy()
        starts = np.concatenate(([0], np.flatnonzero(ids[1:] != ids[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(ids)]))
        # flat string encoding: Acero's hash join (Dataset.join) rejects
        # nested payload columns, so the kept-index list travels as a
        # comma-joined ascii column and rebuild() parses it back
        return pa.table(
            {"doc_id": pa.array(ids[starts], pa.int64()),
             "idxs": pa.array(
                 [",".join(map(str, idxs[s:e])) for s, e in
                  zip(starts, ends)], pa.string())}
        )

    kept_lists = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(flag_kept, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(per_part_docs, batch_format="pyarrow")
    )

    def rebuild(batch: pa.Table) -> pa.Table:
        texts = []
        for t, enc in zip(batch.column("text").to_pylist(),
                          batch.column("idxs").to_pylist()):
            idxs = [int(x) for x in enc.split(",")] if enc else []
            lines = t.split("\n") if t else []
            texts.append("\n".join(lines[i - 1] for i in idxs if i > 0))
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "text": pa.array(texts, pa.string())}
        )

    # join_partitions is deliberately separate from num_partitions: the
    # hash join spins num_partitions aggregator ACTORS (0.125 CPU each)
    # and deadlocks a small session when they swallow the CPU budget —
    # task-based groupby fan-out above has no such constraint. Default
    # scales with cluster CPUs (floor 4) so the joined relation is not
    # squeezed into a handful of giant blocks on a big cluster.
    from textindex_ray.functions._util import default_join_partitions

    J = int(join_partitions) if join_partitions else default_join_partitions()
    joined = join_right(kept_lists, J).join(
        join_right(ds, J), join_type="inner", num_partitions=J,
        on=("doc_id",),
    )
    return joined.map_batches(rebuild, batch_format="pyarrow")


def dup_ngram_remove(
    ds: "ray.data.Dataset",
    *,
    n: int = 8,
    num_partitions: int = 32,
    join_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Apply exact-substring dedup at token-n-gram granularity (the
    applied transform behind Lee et al. 2022, as
    :func:`paragraph_dedup_keep` is to C4 line dedup): for every
    duplicated n-gram occurrence that is NOT the global first
    occurrence (minimum (doc_id, position) over the whole corpus), all
    n covered token slots are removed; a token survives iff no losing
    occurrence covers it. Output (doc_id, n_tokens, n_removed,
    kept_text) for EVERY input doc — kept_text is the surviving
    lowercase token stream space-joined (token semantics identical to
    :func:`dup_ngram_stats`; docs with fewer than ``n`` tokens keep
    everything). All-integer counts + deterministic winners, so the
    SQL oracle (token index CTE + gram row_number + coverage BETWEEN
    join) matches bit-for-bit.

    Plan (two coarse shuffles + one doc join, no driver state): all
    gram OCCURRENCES explode to (g, doc_id, pos, part=crc32(g) % P)
    rows — a gram lives wholly in one partition, so the partition-min
    (doc_id, pos) IS the global winner; each partition emits its
    LOSING positions pre-aggregated to one row per doc (comma-joined
    ascii, the paragraph_dedup_keep flat encoding — Acero joins reject
    nested payloads); a doc-hash groupby concatenates partition
    partials; the docs join (both sides join_right-wrapped, CPU-scaled
    ``join_partitions``) feeds a vectorized interval-coverage rebuild
    (difference array + cumsum over token slots). A per-doc SENTINEL
    row (part = P, pos = -1) guarantees every doc one losers row so
    the final join is a plain inner join. Exact byte grams travel the
    exchange (a hash collision would merge two grams' winner chains
    and break oracle identity).
    """
    import zlib

    from textindex_ray.functions._util import (
        default_join_partitions,
        join_right,
        probe_count,
    )
    from textindex_ray.functions.textstats import _tokens

    out_schema = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "n_tokens": pa.array([], pa.int64()),
         "n_removed": pa.array([], pa.int64()),
         "kept_text": pa.array([], pa.string())}
    )
    ds, n_docs = probe_count(ds.select_columns(["doc_id", "text"]))
    if n_docs == 0:
        return out_schema
    P = int(num_partitions)
    N = int(n)
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def explode(batch: pa.Table) -> pa.Table:
        out_g, out_d, out_i, out_p = [], [], [], []
        for d, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            if d < 0:
                raise ValueError("dup_ngram_remove requires non-negative doc_id")
            # sentinel: every doc must emit one losers row (pos = -1)
            out_g.append(b"\x00" + d.to_bytes(8, "big"))
            out_d.append(d)
            out_i.append(-1)
            out_p.append(P)
            toks = _tokens(t)
            for i in range(len(toks) - N + 1):
                g = " ".join(toks[i : i + N]).encode("utf-8")
                out_g.append(g)
                out_d.append(d)
                out_i.append(i)
                out_p.append(zlib.crc32(g) % P)
        return pa.table(
            {"g": pa.array(out_g, pa.binary()),
             "doc_id": pa.array(out_d, pa.int64()),
             "pos": pa.array(out_i, pa.int64()),
             "part": pa.array(out_p, pa.int32())}
        )

    def part_losers(g: pa.Table) -> pa.Table:
        # partition-min (doc_id, pos) per gram == global winner
        t = g.sort_by([("g", "ascending"), ("doc_id", "ascending"),
                       ("pos", "ascending")])
        ids = t.column("doc_id").to_numpy()
        poss = t.column("pos").to_numpy()
        gs = t.column("g")
        if int(t.column("part")[0].as_py()) == P:
            # sentinel partition: every row is its own (pad) loser row
            lose_ids, lose_pos = ids, poss
        else:
            gcodes = gs.combine_chunks().dictionary_encode().indices.to_numpy()
            first = np.concatenate(([True], gcodes[1:] != gcodes[:-1]))
            lose_ids, lose_pos = ids[~first], poss[~first]
        # pre-aggregate: one row per doc per partition
        order = np.lexsort((lose_pos, lose_ids))
        lose_ids, lose_pos = lose_ids[order], lose_pos[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(lose_ids[1:] != lose_ids[:-1]) + 1)
        ) if len(lose_ids) else np.array([], np.int64)
        ends = np.concatenate((starts[1:], [len(lose_ids)])) if len(
            lose_ids) else np.array([], np.int64)
        d_out = lose_ids[starts.astype(np.int64)] if len(lose_ids) else lose_ids
        enc = [
            ",".join(map(str, lose_pos[s:e]))
            for s, e in zip(starts, ends)
        ]
        dpart = ((d_out.astype(np.uint64) * GOLD) % np.uint64(P)).astype(np.int32)
        return pa.table(
            {"doc_id": pa.array(d_out.astype(np.int64), pa.int64()),
             "poss": pa.array(enc, pa.string()),
             "dpart": pa.array(dpart, pa.int32())}
        )

    def per_doc(g: pa.Table) -> pa.Table:
        t = g.sort_by([("doc_id", "ascending"), ("poss", "ascending")])
        ids = t.column("doc_id").to_numpy()
        enc = t.column("poss").to_pylist()
        starts = np.concatenate(([0], np.flatnonzero(ids[1:] != ids[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(ids)]))
        return pa.table(
            {"doc_id": pa.array(ids[starts].astype(np.int64), pa.int64()),
             "poss": pa.array(
                 [",".join(enc[s:e]) for s, e in zip(starts, ends)],
                 pa.string())}
        )

    losers = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_losers, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(per_doc, batch_format="pyarrow")
    )

    def rebuild(batch: pa.Table) -> pa.Table:
        out_nt, out_nr, out_text = [], [], []
        for t, enc in zip(batch.column("text").to_pylist(),
                          batch.column("poss").to_pylist()):
            toks = _tokens(t)
            m = len(toks)
            poss = np.array(
                [int(x) for x in enc.split(",") if x and x != "-1"],
                dtype=np.int64,
            )
            out_nt.append(m)
            if m == 0 or poss.size == 0:
                out_nr.append(0)
                out_text.append(" ".join(toks))
                continue
            cover = np.zeros(m + 1, dtype=np.int64)
            np.add.at(cover, poss, 1)
            np.add.at(cover, np.minimum(poss + N, m), -1)
            removed = np.cumsum(cover[:m]) > 0
            out_nr.append(int(removed.sum()))
            out_text.append(
                " ".join(tok for tok, r in zip(toks, removed) if not r)
            )
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "n_tokens": pa.array(out_nt, pa.int64()),
             "n_removed": pa.array(out_nr, pa.int64()),
             "kept_text": pa.array(out_text, pa.string())}
        )

    J = int(join_partitions) if join_partitions else default_join_partitions()
    joined = join_right(losers, J).join(
        join_right(ds, J), join_type="inner", num_partitions=J,
        on=("doc_id",),
    )
    return joined.map_batches(rebuild, batch_format="pyarrow")

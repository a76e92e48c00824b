"""Similarity search over an embedding column (list<float>).

- knn_brute: exact cosine top-k. The query matrix is broadcast once
  (ray.put); each batch does one numpy matmul against it; per-batch
  partial top-k rows are reduced with a final small sort — the dataset
  streams, nothing is materialized.
- cosine_dup_pairs: embedding near-duplicate pairs above a cosine
  threshold, via the same broadcast-matmul pattern (all-pairs at small
  scale; the scale path buckets by random-hyperplane LSH first).
- rp_lsh_buckets: random-hyperplane signatures for LSH bucketing (the
  IVF/LSH scale path for ANN).

Scores are emitted as integer ppm (floor of cosine*1e6 after float32->
float64 promotion) so the DuckDB oracle (list_cosine_similarity)
comparison is exact — float accumulation differences between numpy and
DuckDB are absorbed by the floor... they are NOT in general, so the
oracle queries compute the dot products the same way: sum over float64
of float32 inputs in index order. See __ray_entry__.oracle_sql notes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _to_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy().astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def knn_brute(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
) -> pa.Table:
    """Exact cosine top-k for each query vector.

    Returns (query_id, vec_id, cos_ppm) with k rows per query, ordered
    by (cos desc, vec_id asc) with integer-ppm cosine.
    """
    qn = queries.astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    q_ref = ray.put(qn)
    qids = list(query_ids)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _to_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ q.T  # (batch, nq)
        vec_ids = batch.column("vec_id").to_numpy()
        out_q, out_v, out_c = [], [], []
        for j in range(sims.shape[1]):
            s = sims[:, j]
            if s.size > 4 * k:
                # tie-inclusive partial selection (no per-batch full sort):
                # keep every candidate >= the kth score so an exact-float
                # boundary tie still reaches the final (vec_id-ordered)
                # reduce; ordering is the driver-side reduce's job
                kth = np.partition(s, s.size - k)[s.size - k]
                top = np.flatnonzero(s >= kth)
            else:
                top = np.argsort(-s, kind="stable")[:k]
            out_q.extend([qids[j]] * len(top))
            out_v.extend(vec_ids[top].tolist())
            out_c.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = ds.map_batches(score, batch_format="pyarrow")
    # final reduce: tiny table (k rows per query per block); ranked by the
    # RAW cosine (floored ppm would mis-rank near-tied boundary candidates
    # vs the SQL oracle), ppm emitted only as the display value
    t = partials.to_pandas()
    t = t.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    t = t.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    t["cos_ppm"] = np.floor(t["cos"].to_numpy() * 1_000_000).astype(np.int64)
    t = t[["query_id", "vec_id", "cos_ppm"]]
    return pa.Table.from_pandas(t, preserve_index=False)


def cosine_dup_pairs(
    ds: "ray.data.Dataset", *, threshold_ppm: int = 950_000
) -> pa.Table:
    """All-pairs embedding near-dups above a cosine threshold.

    TEST HELPER / verifier only (O(n^2) driver-side): the production
    path is :func:`lsh_dup_pairs`, which buckets with banded
    random-hyperplane LSH and verifies exactly inside each bucket."""
    rows = ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mn = m / norms
    sims = mn @ mn.T
    iu, ju = np.triu_indices(len(ids), k=1)
    ppm = np.floor(sims[iu, ju] * 1_000_000).astype(np.int64)
    keep = ppm >= threshold_ppm
    return pa.table(
        {
            "vec_a": pa.array(ids[iu[keep]], pa.int64()),
            "vec_b": pa.array(ids[ju[keep]], pa.int64()),
            "cos_ppm": pa.array(ppm[keep], pa.int64()),
        }
    )


def lsh_dup_pairs(
    ds: "ray.data.Dataset",
    *,
    threshold_ppm: int = 950_000,
    num_bands: int = 32,
    planes_per_band: int = 8,
    seed: int = 42,
) -> pa.Table:
    """Embedding near-dup pairs via banded random-hyperplane LSH with
    exact per-bucket verification — the scale path for cosine_dup_pairs.

    Pipeline: per-batch banded sign signatures (each vector lands in
    ``num_bands`` buckets of ``planes_per_band``-bit keys) ->
    groupby(band, bucket) -> exact pairwise cosine inside each bucket ->
    per-pair Min-aggregate dedup across bands. Only bucket-cohabiting
    rows are ever compared; nothing is materialized on the driver except
    the final pair table (the operator's output).

    Recall: a pair at cosine c collides in one band with probability
    p^r, p = 1 - arccos(c)/pi; miss probability (1 - p^r)^B. At the
    defaults (r=8, B=32) a 0.9-cosine pair is missed with p < 2e-5 and
    a 0.95-cosine pair with p < 1e-12. At cluster scale choose
    r ~ log2(n / target_bucket_size) and raise B to hold recall.
    """
    total = num_bands * planes_per_band
    state: dict = {}

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch)
        if "planes" not in state:
            rng = np.random.default_rng(seed)
            state["planes"] = rng.standard_normal((total, m.shape[1]))
        signs = (m @ state["planes"].T) > 0  # (n, total)
        n = len(m)
        weights = 1 << np.arange(planes_per_band, dtype=np.int64)
        buckets = np.empty((n, num_bands), dtype=np.int64)
        for b in range(num_bands):
            chunk = signs[:, b * planes_per_band : (b + 1) * planes_per_band]
            buckets[:, b] = chunk.astype(np.int64) @ weights
        idx = np.repeat(np.arange(n), num_bands)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(num_bands, dtype=np.int32), n), pa.int32()),
                "bucket": pa.array(buckets.ravel(), pa.int64()),
                "vec_id": batch.column("vec_id").take(pa.array(idx)),
                "embedding": batch.column("embedding").take(pa.array(idx)),
            }
        )

    exploded = ds.select_columns(["vec_id", "embedding"]).map_batches(
        bucketize, batch_format="pyarrow"
    )

    def bucket_dups(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
             "cos_ppm": pa.array([], pa.int64())}
        )
        if g.num_rows < 2:
            return empty
        ids = g.column("vec_id").to_numpy()
        m = _to_matrix(g)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        sims = mn @ mn.T
        iu, ju = np.triu_indices(len(ids), k=1)
        ppm = np.floor(sims[iu, ju] * 1_000_000).astype(np.int64)
        keep = ppm >= threshold_ppm
        if not keep.any():
            return empty
        return pa.table(
            {
                "vec_a": pa.array(ids[iu[keep]], pa.int64()),
                "vec_b": pa.array(ids[ju[keep]], pa.int64()),
                "cos_ppm": pa.array(ppm[keep], pa.int64()),
            }
        )

    from ray.data.aggregate import Min

    pairs = (
        exploded.groupby(["band", "bucket"])
        .map_groups(bucket_dups, batch_format="pyarrow")
        .groupby(["vec_a", "vec_b"])
        .aggregate(Min("cos_ppm", alias_name="cos_ppm"))
    )
    t = pairs.to_pandas()
    if len(t) == 0:
        return pa.table(
            {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64()),
             "cos_ppm": pa.array([], pa.int64())}
        )
    t = t.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.table(
        {
            "vec_a": pa.array(t["vec_a"].to_numpy(), pa.int64()),
            "vec_b": pa.array(t["vec_b"].to_numpy(), pa.int64()),
            "cos_ppm": pa.array(t["cos_ppm"].to_numpy(), pa.int64()),
        }
    )


def knn_lsh(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    num_bands: int = 32,
    planes_per_band: int = 4,
    seed: int = 42,
) -> pa.Table:
    """Approximate cosine top-k via banded RP-LSH candidate pruning.

    Each batch computes banded sign signatures for its vectors and
    scores ONLY the vectors that share >= 1 band bucket with a query
    (the broadcast query matrix carries its own signatures); per-batch
    partial top-k rows reduce exactly like knn_brute. Same output
    schema as knn_brute; approximate — a neighbor colliding in no band
    is missed. At the defaults (r=4, B=32) a cosine-0.3 neighbor is
    found with p > 0.98 and a cosine-0.5 neighbor with p > 0.999
    (recall-tested vs brute). Raise num_bands for higher recall; raise
    planes_per_band to prune harder on huge corpora.
    """
    total = num_bands * planes_per_band
    qn = queries.astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((total, qn.shape[1]))
    weights = 1 << np.arange(planes_per_band, dtype=np.int64)

    def band_codes(m: np.ndarray) -> np.ndarray:
        signs = (m @ planes.T) > 0
        codes = np.empty((len(m), num_bands), dtype=np.int64)
        for b in range(num_bands):
            chunk = signs[:, b * planes_per_band : (b + 1) * planes_per_band]
            codes[:, b] = chunk.astype(np.int64) @ weights
        return codes

    q_codes = band_codes(qn)  # (nq, B)
    state_ref = ray.put((qn, q_codes))
    qids = list(query_ids)

    def score(batch: pa.Table) -> pa.Table:
        q, qc = ray.get(state_ref)
        m = _to_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        codes = band_codes(m)  # (n, B)
        vec_ids = batch.column("vec_id").to_numpy()
        out_q, out_v, out_c = [], [], []
        for j in range(q.shape[0]):
            cand = np.flatnonzero((codes == qc[j][None, :]).any(axis=1))
            if cand.size == 0:
                continue
            s = mn[cand] @ q[j]
            if s.size > 4 * k:
                kth = np.partition(s, s.size - k)[s.size - k]
                top = np.flatnonzero(s >= kth)
            else:
                top = np.argsort(-s, kind="stable")[:k]
            out_q.extend([qids[j]] * len(top))
            out_v.extend(vec_ids[cand[top]].tolist())
            out_c.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = ds.map_batches(score, batch_format="pyarrow")
    t = partials.to_pandas()
    t = t.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    t = t.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    t["cos_ppm"] = np.floor(t["cos"].to_numpy() * 1_000_000).astype(np.int64)
    t = t[["query_id", "vec_id", "cos_ppm"]]
    return pa.Table.from_pandas(t, preserve_index=False)


def kmeans_fit(
    ds: "ray.data.Dataset", k: int, *, n_iter: int = 5
) -> np.ndarray:
    """Distributed spherical k-means (the IVF coarse quantizer).

    Deterministic: initial centroids are the k lowest-vec_id vectors;
    each Lloyd iteration is one map_batches pass emitting per-batch
    (sum, count) partials, reduced on the driver after sorting by each
    partial's first vec_id (fixed float addition order). The driver only
    ever holds k x dim floats.
    """
    first = ds.select_columns(["vec_id", "embedding"]).sort("vec_id").limit(k)
    init = first.to_pandas()
    cents = np.array(init["embedding"].tolist(), dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    for _ in range(n_iter):
        c_ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            m = _to_matrix(batch)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            mn = m / norms
            assign = np.argmax(mn @ c.T, axis=1)
            sums = np.zeros((c.shape[0], m.shape[1]))
            np.add.at(sums, assign, mn)
            counts = np.bincount(assign, minlength=c.shape[0])
            fid = int(batch.column("vec_id")[0].as_py())
            return pa.table(
                {
                    "fid": pa.array([fid], pa.int64()),
                    "sums": pa.array([sums.ravel().tolist()], pa.list_(pa.float64())),
                    "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
                }
            )

        parts = ds.select_columns(["vec_id", "embedding"]).map_batches(
            partial, batch_format="pyarrow"
        ).to_pandas().sort_values("fid")
        sums = np.zeros_like(cents)
        counts = np.zeros(cents.shape[0], dtype=np.int64)
        for srow, crow in zip(parts["sums"], parts["counts"]):
            sums += np.array(srow).reshape(cents.shape)
            counts += np.array(crow)
        nz = counts > 0
        new = cents.copy()
        new[nz] = sums[nz] / counts[nz, None]
        new /= np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cents = new
    return cents


def knn_ivf(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    queries: np.ndarray,
    query_ids: list[int],
    *,
    k: int = 10,
    nprobe: int = 2,
) -> pa.Table:
    """IVF approximate cosine top-k: each query probes its ``nprobe``
    nearest centroids' cells; each batch assigns its vectors to cells on
    the fly (one k x dim matmul) and scores only vectors in a probed
    cell. nprobe == len(centroids) degenerates to exact brute force.
    Same output schema/reduce as knn_brute."""
    qn = queries.astype(np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, : max(1, nprobe)]
    state_ref = ray.put((qn, centroids, probes))
    qids = list(query_ids)

    def score(batch: pa.Table) -> pa.Table:
        q, c, pr = ray.get(state_ref)
        m = _to_matrix(batch)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mn = m / norms
        assign = np.argmax(mn @ c.T, axis=1)
        vec_ids = batch.column("vec_id").to_numpy()
        out_q, out_v, out_c = [], [], []
        for j in range(q.shape[0]):
            cand = np.flatnonzero(np.isin(assign, pr[j]))
            if cand.size == 0:
                continue
            s = mn[cand] @ q[j]
            if s.size > 4 * k:
                kth = np.partition(s, s.size - k)[s.size - k]
                top = np.flatnonzero(s >= kth)
            else:
                top = np.argsort(-s, kind="stable")[:k]
            out_q.extend([qids[j]] * len(top))
            out_v.extend(vec_ids[cand[top]].tolist())
            out_c.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = ds.map_batches(score, batch_format="pyarrow")
    t = partials.to_pandas()
    t = t.sort_values(["query_id", "cos", "vec_id"], ascending=[True, False, True])
    t = t.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    t["cos_ppm"] = np.floor(t["cos"].to_numpy() * 1_000_000).astype(np.int64)
    return pa.Table.from_pandas(
        t[["query_id", "vec_id", "cos_ppm"]], preserve_index=False
    )


def rp_lsh_buckets(ds: "ray.data.Dataset", *, n_planes: int = 16, seed: int = 42):
    """Random-hyperplane LSH: (vec_id, bucket) — the ANN scale path.

    Vectors in the same bucket are candidate neighbors; at cluster scale
    the knn/dup search runs per bucket (groupby("bucket")) instead of
    all-pairs.
    """
    def make_planes(dim: int) -> np.ndarray:
        rng = np.random.default_rng(seed)
        return rng.standard_normal((n_planes, dim))

    state = {}

    def bucketize(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch)
        if "planes" not in state:
            state["planes"] = make_planes(m.shape[1])
        signs = (m @ state["planes"].T) > 0
        bucket = np.zeros(len(m), dtype=np.int64)
        for i in range(n_planes):
            bucket |= signs[:, i].astype(np.int64) << i
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    return ds.map_batches(bucketize, batch_format="pyarrow")

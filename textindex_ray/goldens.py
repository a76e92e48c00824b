"""Golden-result generator for the non-SQL-expressible graded queries.

The driver's correctness gate compares ``__ray_entry__.queries()`` output
against ``oracle_sql()`` run in DuckDB. LSH banding and HTML-grammar
extraction are not SQL-expressible, so their oracles are committed golden
parquet files (``goldens/<name>.sf0.01.parquet``) that DuckDB reads with
``read_parquet`` — produced HERE by the independent single-process oracle
(textindex_ray.oracle.OracleIndex + plain-Python reimplementations), NOT
by the Ray pipeline under test.

Regenerate with ``python -m textindex_ray.goldens``; the pytest
``test_goldens.py`` asserts the committed files still match a fresh
regeneration AND the Ray pipeline output (drift guard on both sides).
"""

from __future__ import annotations

import hashlib
import os
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GOLDEN_SF = "0.01"
CORPUS_ROWS = 1500  # __ray_entry__._SF_ROWS["0.01"]
CORPUS_BUCKETS = 32  # __ray_entry__._corpus_reader build_index num_buckets


def _corpus_oracle():
    from textindex_ray.corpus import generate_corpus
    from textindex_ray.oracle import OracleIndex

    return OracleIndex(generate_corpus(CORPUS_ROWS), num_buckets=CORPUS_BUCKETS)


# ---------------------------------------------------------------------------
# corpus_* goldens (synthetic web corpus, single-process oracle)

def golden_corpus_extract_stats(oracle) -> pa.Table:
    ids = sorted(oracle.url_of)
    urls = [oracle.url_of[d] for d in ids]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "doc_id": pa.array(ids, pa.uint64()),
            "dl": pa.array([oracle.dl[u] for u in urls], pa.uint32()),
            "n_words": pa.array([oracle.n_words[u] for u in urls], pa.uint32()),
            "doctype": pa.array([oracle.extracted[u][0] for u in urls], pa.string()),
        }
    )


def golden_corpus_bm25_topk(oracle) -> pa.Table:
    ids, scores = oracle.bm25_topk(["alpha", "beta", "gamma"], 10)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.uint64()),
            "score_t4": pa.array(np.floor(scores * 1e4).astype(np.int64), pa.int64()),
        }
    )


def golden_corpus_find_and(oracle) -> pa.Table:
    ids = oracle.find(["alph*", "beta"])
    return pa.table({"doc_id": pa.array(ids, pa.uint64())})


def golden_corpus_query_suite(oracle) -> pa.Table:
    from textindex_ray.fixtures import golden_table

    g = golden_table(oracle)
    return pa.table(
        {
            "qid": g.column("qid"),
            "n_results": pa.array(
                [len(x) for x in g.column("doc_ids").to_pylist()], pa.int64()
            ),
        }
    )


def golden_corpus_snippets(oracle) -> pa.Table:
    """Matched-lines counts for the first 5 'zebra' hits — independent
    reimplementation of find_matched_lines semantics (proc3.rs:396-435):
    split lines on \\n, tokens on single spaces, OR-match across terms."""
    from textindex_ray.corpus import generate_corpus
    from textindex_ray.kernel.classify import decode_lossy

    corpus = generate_corpus(CORPUS_ROWS)
    raw_of = dict(
        zip(corpus.column("url").to_pylist(), corpus.column("html").to_pylist())
    )
    ids = oracle.find(["zebra"])[:5]
    urls = [oracle.url_of[d] for d in ids]
    n_lines = []
    for u in urls:
        txt = decode_lossy(raw_of[u])
        n = sum(
            1
            for ln in txt.split("\n")
            if any(tok == "zebra" for tok in ln.split(" "))
        )
        n_lines.append(n)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "n_lines": pa.array(n_lines, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# minhash_lsh_pairs golden (documents table, independent brute LSH)

def _norm_shingles(text: str, k: int = 5) -> set[bytes]:
    t = " ".join(text.lower().split())
    if len(t) < k:
        return {t.encode("utf-8")} if t else set()
    return {t[i : i + k].encode("utf-8") for i in range(len(t) - k + 1)}


def golden_minhash_lsh_pairs(
    sf_dir: str,
    *,
    num_perm: int = 128,
    num_bands: int = 32,
    shingle_k: int = 5,
    verify_threshold: float = 0.2,
) -> pa.Table:
    """Single-process LSH: same definitional math as the distributed
    pipeline (seeded (a*x+b) mod 2^64 minhash, md5 band buckets, exact
    shingle-Jaccard verify), executed as one plain loop — verifies the
    Ray pipeline's banding shuffle / joins lose or invent no pairs."""
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    P = (1 << 61) - 1
    rng = np.random.default_rng(42)
    a = rng.integers(1, P, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, P, size=num_perm, dtype=np.uint64)
    rows_per_band = num_perm // num_bands

    shingles: dict[int, set[bytes]] = {}
    buckets: dict[tuple[int, str], list[int]] = {}
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        sh = _norm_shingles(text, shingle_k)
        shingles[doc_id] = sh
        if sh:
            x = np.fromiter(
                (
                    int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")
                    for s in sh
                ),
                dtype=np.uint64,
                count=len(sh),
            )
            sig = (x[None, :] * a[:, None] + b[:, None]).min(axis=1)
        else:
            sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        for bi in range(num_bands):
            chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
            h = hashlib.md5(np.ascontiguousarray(chunk).tobytes()).hexdigest()[:16]
            buckets.setdefault((bi, h), []).append(doc_id)

    cands: set[tuple[int, int]] = set()
    for ids in buckets.values():
        for x, y in combinations(sorted(ids), 2):
            cands.add((x, y))

    oa, ob, oj = [], [], []
    for x, y in sorted(cands):
        sa, sb = shingles[x], shingles[y]
        union = len(sa | sb)
        j = (len(sa & sb) * 1_000_000 // union) if union else 0
        if j >= verify_threshold * 1_000_000:
            oa.append(x)
            ob.append(y)
            oj.append(j)
    return pa.table(
        {
            "doc_a": pa.array(oa, pa.int64()),
            "doc_b": pa.array(ob, pa.int64()),
            "jaccard_ppm": pa.array(oj, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# real-BPE merge table (the committed "model" artifact) + golden counts

BPE_GOLDEN_MERGES = 256
# pretokenizer pattern inlined (independence from textstats.BPE_PRETOKEN_RE;
# the pytest suite asserts the two stay character-identical)
_BPE_PRETOKEN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def train_bpe_merges(sf_dir: str, out_path: str | None = None) -> str:
    """Train the committed merge table from the sf0.01 documents (the
    offline 'model training' step; deterministic — the regeneration test
    retrains and compares). The TABLE is a shared artifact; what stays
    independent is the APPLY implementation below."""
    from textindex_ray.kernel.bpe import save_merges, train_bpe

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    merges = train_bpe(t.column("text").to_pylist(), BPE_GOLDEN_MERGES)
    out_path = out_path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "goldens", "bpe_merges.txt",
    )
    save_merges(merges, out_path)
    return out_path


def naive_bpe_apply(word: bytes, ranks: dict) -> tuple:
    """Independent reimplementation of the BPE apply spec (the classic
    GPT-2 encoder loop: repeatedly merge every occurrence of the
    lowest-ranked present pair), structurally distinct from
    kernel/bpe.bpe_encode — the golden counts and the property test
    drive both."""
    syms = tuple(bytes([c]) for c in word)
    big = float("inf")
    while len(syms) > 1:
        pairs = set(zip(syms, syms[1:]))
        bigram = min(pairs, key=lambda p: ranks.get(p, big))
        if bigram not in ranks:
            break
        first, second = bigram
        out = []
        i = 0
        while i < len(syms):
            try:
                j = syms.index(first, i)
            except ValueError:
                out.extend(syms[i:])
                break
            out.extend(syms[i:j])
            i = j
            if i < len(syms) - 1 and syms[i + 1] == second:
                out.append(first + second)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = tuple(out)
    return syms


def golden_bpe_merge_counts(sf_dir: str, merges_path: str | None = None) -> pa.Table:
    """(doc_id, n_bpe_tokens, n_bpe_unique) under the committed merge
    table, computed single-process with :func:`naive_bpe_apply`."""
    import re

    from textindex_ray.kernel.bpe import default_merges_path, load_merges

    ranks = load_merges(merges_path or default_merges_path())
    rx = re.compile(_BPE_PRETOKEN)
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    memo: dict = {}
    ids, n_tok, n_uni = [], [], []
    for did, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        total = 0
        uniq: set = set()
        for p in rx.findall(text):
            pb = p.encode("utf-8")
            enc = memo.get(pb)
            if enc is None:
                enc = naive_bpe_apply(pb, ranks)
                memo[pb] = enc
            total += len(enc)
            uniq.update(enc)
        ids.append(did)
        n_tok.append(total)
        n_uni.append(len(uniq))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_bpe_tokens": pa.array(n_tok, pa.int64()),
            "n_bpe_unique": pa.array(n_uni, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# lm_perplexity golden (documents table, independent naive bigram LM)

def golden_lm_perplexity(sf_dir: str, *, vocab_min_ppm: int = 1_000) -> pa.Table:
    """Naive single-process twin of textstats.lm_perplexity: full-corpus
    Counter vocabulary + bigram table, per-position Python-loop scoring.
    Bit-equality contract with the engine: integer count rules, libm
    ``math.log`` of exact integers per position, one np.float64
    pairwise ``.sum()`` per doc (the engine mirrors all three)."""
    import math
    import re as _re
    from collections import Counter

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    word_re = _re.compile(r"[^\W\d_]+")
    ids_col = t.column("doc_id").to_pylist()
    toks_all = [word_re.findall(x.lower()) for x in t.column("text").to_pylist()]
    cf: Counter = Counter()
    total = 0
    for toks in toks_all:
        cf.update(toks)
        total += len(toks)
    vocab = sorted(
        w for w, c in cf.items() if c * 1_000_000 >= total * vocab_min_ppm
    )
    V = len(vocab)
    vid = {w: i for i, w in enumerate(vocab)}
    bg: Counter = Counter()
    c1: Counter = Counter()
    for toks in toks_all:
        mapped = [vid.get(w, V) for w in toks]
        for a, b in zip(mapped, mapped[1:]):
            bg[(a, b)] += 1
            c1[a] += 1
    out_id, out_n, out_x = [], [], []
    for did, toks in zip(ids_col, toks_all):
        n = len(toks)
        out_id.append(int(did))
        out_n.append(n)
        if n < 2:
            out_x.append(0)
            continue
        mapped = [vid.get(w, V) for w in toks]
        vals = np.empty(n - 1, dtype=np.float64)
        for i, (a, b) in enumerate(zip(mapped, mapped[1:])):
            vals[i] = math.log(bg.get((a, b), 0) + 1) - math.log(
                c1.get(a, 0) + V + 1
            )
        h = -vals.sum() / (n - 1)
        out_x.append(int(math.floor(h * 1e6)))
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "xent_unat": pa.array(out_x, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------

def generate_all(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, pa.Table]:
    oracle = _corpus_oracle()
    train_bpe_merges(sf_dir)  # commit the merge table before counting
    return {
        "corpus_extract_stats": golden_corpus_extract_stats(oracle),
        "corpus_bm25_topk": golden_corpus_bm25_topk(oracle),
        "corpus_find_and": golden_corpus_find_and(oracle),
        "corpus_query_suite": golden_corpus_query_suite(oracle),
        "corpus_snippets": golden_corpus_snippets(oracle),
        "minhash_lsh_pairs": golden_minhash_lsh_pairs(sf_dir),
        "bpe_merge_counts": golden_bpe_merge_counts(sf_dir),
        "lm_perplexity": golden_lm_perplexity(sf_dir),
    }


def write_all(out_dir: str | None = None) -> None:
    out_dir = out_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens"
    )
    os.makedirs(out_dir, exist_ok=True)
    for name, table in generate_all().items():
        pq.write_table(table, os.path.join(out_dir, "%s.sf%s.parquet" % (name, GOLDEN_SF)))
        print("wrote", name, table.num_rows, "rows")


if __name__ == "__main__":
    write_all()

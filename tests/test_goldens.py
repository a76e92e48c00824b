"""Golden-parquet oracle gate: the committed goldens/ files (what the
driver's DuckDB oracle reads for the non-SQL-expressible queries) match
the Ray pipeline output at sf0.01 — the exact comparison the driver
runs. The minhash golden is additionally re-derived from the
independent single-process LSH implementation (drift guard on the
generator itself)."""

import os
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
GDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "goldens")

NAMES = [
    ("corpus_extract_stats", "corpus_extract_stats"),
    ("corpus_bm25_topk", "corpus_bm25_topk"),
    ("corpus_find_and", "corpus_find_and"),
    ("corpus_query_suite", "corpus_query_suite"),
    ("corpus_query_suite_sharded", "corpus_query_suite"),
    ("corpus_snippets", "corpus_snippets"),
    ("minhash_lsh_pairs", "minhash_lsh_pairs"),
    ("bpe_merge_counts", "bpe_merge_counts"),
    ("lm_perplexity", "lm_perplexity"),
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(x):
    import pyarrow as pa

    import ray.data as rd

    if isinstance(x, rd.Dataset):
        return x.to_pandas()
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x


@pytest.mark.parametrize("name,fname", NAMES)
def test_golden_matches_pipeline(ray_session, name, fname):
    import __ray_entry__ as m

    golden_path = os.path.join(GDIR, "%s.sf0.01.parquet" % fname)
    assert os.path.exists(golden_path), "missing committed golden for " + name
    want = _canon(pq.read_table(golden_path).to_pandas())
    mine = _canon(_to_df(m.queries()[name](SF_DIR)))
    assert list(mine.columns) == list(want.columns), name
    assert len(mine) == len(want), (name, len(mine), len(want))
    mm = mine.astype(object).where(pd.notna(mine), None).values.tolist()
    ww = want.astype(object).where(pd.notna(want), None).values.tolist()
    assert mm == ww, (name, mm[:3], ww[:3])


def test_bpe_golden_regeneration(tmp_path):
    """The committed merge table retrains identically (deterministic
    training) and the committed counts equal a fresh naive-apply run."""
    from textindex_ray.goldens import golden_bpe_merge_counts, train_bpe_merges

    fresh_merges = str(tmp_path / "merges.txt")
    train_bpe_merges(SF_DIR, fresh_merges)
    with open(fresh_merges) as f, open(os.path.join(GDIR, "bpe_merges.txt")) as g:
        assert f.read() == g.read()
    fresh = golden_bpe_merge_counts(SF_DIR)
    committed = pq.read_table(os.path.join(GDIR, "bpe_merge_counts.sf0.01.parquet"))
    assert fresh.equals(committed)


def test_bpe_apply_property():
    """kernel/bpe.bpe_encode == goldens.naive_bpe_apply (independent
    implementations of the merge spec) on random byte strings under
    both the committed table and a random merge table; encoding a
    training word reproduces its final training segmentation."""
    import random

    from textindex_ray.goldens import naive_bpe_apply
    from textindex_ray.kernel.bpe import (
        bpe_encode,
        default_merges_path,
        load_merges,
        train_bpe,
    )

    from textindex_ray.functions.textstats import BPE_PRETOKEN_RE
    from textindex_ray.goldens import _BPE_PRETOKEN

    assert _BPE_PRETOKEN == BPE_PRETOKEN_RE  # inlined copy stays in sync

    ranks = load_merges(default_merges_path())
    rng = random.Random(7)
    for _ in range(300):
        n = rng.randrange(0, 24)
        b = bytes(rng.randrange(97, 123) if rng.random() < 0.8
                  else rng.randrange(0, 256) for _ in range(n))
        assert bpe_encode(b, ranks) == naive_bpe_apply(b, ranks), b
    # round-trip: concatenating the symbols reproduces the input
    for w in (b"hello", b" world", b"'re", b"\xff\x00ab"):
        assert b"".join(bpe_encode(w, ranks)) == w
    # train/encode consistency on a fresh tiny table
    texts = ["aaab aab ab abab", "banana bandana", "aaab aaab"]
    merges = train_bpe(texts, 12)
    r2 = {m: i for i, m in enumerate(merges)}
    for t in texts:
        for w in t.split(" "):
            wb = (" " + w).encode()  # pretokenizer space-prefix shape
            assert bpe_encode(wb, r2) == naive_bpe_apply(wb, r2)


def test_lm_perplexity_golden_regeneration():
    """The committed lm_perplexity golden equals a fresh run of the
    independent naive bigram-LM oracle."""
    from textindex_ray.goldens import golden_lm_perplexity

    fresh = golden_lm_perplexity(SF_DIR)
    committed = pq.read_table(os.path.join(GDIR, "lm_perplexity.sf0.01.parquet"))
    assert fresh.equals(committed)


def test_minhash_golden_regeneration():
    """The committed minhash golden equals a fresh run of the independent
    single-process LSH (catches a stale golden after algorithm changes)."""
    from textindex_ray.goldens import golden_minhash_lsh_pairs

    fresh = golden_minhash_lsh_pairs(SF_DIR)
    committed = pq.read_table(os.path.join(GDIR, "minhash_lsh_pairs.sf0.01.parquet"))
    assert fresh.equals(committed)

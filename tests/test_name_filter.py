"""O1 name filter (reference proc3.rs:203-299 semantics) and the A4
frequency-class histogram helper (index2.rs:100/507/526 analog)."""

import pyarrow as pa
import pytest

from textindex_ray.kernel.name_filter import name_filter, name_filter_batch


@pytest.mark.parametrize(
    "path,want",
    [
        # extension blacklist (lowercased before matching, proc3.rs:204-213)
        ("site/a/photo.jpg", "ignore"),
        ("site/a/PHOTO.JPG", "ignore"),
        ("site/a/photo.PnG", "ignore"),
        ("site/style.css", "ignore"),
        ("site/font.woff2", "ignore"),
        ("site/doc.mht", "ignore"),
        # .gz is NOT in the reference blacklist -> inspect
        ("site/archive.gz", "inspect"),
        ("site/archive.tar.gz", "inspect"),
        # name blacklist, exact lowercased file name
        ("some/dir/History.TXT", "ignore"),
        ("some/dir/stored.idx", "ignore"),
        ("some/dir/log.txt", "ignore"),
        ("some/dir/Thumbs.db", "ignore"),
        ("some/dir/.message.ftp.txt", "ignore"),
        # near-misses stay inspect
        ("some/dir/history.txt.old", "inspect"),
        ("some/dir/mylog.txt", "inspect"),
        ("page.html", "inspect"),
        ("readme", "inspect"),
        # dotfiles: Rust Path::extension() is None for ".bashrc"
        (".bashrc", "inspect"),
        (".gitignore", "inspect"),
        # but a dotfile WITH another dot has an extension
        (".config.js", "ignore"),
        # trailing slash / directory-ish urls
        ("https://host/path/", "inspect"),
        ("", "inspect"),
    ],
)
def test_name_filter_cases(path, want):
    assert name_filter(path) == want


def test_name_filter_batch():
    urls = ["a/page.html", "a/pic.jpeg", "b/thumbs.db", "b/index.htm"]
    t = pa.table({"url": pa.array(urls, pa.string()),
                  "x": pa.array([1, 2, 3, 4], pa.int64())})
    out = name_filter_batch(t)
    assert out.column("url").to_pylist() == ["a/page.html", "b/index.htm"]
    assert out.column("x").to_pylist() == [1, 4]


def test_df_histogram_a4():
    """A4 analog: 256 frequency classes, bag = clamp(255, cf*256*20/total)
    (reference index2.rs:500-526)."""
    from textindex_ray.corpus import generate_corpus
    from textindex_ray.oracle import OracleIndex

    oracle = OracleIndex(generate_corpus(120), num_buckets=8)
    bins = oracle.df_histogram()
    assert len(bins) == 256
    assert sum(bins) == len(oracle.cf)  # every term lands in exactly one bag
    total = sum(oracle.cf.values())
    # spot-check the bag formula for a handful of terms
    for term in list(oracle.cf)[:20]:
        b = min(255, oracle.cf[term] * 256 * 20 // total)
        lo = sum(bins[:b])
        assert bins[b] >= 1 or lo >= 0  # the bag the formula names is counted
    # heavy terms (>=5% of corpus) clamp into the top bag
    heavy = [t for t, c in oracle.cf.items() if c * 20 >= total]
    if heavy:
        assert bins[255] >= len(heavy)

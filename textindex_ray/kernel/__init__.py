"""Per-document kernels shared by the Ray stages and the single-process oracle.

These are faithful behavioral ports of the reference's per-document
operators (classification, HTML text extraction, text tokenization,
normalization) — see SURVEY.md §2.2 for the operator inventory and the
fidelity quirks Q1-Q7 they replicate. One implementation is used both by
the distributed pipeline (inside ``map_batches`` actors) and the oracle,
so the byte-identity invariant holds by construction and the pipeline
tests validate the distributed plumbing (ids, aggregation, merge).
"""

from textindex_ray.kernel.classify import classify_bytes, DOCTYPE_HTML, DOCTYPE_TEXT, DOCTYPE_IGNORE
from textindex_ray.kernel.html_extract import extract_html_text
from textindex_ray.kernel.txt_tokenize import tokenize_text, tokenize_counts
from textindex_ray.kernel.truncate import truncate_term
from textindex_ray.kernel.stopwords import STOP_WORDS

__all__ = [
    "classify_bytes",
    "DOCTYPE_HTML",
    "DOCTYPE_TEXT",
    "DOCTYPE_IGNORE",
    "extract_html_text",
    "tokenize_text",
    "tokenize_counts",
    "truncate_term",
    "STOP_WORDS",
]

"""Name filter (O1): extension/name blacklist -> ignore/inspect.

Behavioral port of /root/reference/src/proc3.rs:203-299. For a Parquet
corpus this is an optional pre-filter predicate over the url column
(the reference applies it to filesystem paths during the walk); the
extension and name are lowercased before matching, exactly like the
reference (proc3.rs:204-213).
"""

from __future__ import annotations

import posixpath

import pyarrow as pa

# proc3.rs:215-220
EXT_IGNORE = frozenset(
    "jpg pdf gif css png doc rtf js ico woff zip jpeg odt docx lit xml epub "
    "mobi exe mp3 azw3 bmp bak ccs dwt eot img pdb prc psc swf svg wmf wpd "
    "wav mso mid thmx zblorb rm ttf woff2 emz mht".split()
)
# proc3.rs:221-292 (active entries only; the commented-out ones are dead)
NAME_IGNORE = frozenset(
    [".message.ftp.txt", "history.txt", "stored.idx", "log.txt", "thumbs.db"]
)


def _extension(name: str) -> str:
    """Rust Path::extension semantics: text after the last '.', except a
    leading-dot-only name ('.bashrc') has no extension."""
    stem, sep, ext = name.rpartition(".")
    if not sep or stem == "":
        return ""
    return ext


def name_filter(path: str) -> str:
    """'ignore' | 'inspect' for one path/url (reference semantics)."""
    name = posixpath.basename(path.rstrip("/")).lower()
    if _extension(name) in EXT_IGNORE or name in NAME_IGNORE:
        return "ignore"
    return "inspect"


def name_filter_batch(batch: pa.Table, column: str = "url") -> pa.Table:
    """Vectorized predicate: keep only 'inspect' rows."""
    keep = pa.array([name_filter(u) == "inspect" for u in batch.column(column).to_pylist()])
    return batch.filter(keep)

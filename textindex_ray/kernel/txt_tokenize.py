"""Plain-text tokenizer: text -> word stream (+ per-doc term frequencies).

Behavioral port of the reference text grammar and indexing loop
(/root/reference/src/proc3/txt_parse.rs:74-394 and
/root/reference/src/proc3/indexer.rs:25-95).

Replicated fidelity quirks (SURVEY.md §2.2):

- Q5: the line-anchored specials (KeyValue / PGP / uu-base64 / BEGIN-END
  base64) are attempted only immediately after a consumed newline char
  (+ whitespace skip); on failure the parse rewinds to before the
  newline (txt_parse.rs:80-104), so the first line of a document can
  never match a special.
- Q6: ``<`` + 1-20 non-``>`` chars + ``>`` is skipped as a pseudo-tag
  even in plain text (txt_parse.rs:126-138); the tag body may span
  newlines.
- Q7: words are runs of Unicode-alphabetic chars (char::is_alphabetic,
  txt_parse.rs:160); Python ``str.isalpha`` agrees on the corpus
  character subset (FIXTURES.md §5). Digits / underscores split words.

Normalization (indexer.rs:52-61): words are Unicode-lowercased, checked
against the trilingual stopword list, and the surviving terms are
tallied per document. The document length ``dl`` is the count of
non-stopword tokens (tmp_index.rs:20-28).
"""

from __future__ import annotations

import re
from collections import Counter

from textindex_ray.kernel.stopwords import STOP_WORDS
from textindex_ray.kernel.truncate import truncate_term

# Rust char::is_whitespace == Unicode White_Space property. Python
# str.isspace() is broader (e.g. 0x1C-0x1F), so use the explicit set.
_RUST_WS = (
    "\t\n\x0b\x0c\r \x85\xa0 "
    "           "
    "    　"
)
_WS_SET = frozenset(_RUST_WS)

# Word candidate: regex \w minus digits/underscore approximates
# str.isalpha; runs are re-validated with isalpha and split on the rare
# non-alpha chars (Nl / No numerics that \w admits), so the effective
# predicate is exactly str.isalpha.
_WORD_RUN = re.compile(r"[^\W\d_]+")

_KV_RE = re.compile(r"[A-Za-z0-9\-*]*:")
_KEY_CHARS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-*")

_PGP_BEGIN = "-----BEGIN PGP SIGNATURE-----"
_PGP_END = "END PGP SIGNATURE-----"


def _skip_ws(s: str, pos: int) -> int:
    n = len(s)
    while pos < n and s[pos] in _WS_SET:
        pos += 1
    return pos


def _until_newline(s: str, pos: int) -> int:
    i = s.find("\n", pos)
    return len(s) if i < 0 else i


def _try_pgp(s: str, pos: int):
    """parse_pgp (txt_parse.rs:184-227). Returns end pos or None."""
    n = len(s)
    if not s.startswith(_PGP_BEGIN, pos):
        return None
    p = _until_newline(s, pos + len(_PGP_BEGIN))
    # newline: one_of("\n\r") — here always '\n' since the scan stopped at it
    if p >= n:
        return None
    p += 1
    # tok_pgp_text: find 5 consecutive '-' with the reference's iterator
    # semantics: a failed lookahead consumes its checked chars.
    i = p
    found = -1
    while i < n:
        c = s[i]
        i += 1
        if c != "-":
            continue
        start = i - 1
        ok = True
        for _ in range(4):
            if i >= n:
                ok = False
                break
            c2 = s[i]
            i += 1
            if c2 != "-":
                ok = False
                break
        if ok:
            found = start
            break
    if found < 0:
        return None
    p = found + 5
    if not s.startswith(_PGP_END, p):
        return None
    p = _until_newline(s, p + len(_PGP_END))
    return p


def _try_base64(s: str, pos: int):
    """parse_base64, uu-style (txt_parse.rs:275-335). Returns end pos or None."""
    n = len(s)
    if not s.startswith("begin", pos):
        return None
    p = _until_newline(s, pos + 5)
    while True:
        # preceded(newline, ...)
        if p >= n or s[p] not in "\n\r":
            return None
        p += 1
        # stop: '`' followed by (unconsumed) '\n'
        if p < n and s[p] == "`" and p + 1 < n and s[p + 1] == "\n":
            p += 1
            break
        # line: whitespace (incl. newlines) + 1+ non-newline chars
        q = _skip_ws(s, p)
        r = _until_newline(s, q)
        if r == q:
            return None  # take_while1 failed (EOF after whitespace)
        p = r
    # tok_base64_end: whitespace (incl. newlines) + "end" + rest of line
    q = _skip_ws(s, p)
    if not s.startswith("end", q):
        return None
    return _until_newline(s, q + 3)


def _try_base64_v2(s: str, pos: int):
    """parse_base64_v2, BEGIN/END-style (txt_parse.rs:230-272)."""
    n = len(s)
    if not s.startswith("BEGIN", pos):
        return None
    p = _until_newline(s, pos + 5)
    while True:
        if p >= n or s[p] not in "\n\r":
            return None
        p += 1
        if s.startswith("END", p):
            return _until_newline(s, p + 3)
        q = _skip_ws(s, p)
        r = _until_newline(s, q)
        if r == q:
            return None
        p = r


def _try_key_value(s: str, pos: int):
    """parse_key_value (txt_parse.rs:338-356): [alnum-*]* ':' rest-of-line."""
    m = _KV_RE.match(s, pos)
    if m is None:
        return None
    return _until_newline(s, m.end())


def _iter_words_ref(s: str):
    """Reference implementation of the word stream (step-at-a-time port
    of the parse_txt loop, txt_parse.rs:74-105). Used as the fuzz oracle
    for the segment-vectorized _iter_words below; semantics identical.
    """
    n = len(s)
    pos = 0
    word_run = _WORD_RUN
    while pos < n:
        c = s[pos]
        if c == "\n" or c == "\r":
            # opt(newline) consumed one char, then whitespace, then specials
            q = _skip_ws(s, pos + 1)
            e = _try_pgp(s, q)
            if e is None:
                e = _try_base64(s, q)
            if e is None:
                e = _try_base64_v2(s, q)
            if e is None:
                e = _try_key_value(s, q)
            if e is not None:
                pos = e
                continue
            # rewind: fall through to the normal alts on the original input;
            # only parse_newline can match at a newline char... except '\r',
            # which tok_non_word1 also accepts. Handled below.
            if c == "\n":
                pos += 1
                continue
            # '\r': parse_tag fails, parse_word fails, parse_nonword takes
            # the '\r' plus following non-alpha non-'\n' chars.
            pos += 1
            while pos < n and s[pos] != "\n" and not s[pos].isalpha():
                pos += 1
            continue
        if c == "<":
            # parse_tag: '<' + 1..=20 non-'>' chars + '>' (Q6)
            i = s.find(">", pos + 1, pos + 22)
            if i > pos + 1:
                pos = i + 1
                continue
            # tag failed: '<' is non-alpha -> nonword run
            pos += 1
            while pos < n and s[pos] != "\n" and not s[pos].isalpha():
                pos += 1
            continue
        m = word_run.match(s, pos)
        if m is not None and m.start() == pos:
            run = m.group()
            if run.isalpha():
                yield run
                pos = m.end()
            else:
                # rare: regex admitted a non-isalpha char (Nl/No); take the
                # exact isalpha prefix
                k = 0
                while k < len(run) and run[k].isalpha():
                    k += 1
                if k == 0:
                    # char matches \w but not isalpha: it is a nonword char
                    pos += 1
                    while pos < n and s[pos] != "\n" and not s[pos].isalpha():
                        pos += 1
                    continue
                yield run[:k]
                pos = pos + k
            # tok_non_word0: consume trailing non-alpha non-newline run
            while pos < n and s[pos] != "\n" and not s[pos].isalpha():
                pos += 1
            continue
        # parse_nonword: 1+ non-alpha non-newline
        pos += 1
        while pos < n and s[pos] != "\n" and not s[pos].isalpha():
            pos += 1
    return


def tokenize_text(s: str):
    """Return (terms, n_words): normalized non-stopword terms in stream
    order, and the raw word count (pre-stopword-filter).

    Terms are lowercased (indexer.rs:52), stopword-filtered
    (indexer.rs:53-58) and 20-byte UTF-8-safe truncated
    (index2.rs:598-619; canonicalized at tokenize time per SURVEY §1.3).
    """
    words = _iter_words(s)
    n_words = len(words)
    stop = STOP_WORDS
    lowered = map(str.lower, words)
    # len < 5 can never reach 20 utf-8 bytes; short ASCII skips the byte
    # check entirely; only the long/non-ASCII tail pays truncate_term
    # (which returns unchanged below 20 bytes)
    terms = [
        w if (len(w) < 5 or (len(w) < 20 and w.isascii())) else truncate_term(w)
        for w in lowered
        if w not in stop
    ]
    return terms, n_words


def tokenize_counts(s: str):
    """Return (tf Counter over normalized terms, dl, n_words).

    dl = number of non-stopword tokens (TmpWords.count, tmp_index.rs:20-28).
    """
    terms, n_words = tokenize_text(s)
    return Counter(terms), len(terms), n_words


def _split_isalpha(run: str):
    r"""Split a regex word-run into its maximal isalpha sub-runs (the
    regex class [^\W\d_] admits a few non-isalpha numerics, e.g. Nl)."""
    out = []
    cur = []
    for ch in run:
        if ch.isalpha():
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def _iter_words(s: str):
    """Yield the word tokens of ``s`` — segment-vectorized fast path.

    Semantics proof sketch (validated by fuzzing against _iter_words_ref):
    a parse step can only start at the doc start, right after a consumed
    newline, after a tag, or after a word/nonword run. Runs stop only at
    alphabetic chars or ``\n``, so mid-line steps always start on an
    alphabetic char or a newline — never on ``<`` or ``\r``. Hence tags
    occur only in a leading chain at a step start, and the rest of the
    line up to the next ``\n`` is a plain alternation of word/nonword
    runs, which one regex findall extracts wholesale.
    """
    out: list[str] = []
    n = len(s)
    pos = 0
    findall = _WORD_RUN.findall
    while pos < n:
        c = s[pos]
        if c == "\n" or c == "\r":
            q = _skip_ws(s, pos + 1)
            # first-char gates: pgp starts '-', uu-base64 'b', BEGIN-block 'B'
            c2 = s[q] if q < n else ""
            e = None
            if c2 == "-":
                e = _try_pgp(s, q)
            elif c2 == "b":
                e = _try_base64(s, q)
            elif c2 == "B":
                e = _try_base64_v2(s, q)
            if e is None:
                e = _try_key_value(s, q)
            if e is not None:
                pos = e
                continue
            if c == "\n":
                pos += 1
                continue
            # '\r': nonword run ('\r' + following non-alpha non-'\n')
            pos += 1
            while pos < n and s[pos] != "\n" and not s[pos].isalpha():
                pos += 1
            continue
        if c == "<":
            i = s.find(">", pos + 1, pos + 22)
            if i > pos + 1:
                pos = i + 1
                continue  # next step may chain another tag / newline
            # failed tag: '<' joins the segment's nonword text below
        end = s.find("\n", pos)
        if end == -1:
            end = n
        runs = findall(s, pos, end)
        for run in runs:
            if run.isalpha():
                out.append(run)
            else:
                out.extend(_split_isalpha(run))
        pos = end
    return out

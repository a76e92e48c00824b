"""HTML text extraction: HTML string -> concatenated text fragments.

Behavioral port of the reference HTML part parser + extraction loop
(/root/reference/src/proc3/html_parse2.rs:69-360 and
/root/reference/src/proc3/indexer.rs:97-173). The output string is the
byte-identity invariant artifact ("extracted text per url").

Replicated fidelity quirks (SURVEY.md §2.2):

- Q1: after the first *named* character reference matches, the parser
  continues on the matched entity-name span itself
  (html_parse2.rs:341-346 returns the consumed prefix as the rest), so
  the decoded value is emitted, the entity name is re-emitted as text,
  and the remainder of the document is dropped.
- Q2: a NUL byte is consumed by no alternative, so the parse errors and
  extraction stops there (html_parse2.rs:261, indexer.rs:145-157).
- Q4: an unparseable ``<`` or ``&`` is emitted as literal text
  (html_parse2.rs:88-93); a start tag needs ``<`` + ASCII-alpha, an end
  tag ``</`` + ASCII-alpha (html_parse2.rs:141-168).
- Comments end at the *first* ``>`` reached by the comment state machine
  (html_parse2.rs:192-255), e.g. ``<!-- a > b -->`` ends after ``a >``.
- CDATA sections end after ``]]`` with no ``>`` consumed
  (html_parse2.rs:95-132), so the ``>`` of ``]]>`` is emitted as text.

The parser is a chunked scanner: plain-text runs are consumed with one
compiled-regex match (the hot path), markup at ``<`` / ``&`` is handled
with small state machines, matching the reference grammar exactly.
"""

from __future__ import annotations

import html.entities
import re

# The reference named-charref tables (named_char.rs NAMED_CHAR /
# NAMED_CHAR_VAL, 2231 entries) are byte-identical to Python's stdlib
# html.entities.html5 (verified entry-by-entry; both derive from the
# WHATWG HTML5 named character reference data).
_NAMED = {k.encode("ascii"): v for k, v in html.entities.html5.items()}

# parse_text: take_while1(c != '<' && c != '&' && c != '\0')  (html_parse2.rs:261)
_TEXT_RUN = re.compile(r"[^<&\x00]+")

# up to 32 name bytes are collected (html_parse2.rs:330)
_NAME_MAX = 32


def _unto(s: str, pos: int, ch: str) -> int:
    """Consume up to and including ``ch``; whole input if absent (html_parse2.rs:362-388)."""
    i = s.find(ch, pos)
    return len(s) if i < 0 else i + 1


def _comment_rest(s: str, pos: int) -> int:
    """State machine of parse_comment_rest (html_parse2.rs:192-255).

    Consumes until ``-->`` / ``--!>`` / ``->`` / bare ``>`` / EOF per the
    reference's nested match structure; returns the end position.
    """
    n = len(s)
    i = pos
    while True:
        if i >= n:
            return n
        c = s[i]
        i += 1
        if c == ">":
            return i
        if c != "-":
            continue
        # second char
        if i >= n:
            return n
        c = s[i]
        i += 1
        if c == ">":
            return i
        if c != "-":
            continue
        # third char
        if i >= n:
            return n
        c = s[i]
        i += 1
        if c == ">":
            return i
        if c == "-":
            continue
        if c != "!":
            continue
        # fourth char (after "--!")
        if i >= n:
            return n
        c = s[i]
        i += 1
        if c == ">":
            return i
        continue


def _cdata_rest(s: str, pos: int) -> int:
    """State machine of parse_cdata_rest (html_parse2.rs:106-132).

    Consumes until ``]]`` (inclusive) or EOF. Note the pair-skip: after a
    ``]`` followed by a non-``]``, both characters are consumed before
    rescanning.
    """
    n = len(s)
    i = pos
    while True:
        if i >= n:
            return n
        c = s[i]
        i += 1
        if c != "]":
            continue
        if i >= n:
            return n
        c = s[i]
        i += 1
        if c == "]":
            return i
        continue


def _named_charref(s: str, pos: int):
    """tok_named_charref port (html_parse2.rs:329-360).

    Returns ``(matched_len, value)`` or None. Matching is shortest-prefix:
    at each added char the accumulated byte prefix is looked up for an
    exact table entry. Chars with code > 256 end the scan; codes <= 256
    are truncated to a byte (``c as u8``) exactly like the reference.
    """
    name = bytearray()
    i = pos
    n = len(s)
    while i < n:
        c = s[i]
        o = ord(c)
        if o > 256:
            break
        name.append(o & 0xFF)
        val = _NAMED.get(bytes(name))
        if val is not None:
            return (len(name), val)
        if c == ";":
            break
        i += 1
        if len(name) >= _NAME_MAX:
            break
    return None


_MAX_U32 = 0xFFFFFFFF


def _valid_char(code: int):
    """char::from_u32 semantics: None for surrogates and > 0x10FFFF."""
    if code > 0x10FFFF or (0xD800 <= code <= 0xDFFF):
        return None
    return chr(code)


def _charref(s: str, pos: int):
    """parse_charref port (html_parse2.rs:279-326). ``pos`` is at ``&``.

    Returns one of:
      ("str", value, name_str)  -- named charref (Q1: caller truncates doc)
      ("chr", ch, end_pos)      -- numeric charref
      None                      -- no charref; ``&`` falls through to text
    """
    p = pos + 1
    n = len(s)
    if p >= n:
        return None
    c = s[p]
    # named: fsense(is_ascii_alphanumeric) then tok_named_charref
    if ("0" <= c <= "9") or ("a" <= c <= "z") or ("A" <= c <= "Z"):
        m = _named_charref(s, p)
        if m is not None:
            ln, val = m
            return ("str", val, s[p : p + ln])
        return None
    if c != "#":
        return None
    # decimal: tag("#") + digits + opt(';')
    p += 1
    j = p
    while j < n and "0" <= s[j] <= "9":
        j += 1
    if j > p:
        v = int(s[p:j])
        if v <= _MAX_U32:
            ch = _valid_char(v)
            if ch is not None:
                if j < n and s[j] == ";":
                    j += 1
                return ("chr", ch, j)
        return None
    # hex: tag("#X") / tag("#x") + hexdigits + opt(';')
    if p < n and s[p] in "Xx":
        p += 1
        j = p
        while j < n and (("0" <= s[j] <= "9") or ("a" <= s[j] <= "f") or ("A" <= s[j] <= "F")):
            j += 1
        if j > p:
            v = int(s[p:j], 16)
            if v <= _MAX_U32:
                ch = _valid_char(v)
                if ch is not None:
                    if j < n and s[j] == ";":
                        j += 1
                    return ("chr", ch, j)
        return None
    return None


def _is_ascii_alpha(c: str) -> bool:
    return ("a" <= c <= "z") or ("A" <= c <= "Z")


def extract_html_text(s: str) -> str:
    """Run the extraction loop of index_html2 (indexer.rs:97-159).

    Text fragments and decoded charrefs are concatenated; tags, comments,
    doctype, cdata and bogus parts are dropped; a parse error (NUL byte)
    or the Q1 named-charref truncation ends the document.
    """
    out: list[str] = []
    pos = 0
    n = len(s)
    text_run = _TEXT_RUN
    while pos < n:
        # parse_text first (alt order, html_parse2.rs:72-83)
        m = text_run.match(s, pos)
        if m is not None:
            out.append(m.group())
            pos = m.end()
            continue
        c = s[pos]
        if c == "&":
            r = _charref(s, pos)
            if r is None:
                out.append("&")  # parse_lt_amp (Q4)
                pos += 1
                continue
            if r[0] == "chr":
                out.append(r[1])
                pos = r[2]
                continue
            # Q1: named charref — decoded value, then the matched name span
            # becomes the whole remaining input; it is pure alnum text, so
            # it is emitted and the parse reaches Eof.
            out.append(r[1])
            out.append(r[2])
            return "".join(out)
        if c == "<":
            # comment
            if s.startswith("<!--", pos):
                pos = _comment_rest(s, pos + 4)
                continue
            # cdata: tag("<!") + tag_no_case("[cdata[")
            if s.startswith("<!", pos) and s[pos + 2 : pos + 9].lower() == "[cdata[":
                pos = _cdata_rest(s, pos + 9)
                continue
            # bogus: tag("<?") + unto('>')
            if s.startswith("<?", pos):
                pos = _unto(s, pos + 2, ">")
                continue
            # doctype: tag_no_case("<!doctype") + unto('>')
            if s[pos : pos + 9].lower() == "<!doctype":
                pos = _unto(s, pos + 9, ">")
                continue
            # endtag: "</" + ascii-alpha + unto('>')
            if s.startswith("</", pos) and pos + 2 < n and _is_ascii_alpha(s[pos + 2]):
                pos = _unto(s, pos + 3, ">")
                continue
            # starttag: "<" + ascii-alpha + unto('>')
            if pos + 1 < n and _is_ascii_alpha(s[pos + 1]):
                pos = _unto(s, pos + 2, ">")
                continue
            out.append("<")  # parse_lt_amp (Q4)
            pos += 1
            continue
        # NUL: no alternative consumes it -> parse error -> stop (Q2/Q3)
        break
    return "".join(out)

"""HTML extractor conformance.

The grammar vectors are transcribed from the reference's inline parser
tests (/root/reference/src/proc3/html_parse2.rs:391-517) and re-expressed
at the extraction level (the reference asserts parser accept/reject; we
assert the observable consequence on extracted text, which is the
byte-identity artifact). Quirk cases Q1-Q4 per SURVEY.md §2.2.
"""

from textindex_ray.kernel.html_extract import (
    extract_html_text,
    _comment_rest,
    _cdata_rest,
    _charref,
    _named_charref,
)


def test_text_runs():
    # test_text (html_parse2.rs:486-504): text stops at '<', '&', '\0'
    assert extract_html_text("plain text only") == "plain text only"
    assert extract_html_text("tex<b>tex") == "textex"
    # NUL stops the whole document (Q2)
    assert extract_html_text("t\0e\0x\0<\0t\0e\0x\0") == "t"
    assert extract_html_text("before\0after") == "before"


def test_starttag_endtag():
    # test_starttag / test_endtag (html_parse2.rs:437-454)
    assert extract_html_text("<a>x</a>") == "x"
    assert extract_html_text('a<a href="&lt&gt">b') == "ab"
    # "</ FONT>" is NOT an end tag (no alpha after </) -> '<' as text (Q4)
    assert extract_html_text("</ FONT>") == "</ FONT>"
    # unterminated tag consumes to EOF
    assert extract_html_text("x<a unterminated") == "x"
    assert extract_html_text("x</asdf") == "x"


def test_lt_amp_fallback():
    # test_html (html_parse2.rs:507-516): "<:)---*" parses ('<' as text)
    assert extract_html_text("<:)---*") == "<:)---*"
    assert extract_html_text("*---(:>     MrDouble's Palisades     <:)---*") == (
        "*---(:>     MrDouble's Palisades     <:)---*"
    )
    assert extract_html_text("a < b") == "a < b"
    assert extract_html_text("a & b") == "a & b"
    assert extract_html_text("<!x") == "<!x"


def test_comment_forms():
    # test_comment (html_parse2.rs:467-484)
    assert extract_html_text("a<!--c-->b") == "ab"
    assert extract_html_text("a<!-->b") == "ab"        # ends at first '>'
    assert extract_html_text("a<!--->b") == "ab"
    assert extract_html_text("a<!---->b") == "ab"
    assert extract_html_text("a<!----->b") == "ab"
    assert extract_html_text("a<!------>b") == "ab"
    assert extract_html_text("a<!--!---->b") == "ab"
    assert extract_html_text("a<!--!>b") == "ab"
    # comment ends at the FIRST '>' hit by the state machine
    assert extract_html_text("a<!-- x > y -->b") == "a y -->b"
    # unterminated comment eats the rest
    assert extract_html_text("a<!--doctype") == "a"


def test_comment_rest_machine():
    assert _comment_rest("c-->b", 0) == 4
    assert _comment_rest(">b", 0) == 1
    assert _comment_rest("->b", 0) == 2
    assert _comment_rest("!---->b", 0) == 6
    assert _comment_rest("--!>b", 0) == 4
    assert _comment_rest("no end", 0) == 6


def test_cdata():
    # test_cdata (html_parse2.rs:402-426): "]]" terminates, no '>' required
    assert extract_html_text("a<![CDATA[junk]]b") == "ab"
    # '>' after ]] is literal text (grammar consumes only through ]])
    assert extract_html_text("a<![CDATA[junk]]>b") == "a>b"
    assert extract_html_text("a<![CDATA[>") == "a"          # unterminated
    assert extract_html_text("a<![CDATA[]>") == "a"         # ']>' pair-skips
    assert extract_html_text("a<![cdata[x]]b") == "ab"      # case-insensitive
    assert extract_html_text("a<![CDATA") == "a<![CDATA"    # too short -> not cdata; '<' text
    assert _cdata_rest("bla]b]]x", 0) == 7
    assert _cdata_rest("]x]]", 0) == 4


def test_bogus_doctype():
    # test_bogus (html_parse2.rs:429-434), test_doctype (457-464)
    assert extract_html_text("a<?asdfasdf>asdf") == "aasdf"
    assert extract_html_text("a<?unterminated") == "a"
    assert extract_html_text("a<!doctype bla bla>b") == "ab"
    assert extract_html_text("a<!DOCTYPE html>b") == "ab"
    assert extract_html_text("a<!doctype") == "a"


def test_numeric_charrefs():
    assert extract_html_text("a&#65;b") == "aAb"
    assert extract_html_text("a&#65b") == "aAb"        # ';' optional
    assert extract_html_text("a&#x41;b") == "aAb"
    assert extract_html_text("a&#X41;b") == "aAb"
    assert extract_html_text("a&#120171;b") == "a\U0001d56bb"
    # invalid codepoints -> '&' as text, rest reparsed
    assert extract_html_text("a&#xD800;b") == "a&#xD800;b"
    assert extract_html_text("a&#1114112;b") == "a&#1114112;b"   # > 0x10FFFF
    assert extract_html_text("a&#99999999999999999999;b") == "a&#99999999999999999999;b"
    assert extract_html_text("a&#;b") == "a&#;b"
    assert extract_html_text("a&#zz") == "a&#zz"


def test_named_charref_q1():
    # Q1: value emitted, then the matched name, then the document ends.
    assert extract_html_text("a&amp;xyz more text") == "a&amp"
    assert extract_html_text("a&lt;xyz") == "a<lt"
    # shortest-prefix: "&ampx" matches "amp" (no semicolon entry)
    assert extract_html_text("a&ampx tail") == "a&amp"
    # no-match alnum run -> '&' as text
    assert extract_html_text("a&zzqq;b") == "a&zzqq;b"
    assert extract_html_text("a&x9;b") == "a&x9;b"
    # '&' at EOF / before non-alnum
    assert extract_html_text("a&") == "a&"
    assert extract_html_text("a& b") == "a& b"


def test_named_charref_tok():
    assert _named_charref("amp;x", 0) == (3, "&")
    assert _named_charref("Abreve;x", 0) == (7, "Ă")
    # "Abreve" without ';' is not an entry -> needs the ';'
    assert _named_charref("Abreve x", 0) is None
    assert _named_charref("zzz;", 0) is None
    n = _charref("&notin;", 0)
    # shortest prefix: "not" is an entry -> matches before "notin;"
    assert n == ("str", "\xac", "not")


def test_eof_and_empty():
    assert extract_html_text("") == ""
    assert extract_html_text("<") == "<"
    assert extract_html_text("&") == "&"


def test_multiline_document():
    html = (
        "<!DOCTYPE html>\n<html>\n<head><title>T1 T2</title></head>\n"
        "<body>\n<p>Hello World</p>\n<!-- hidden -->\n<div class='x'>Nested</div>\n"
        "</body>\n</html>\n"
    )
    assert extract_html_text(html) == "\n\nT1 T2\n\nHello World\n\nNested\n\n\n"

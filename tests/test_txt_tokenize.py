"""Text tokenizer conformance (grammar quirks Q5-Q7, SURVEY.md §2.2).

Vectors derived from the reference grammar
(/root/reference/src/proc3/txt_parse.rs) and indexing loop
(/root/reference/src/proc3/indexer.rs:25-95).
"""

from textindex_ray.kernel.txt_tokenize import (
    tokenize_text,
    tokenize_counts,
    _iter_words,
    _try_pgp,
    _try_base64,
    _try_base64_v2,
    _try_key_value,
)


def words(s):
    return list(_iter_words(s))


def test_word_splitting_q7():
    # words are alphabetic runs; digits/underscore/punct split
    assert words("hello world") == ["hello", "world"]
    assert words("fox123jumps") == ["fox", "jumps"]
    assert words("under_score") == ["under", "score"]
    assert words("don't stop") == ["don", "t", "stop"]
    assert words("härte müde") == ["härte", "müde"]
    assert words("42 7x") == ["x"]
    assert words("") == []


def test_tag_skip_q6():
    # parse_tag only fires when a parse step STARTS at '<' (doc start or
    # right after a newline); elsewhere the '<' is swallowed by the
    # preceding nonword run and the tag body is parsed as words.
    assert words("<tag> b") == ["b"]
    assert words("x\n<tag> y") == ["x", "y"]
    # tag body may span a newline
    assert words("<ta\ng> b") == ["b"]
    # > 20 chars before '>': not a tag -> '<' nonword, content words
    assert words("<abcdefghijklmnopqrstuvw> b") == ["abcdefghijklmnopqrstuvw", "b"]
    # exactly 20 chars inside is still a tag
    assert words("<abcdefghijklmnopqrst> b") == ["b"]
    # empty tag '<>' is not a tag
    assert words("<> b") == ["b"]
    # '<' mid-nonword-run is swallowed, not a tag boundary
    assert words("a <tag> b") == ["a", "tag", "b"]
    assert words("x, <tag> y") == ["x", "tag", "y"]
    # '<' directly after a word: the nonword run stops at alpha 't'
    assert words("a<tag> b") == ["a", "tag", "b"]


def test_keyvalue_q5():
    # first line can never match a special
    assert words("Key: value one\nplain words") == ["Key", "value", "one", "plain", "words"]
    # after a newline, 'Key-Words*: ...' line is skipped entirely
    assert words("first\nKey-Words*: skip these\nlast") == ["first", "last"]
    # empty key (line starting with ':') is a KeyValue
    assert words("first\n: skipped\nlast") == ["first", "last"]
    # key chars are only [A-Za-z0-9-*]: space before ':' breaks the match
    assert words("first\nnot a: key\nlast") == ["first", "not", "a", "key", "last"]
    # leading whitespace after the newline is allowed
    assert words("first\n   K: skip\nlast") == ["first", "last"]


def test_pgp_block():
    s = "head\n-----BEGIN PGP SIGNATURE-----\nVersion: 1\nabcd\n-----END PGP SIGNATURE-----\ntail"
    assert words(s) == ["head", "tail"]
    # unterminated pgp falls back to normal parsing of the lines
    s2 = "head\n-----BEGIN PGP SIGNATURE-----\nabcd efgh"
    assert words(s2) == ["head", "BEGIN", "PGP", "SIGNATURE", "abcd", "efgh"]


def test_pgp_on_first_line_not_special():
    s = "-----BEGIN PGP SIGNATURE-----\nx\n-----END PGP SIGNATURE-----"
    # first line: the special is not attempted (Q5)
    w = words(s)
    assert w[:3] == ["BEGIN", "PGP", "SIGNATURE"]


def test_base64_uu():
    s = "head\nbegin 644 file.bin\nM86)C\nM98*7\n`\nend\ntail"
    assert words(s) == ["head", "tail"]
    # missing backtick terminator -> rewind, lines parsed normally
    s2 = "head\nbegin 644 f\nMdata"
    assert words(s2) == ["head", "begin", "f", "Mdata"]


def test_base64_v2():
    s = "head\nBEGIN block\ndata line one\nEND block\ntail"
    assert words(s) == ["head", "tail"]
    s2 = "head\nBEGINx\nq\nEND\ntail"
    assert words(s2) == ["head", "tail"]  # 'BEGIN' is a prefix tag


def test_special_helpers_direct():
    assert _try_key_value("K: v\nx", 0) == 4
    assert _try_key_value("K v: x\n", 0) is None
    s = "-----BEGIN PGP SIGNATURE-----\nx\n-----END PGP SIGNATURE-----x\ny"
    assert _try_pgp(s, 0) == s.index("x\ny") + 1
    assert _try_base64("begin\nx\n`\nend\n", 0) == 13
    assert _try_base64_v2("BEGIN\nx\nEND rest\ny", 0) == 16


def test_crlf_handling():
    # '\r\n' : specials attempted at '\r' (ws skip eats '\n'), and again at '\n'
    assert words("first\r\nK: skip\nlast") == ["first", "last"]
    # bare '\r' after a word is swallowed by the trailing nonword run
    # (tok_non_word0 accepts '\r'), so specials are NOT attempted there
    assert words("first\rK: skip\nlast") == ["first", "K", "skip", "last"]
    # but a '\r' at a parse-step boundary does anchor specials
    assert words("first\n\rK: skip\nlast") == ["first", "last"]


def test_normalization_and_stopwords():
    # lowercase + trilingual stopword filter (indexer.rs:52-58)
    terms, n_words = tokenize_text("The Quick Brown Fox AND der Hund")
    assert n_words == 7
    # the/and/der are stopwords (en/de); 'hund' is not in the list
    assert terms == ["quick", "brown", "fox", "hund"]


def test_counts_and_dl():
    tf, dl, n_words = tokenize_counts("alpha beta alpha the gamma alpha beta")
    assert tf == {"alpha": 3, "beta": 2, "gamma": 1}
    assert dl == 6          # non-stopword tokens ('the' filtered)
    assert n_words == 7     # raw word count


def test_truncation_goldens():
    # tests/test_index2.rs:266-285
    from textindex_ray.kernel.truncate import truncate_term

    assert truncate_term("abcdefghijklmnopqrsü") == "abcdefghijklmnopqrs"
    assert truncate_term("ü" * 20) == "ü" * 9
    assert truncate_term("a" * 19) == "a" * 19
    assert truncate_term("a" * 20) == "a" * 20
    assert truncate_term("a" * 25) == "a" * 20
    # exactly 20 bytes ending in ASCII: the backwards trim stops at 'y'
    assert truncate_term("ü" * 9 + "xy") == "ü" * 9 + "xy"
    # 21 bytes: cut at 20 leaves a dangling lead byte, which is stripped
    assert truncate_term("ü" * 9 + "xz" + "é") == "ü" * 9 + "xz"
    terms, _ = tokenize_text("abcdefghijklmnopqrsü" + "1 tail")
    assert terms == ["abcdefghijklmnopqrs", "tail"]

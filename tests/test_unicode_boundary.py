"""Unicode-divergence guard (FIXTURES.md §5).

Rust ``char::is_alphabetic``/``to_lowercase`` and Python
``str.isalpha``/``lower`` diverge on a few code points. The corpus
generator restricts itself to the agreement subset; this test pins the
engine's behavior on the known-divergent points so any future change is
deliberate, and asserts engine == oracle == kernel on them (the engine
is self-consistent even where Rust would differ).
"""

from textindex_ray.kernel.txt_tokenize import _iter_words, _iter_words_ref, tokenize_text


def test_divergent_codepoints_self_consistent():
    cases = [
        "İstanbul dotted I",      # U+0130: lowers to 'i̇' (2 cp) in Python
        "ŉout legacy ligature",   # U+0149
        "ʼn apostrophe n",
        "ẞ capital sharp s",      # lowers to ß
        "ǅungla titlecase digraph",  # U+01C5: isalpha True (Lt)
        "Ⅻ roman numeral",        # Nl: Rust alphabetic, Python not isalpha
        "①②③ circled digits",     # No
        "ₓ subscript letter",     # Lm
    ]
    for s in cases:
        fast = list(_iter_words(s))
        ref = list(_iter_words_ref(s))
        assert fast == ref, s


def test_documented_divergences():
    # U+0130 'İ'.lower() in Python is 'i̇' (i + combining dot); Rust
    # to_lowercase yields the same two code points — these agree.
    terms, _ = tokenize_text("İstanbul")
    assert terms == ["i̇stanbul"]
    # Ⅻ (U+216B, Nl): Rust is_alphabetic=True would make it a word char;
    # Python isalpha=False -> the engine splits on it. Pinned engine
    # behavior (corpus generator never emits Nl/No code points):
    assert list(_iter_words("abⅫcd")) == ["ab", "cd"]
    # German ß unaffected by lowercase (both sides)
    terms, _ = tokenize_text("Straße")
    assert terms == ["straße"]

"""Fuzz equivalence: segment-vectorized tokenizer == step-at-a-time
reference port, over adversarial inputs covering the grammar's edge
characters."""

from hypothesis import given, settings, strategies as st

from textindex_ray.kernel.txt_tokenize import _iter_words, _iter_words_ref

# alphabet weighted toward the grammar's control characters
_ALPHA = (
    "ab zü<>`:\n\r\t-*?."
    "BEGINENDbeginend PGP SIGNATURE-"
    "Ⅻ½"  # \w-but-not-isalpha edge chars
)


@settings(max_examples=400, deadline=None)
@given(st.text(alphabet=_ALPHA, max_size=300))
def test_fast_equals_reference(s):
    assert list(_iter_words(s)) == list(_iter_words_ref(s))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_fast_equals_reference_unicode(s):
    assert list(_iter_words(s)) == list(_iter_words_ref(s))


def test_handwritten_edges():
    cases = [
        "",
        "\r",
        "\n",
        "<",
        "<>",
        "<a\nb> c",
        "<a><b>x",
        "x\n<a>\rKey: skip\nrest",
        "\rBEGIN x\ny\nEND x\nz",
        "a\nbegin x\nq\n`\nend\ntail",
        "-----BEGIN PGP SIGNATURE-----\nx",
        "w\n-----BEGIN PGP SIGNATURE-----\nv: 1\nab\n-----END PGP SIGNATURE-----\nt",
        "a<" + "x" * 25 + "> b",
        "Ⅻabc½def",
        "\n\n\n",
        "a\r\rK: v\nx",
    ]
    for s in cases:
        assert list(_iter_words(s)) == list(_iter_words_ref(s)), repr(s)

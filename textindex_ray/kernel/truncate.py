"""UTF-8-safe fixed-width term truncation.

Behavioral port of copy_fix::<20> + the NUL-trim on decode
(/root/reference/src/index2.rs:598-635). Terms whose UTF-8 encoding is
>= 20 bytes are cut at 20 bytes and the trailing (possibly complete)
multi-byte sequence is stripped: scanning backwards, continuation bytes
(0x80-0xBF) are cleared, a lead byte (>= 0xC0) is cleared and the scan
stops, an ASCII byte stops the scan. Goldens from
/root/reference/tests/test_index2.rs:266-285:
``"abcdefghijklmnopqrsü"`` -> ``"abcdefghijklmnopqrs"``; 20 x ``ü`` ->
9 x ``ü``.

Note the reference applies this when persisting the vocabulary; per
SURVEY.md §1.3 this engine canonicalizes persisted-index semantics by
applying it at tokenize time.
"""

from __future__ import annotations

TERM_BYTES = 20  # words.rs:28-35 (20-byte fixed word field)


def truncate_term(term: str, limit: int = TERM_BYTES) -> str:
    b = term.encode("utf-8")
    if len(b) < limit:
        return term
    cut = bytearray(b[:limit])
    for i in range(limit - 1, -1, -1):
        x = cut[i]
        if x >= 0xC0:
            cut[i] = 0
            break
        elif x >= 0x80:
            cut[i] = 0
        else:
            break
    # NUL-trim on decode (index2.rs:621-635): stored bytes before first NUL
    end = len(cut)
    while end > 0 and cut[end - 1] == 0:
        end -= 1
    return bytes(cut[:end]).decode("utf-8")

"""Porter-lite stemmer (north star: "tokenize/stem source-code content").

Design: stemming is applied to the VOCABULARY, not to token
occurrences.  The Arrow tokenize kernel dictionary-encodes each slice
(term → int32 code), so the stemmer runs once per DISTINCT term and the
occurrence-level work is a vectorized int remap + one Arrow re-group —
the same trick the reference uses by interning strings before its hash
aggregations.  One shared ``stem_token`` function serves the engine
kernel AND the pure-Python oracle, so rank-identity is by construction
rather than by keeping two regex pipelines in sync.

The algorithm is deliberately Porter-LITE: the high-yield suffix steps
(plurals, -ed/-ing with vowel guard, y→i, common derivational endings),
deterministic and ASCII-only.  Identifier-ish tokens (digits or
underscores) pass through untouched — stemming `foo_bars` or `utf8`
would corrupt code search.
"""

from __future__ import annotations

_VOWELS = set("aeiou")

_STEP3 = (
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("iviti", "ive"),
    ("aliti", "al"),
    ("ment", ""),
    ("ness", ""),
)


def _has_vowel(s: str) -> bool:
    return any(c in _VOWELS for c in s)


def stem_token(t: str) -> str:
    """Deterministic Porter-lite stem of one token.  Tokens of length
    ≤ 3 or containing non-letters (identifiers, numbers) are returned
    unchanged."""
    if len(t) <= 3 or not t.isascii() or not t.isalpha():
        return t
    # step 1a: plurals
    if t.endswith("sses"):
        t = t[:-2]
    elif t.endswith("ies") and len(t) > 4:
        t = t[:-2]
    elif (
        t.endswith("s")
        and not t.endswith("ss")
        and not t.endswith("us")
        and not t.endswith("is")
    ):
        t = t[:-1]
    # step 1b: -ed / -ing (with vowel in the remaining stem)
    for suf in ("ingly", "edly", "ing", "ed"):
        if t.endswith(suf) and len(t) - len(suf) >= 3 and _has_vowel(t[: -len(suf)]):
            t = t[: -len(suf)]
            if t.endswith(("at", "bl", "iz")):
                t += "e"
            elif len(t) >= 2 and t[-1] == t[-2] and t[-1] not in "lsz":
                t = t[:-1]
            break
    # step 1c: y → i after a vowel
    if t.endswith("y") and len(t) > 3 and _has_vowel(t[:-1]):
        t = t[:-1] + "i"
    # step 2/3: common derivational suffixes
    for suf, rep in _STEP3:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            t = t[: -len(suf)] + rep
            break
    return t


def stem_vocab_codes(vocab):
    """Stem a pyarrow string dictionary; returns (new_vocab pa.Array,
    code_map np.ndarray) with code_map[old_code] = new_code.  Cost is
    O(|vocab|) Python — bounded by distinct terms per slice, not token
    occurrences."""
    import numpy as np
    import pyarrow as pa

    terms = vocab.to_pylist()
    stemmed = np.asarray([stem_token(t) for t in terms], dtype=object)
    uniq, inv = np.unique(stemmed, return_inverse=True)
    return pa.array(uniq.tolist(), type=pa.string()), inv.astype(np.int64)

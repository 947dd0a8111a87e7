"""Porter2 (Snowball English) stemmer — pure-Python, from the published
algorithm description (https://snowballstem.org/algorithms/english/stemmer.html).

The reference engine stems with PISA's built-in ``porter2`` stemmer
(reference: ``src/pyterrier_pisa/__init__.py:27-50`` enum,
``_pisathon.cpp:145-148`` wiring, default ``porter2`` at ``__init__.py:117``).
We re-implement the same public algorithm here because the container has no
PyStemmer/nltk; the golden pair ``worlds -> world`` is pinned by the
reference's ``tests/test_tokenize.py:10-11``.

This module is deliberately dependency-free so it can be shipped to executors
via ``spark-submit --py-files`` and called inside Arrow-batched pandas UDFs
(with per-batch memoization — token vocabularies are Zipfian, so the cache hit
rate is high and the per-unique-token Python cost amortizes to near zero).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDINGS = frozenset("cdeghkmnrt")

_EXCEPTIONAL = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

_EXCEPTIONAL_1A = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed"]
)

# step 2 suffix -> replacement (longest-match-wins ordering handled at lookup)
_STEP2 = [
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
]

_STEP3 = [
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ful", ""),
    ("ness", ""),
]

_STEP4 = [
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "al",
    "er",
    "ic",
]


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """Return (r1_start, r2_start) as indices into ``word``."""
    n = len(word)
    r1 = n
    # exceptional region-1 prefixes
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if word ends in a short syllable."""
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        a, b, c = word[-3], word[-2], word[-1]
        return (
            a not in _VOWELS
            and b in _VOWELS
            and c not in _VOWELS
            and c not in "wxY"
        )
    return False


def _is_short(word: str, r1: int) -> bool:
    return r1 >= len(word) and _ends_short_syllable(word)


def _contains_vowel(word: str) -> bool:
    return any(ch in _VOWELS for ch in word)


def stem(token: str) -> str:
    """Stem a single lowercase token with the Porter2 algorithm."""
    word = token
    if len(word) <= 2:
        return word
    if word[0] == "'":
        word = word[1:]
    exc = _EXCEPTIONAL.get(word)
    if exc is not None:
        return exc

    # mark consonant-y as Y
    chars = list(word)
    if chars and chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _regions(word)

    # step 0
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith("us") or word.endswith("ss"):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONAL_1A:
        return word.replace("Y", "y")

    # step 1b
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short(word, r1):
                        word += "e"
                break

    # step 1c
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # step 2
    for suf, repl in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + repl
            break
    else:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and len(word) >= 4 and word[-4] == "l":
                word = word[:-1]
        elif word.endswith("li"):
            if len(word) - 2 >= r1 and len(word) >= 3 and word[-3] in _LI_ENDINGS:
                word = word[:-2]

    # step 3
    for suf, repl in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + repl
            break
    else:
        if word.endswith("ative"):
            if len(word) - 5 >= r2:
                word = word[:-5]

    # step 4
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                word = word[: -len(suf)]
            break
    else:
        if word.endswith("ion"):
            if len(word) - 3 >= r2 and len(word) >= 4 and word[-4] in "st":
                word = word[:-3]

    # step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")


# Optional fast path: PyStemmer (the Snowball project's own C bindings,
# algorithm-identical porter2/"english") — used transparently when importable
# (not in this container; the from-spec Python above is the vendored default).
# Disable with PYTERRIER_PISA_SPARK_NO_PYSTEMMER=1 for strict reproducibility.
_PYSTEMMER = None
try:  # pragma: no cover - PyStemmer absent in the build sandbox
    import os as _os

    if _os.environ.get("PYTERRIER_PISA_SPARK_NO_PYSTEMMER") != "1":
        import Stemmer as _Stemmer  # noqa: N811

        _PYSTEMMER = _Stemmer.Stemmer("english").stemWord
except Exception:
    _PYSTEMMER = None

_stem_impl = _PYSTEMMER or stem


def stemmer_backend() -> str:
    """Which porter2 implementation is ACTIVE in this process. The two
    backends are algorithm-identical on every Snowball test vector, but index
    contents must never silently depend on an optional import: ``build_index``
    records this value into ``meta.json`` and ``load_index`` warns when the
    querying process resolves a different backend."""
    return "pystemmer" if _PYSTEMMER is not None else "vendored"


def check_stemmer_backend(meta: dict) -> None:
    """Warn if an index built under one porter2 backend is being queried under
    the other (an edge-case divergence between them would silently mismatch
    stems between index and query vocabularies)."""
    built = meta.get("stemmer_backend")
    if built and meta.get("stemmer") == "porter2" and built != stemmer_backend():
        import warnings

        warnings.warn(
            f"index was built with porter2 backend {built!r} but this process "
            f"resolves {stemmer_backend()!r}; stems could diverge on edge "
            "cases. Set PYTERRIER_PISA_SPARK_NO_PYSTEMMER=1 (or install "
            "PyStemmer) to match the build environment.",
            RuntimeWarning, stacklevel=2)

# PROCESS-LIFETIME stem memo: Spark reuses Python workers across Arrow batches
# and tasks (spark.python.worker.reuse), so a module-global cache amortizes the
# Zipf head of the vocabulary across the WHOLE build a worker participates in,
# not just one batch. Bounded so an adversarial unbounded vocabulary cannot
# grow worker memory without limit (at the cap the long tail is stemmed
# directly — by Zipf's law those tokens are rare).
_MEMO: dict[str, str] = {}
_MEMO_MAX = 2_000_000


class CachedStemmer:
    """Memoizing wrapper over the process-lifetime stem memo — vocabulary is
    Zipfian, so per-unique-token cost amortizes to ~0 across all Arrow
    batches a reused Python worker processes. ``shared=False`` gives an
    isolated per-instance cache (tests)."""

    __slots__ = ("_cache",)

    def __init__(self, shared: bool = True) -> None:
        self._cache: dict[str, str] = _MEMO if shared else {}

    def __call__(self, token: str) -> str:
        cache = self._cache
        cached = cache.get(token)
        if cached is None:
            cached = _stem_impl(token)
            if len(cache) < _MEMO_MAX:
                cache[token] = cached
        return cached

    def stem_unique(self, tokens) -> list[str]:
        """Stem a sequence of (ideally unique) tokens — the vectorized
        tokenizer's per-batch vocabulary pass."""
        return [self(t) for t in tokens]

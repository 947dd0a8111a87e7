"""Tokenization + stemming — the engine's only per-row "UDF" surface.

Semantics mirror the reference's ``EnglishTokenizer``: lowercase alphanumeric
word tokens, punctuation dropped (``'hello worlds!' -> ['hello','worlds']``,
reference ``README.md:125-127``, ``_pisathon.cpp:612-632``), optional Porter2
stemming (reference default stemmer, ``__init__.py:117``), newline/CR scrub
before tokenization (reference ``indexers.py:74``).

Everything is Arrow-vectorized: the only Python loop is over tokens inside a
pandas batch, with a memoized stemmer (Zipfian vocab => high hit rate). No
row-at-a-time ``udf()`` anywhere (BASELINE.json input_hint: "vectorized
pandas/Arrow UDFs (no per-row Python)").
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .porter2 import CachedStemmer

# Reference tokenizer: maximal runs of lowercase alphanumerics after
# lowercasing (pisa EnglishTokenizer semantics pinned by
# reference tests/test_tokenize.py:10-11).
_TOKEN_RE = re.compile(r"[a-z0-9]+")

STEMMERS = ("porter2", "none")

# The reference also enumerates 'krovetz' (``__init__.py:45``, wired to the
# Lemur KStem C++ in ``_pisathon.cpp:145-148``). KStem is a DICTIONARY-driven
# stemmer: faithful behavior requires the Lemur head-word dictionary (tens of
# thousands of entries), which is data we deliberately do not vendor; a
# rules-only approximation would silently diverge from the reference and
# corrupt cross-engine index compatibility. Requests fail loudly instead.
_KROVETZ_MSG = (
    "stemmer 'krovetz' is not implemented: KStem requires the Lemur "
    "dictionary (not vendored). Use stemmer='porter2' (the reference "
    "default) or stemmer='none', or pre-tokenize the corpus (toks path) "
    "with your own Krovetz implementation."
)


def _check_stemmer(stemmer: str) -> None:
    if stemmer == "krovetz":
        raise NotImplementedError(_KROVETZ_MSG)
    if stemmer not in STEMMERS:
        raise ValueError(f"unknown stemmer {stemmer!r}; choose from {STEMMERS}")


def tokenize_text(text: str, stemmer: str = "porter2") -> list[str]:
    """Driver-side single-string tokenize (reference ``tokenize()`` public fn,
    ``__init__.py:546-555``). Used for query parsing and tests."""
    if text is None:
        return []
    toks = _TOKEN_RE.findall(text.lower())
    if stemmer == "porter2":
        st = CachedStemmer()
        toks = [st(t) for t in toks]
    return toks


def tokenize_udf(stemmer: str = "porter2"):
    """``content:string -> array<string>`` Arrow-batched pandas UDF."""
    _check_stemmer(stemmer)
    use_stem = stemmer == "porter2"

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tokenize(content: pd.Series) -> pd.Series:
        st = CachedStemmer()
        findall = _TOKEN_RE.findall
        if use_stem:
            return content.map(
                lambda x: [st(t) for t in findall(x.lower())] if x is not None else []
            )
        return content.map(lambda x: findall(x.lower()) if x is not None else [])

    return _tokenize


_TERMVEC_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("doclen", T.LongType()),
    ]
)


def termvec_udf(stemmer: str = "porter2"):
    """``content:string -> struct<terms:array<string>, tfs:array<int>, doclen:long>``.

    Computes term frequencies map-side inside the UDF (one pass, no
    tokens-explode/groupBy shuffle for tf) — the Spark-first equivalent of the
    reference's forward-index batch parse (``_pisathon.cpp:126-178``).
    ``doclen`` = total token count = sum(tfs), matching the reference's
    ``inv.sizes`` doclen semantics (``indexers.py:115``).
    """
    _check_stemmer(stemmer)
    use_stem = stemmer == "porter2"

    @F.pandas_udf(_TERMVEC_SCHEMA)
    def _termvec(content: pd.Series) -> pd.DataFrame:
        st = CachedStemmer()
        findall = _TOKEN_RE.findall
        terms_out: list[list[str]] = []
        tfs_out: list[list[int]] = []
        lens_out: list[int] = []
        for x in content:
            if x is None:
                terms_out.append([])
                tfs_out.append([])
                lens_out.append(0)
                continue
            toks = findall(x.lower())
            if use_stem:
                toks = [st(t) for t in toks]
            counts = Counter(toks)
            terms_out.append(list(counts.keys()))
            tfs_out.append(list(counts.values()))
            lens_out.append(len(toks))
        return pd.DataFrame({"terms": terms_out, "tfs": tfs_out, "doclen": lens_out})

    return _termvec


_DICTTOKS_SCHEMA = T.MapType(T.StringType(), T.DoubleType())


def dict_tokenizer_udf():
    """Reference ``DictTokeniser`` (``__init__.py:558-567``): lowercase word
    tokens kept if ``isalnum()``, counted into a ``map<string,double>`` bag.
    We use the same alnum-token semantics via regex (the reference uses nltk
    ``word_tokenize`` then filters ``isalnum()``; for space/punct-separated
    text the surviving tokens coincide)."""

    @F.pandas_udf(_DICTTOKS_SCHEMA)
    def _dicttoks(content: pd.Series) -> pd.Series:
        findall = _TOKEN_RE.findall
        return content.map(
            lambda x: dict(Counter(findall(x.lower()))) if x is not None else {}
        )

    return _dicttoks


def tokenize_queries(
    queries: list[tuple[str, str]], stemmer: str = "porter2", stopwords: frozenset | None = None
) -> list[tuple[str, str, float]]:
    """Driver-side query parse (queries are tiny): returns
    ``[(qid, term, weight)]`` with stopwords dropped *query-side only*
    (reference applies stopword filtering to parsed query terms, never to the
    index: ``_pisathon.cpp:501``; skipped for pretokenized queries,
    ``_pisathon.cpp:463-492``). Repeated terms accumulate weight (reference
    repeats the term in the query; sum-over-repeats == weighted sum)."""
    out: list[tuple[str, str, float]] = []
    for qid, qtext in queries:
        acc: Counter = Counter()
        for t in tokenize_text(qtext, stemmer=stemmer):
            if stopwords and t in stopwords:
                continue
            acc[t] += 1
        out.extend((qid, term, float(w)) for term, w in acc.items())
    return out

"""Stopword lists — applied at *query time only* (reference semantics:
stopwords are indexed but filtered from parsed query terms,
``_pisathon.cpp:501``; the pretokenized query path skips filtering,
``_pisathon.cpp:463-492``; list plumbing at ``__init__.py:530-543``).

The reference ships Terrier (733 words) and Lucene (33 words) lists
(``stopwords.py:1-6``). We ship the standard public Lucene/Snowball English
stop set plus ``none``, and accept any user-supplied iterable; the 733-word
Terrier list is not vendored here (it is data copied verbatim in the
reference — supply it via ``custom`` if exact Terrier behavior is needed).
"""

from __future__ import annotations

from collections.abc import Iterable

# The classic Lucene StandardAnalyzer English stop set (public, 33 words).
LUCENE = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

_NAMED = {"lucene": LUCENE, "none": frozenset()}


def get_stopwords(which: str | Iterable[str] | None) -> frozenset:
    """Resolve a stopword spec: ``'lucene'``, ``'none'``/``None``, or a
    custom iterable of words."""
    if which is None:
        return frozenset()
    if isinstance(which, str):
        try:
            return _NAMED[which]
        except KeyError:
            raise ValueError(
                f"unknown stopword list {which!r}; use 'lucene', 'none', or a custom iterable"
            ) from None
    return frozenset(which)

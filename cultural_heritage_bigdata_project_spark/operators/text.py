"""Document-level text analysis (north-star surface, SURVEY.md §2.10).

The reference's only text handling is a driver-side Python join of
metadata fields into a CLIP prompt (extracting_embeddings.py:135-152).
A training-data pipeline needs distributed text statistics; every
operator here is a single-pass columnar projection (no shuffle, no
Python), so it runs at scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    DEFAULT_STOPWORDS,
    TOKEN_REGEX,
    fingerprint_prefix,
    tokenize,
)

# Tiny per-language marker lexicons for the n-gram/stopword language
# heuristic. Deliberately small and deterministic — the operator shape
# (score per language, argmax with threshold) is what matters; swap
# lexicons freely.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "de", "et", "est", "un", "une"),
}


def _marker_ratio(tokens: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    hits = F.filter(tokens, lambda t: F.array_contains(arr, t))
    return F.size(hits) / F.greatest(F.size(tokens), F.lit(1))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token/length/quality statistics.

    Adds: n_tokens (whitespace), n_tokens_bpe (regex runs),
    n_distinct_tokens, avg_token_len, stopword_ratio, distinct_ratio,
    quality_score ∈ [0,1]. All ratios are int/int divisions → exact
    doubles, oracle-comparable without rounding.
    """
    toks = tokenize(F.lower(F.col(text_col)))
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    total_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    sw = F.array(*[F.lit(s) for s in DEFAULT_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    n_bpe = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0))
    stop_ratio = n_stop / F.greatest(n, F.lit(1))
    distinct_ratio = nd / F.greatest(n, F.lit(1))
    quality = (
        F.least(n / F.lit(64.0), F.lit(1.0)) * 0.4
        + distinct_ratio * 0.4
        + stop_ratio * 0.2
    )
    return df.select(
        "*",
        n.alias("n_tokens"),
        n_bpe.alias("n_tokens_bpe"),
        nd.alias("n_distinct_tokens"),
        (total_len / F.greatest(n, F.lit(1))).alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        quality.alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-lexicon language heuristic: score per language, argmax
    with an 'und' (undetermined) floor — the n-gram-heuristic shape of
    a real lang-ID stage, as one codegen'd projection."""
    toks = tokenize(F.lower(F.col(text_col)))
    scores = [
        _marker_ratio(toks, markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    out = df.select("*", *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    # argmax with first-wins tie semantics, matching the oracle's CASE
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best >= 0.01), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred)


def fingerprint_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_tokens: int = 4
) -> DataFrame:
    """Prefix-fingerprint dedup groups (F7-style md5 identity —
    ref extracting_embeddings.py:89-93): one shuffle on the
    fingerprint; canonical = min id (deterministic)."""
    fp = fingerprint_prefix(F.col(text_col), n_tokens)
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(id_col).alias("canonical_id"),
        )
    )

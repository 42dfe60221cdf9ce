"""Text-analysis column expressions (SURVEY.md §2 north-star surface).

The reference's only text processing is driver-side Python string
joins feeding CLIP (extracting_embeddings.py:135-152). A training-data
pipeline needs language/quality/token statistics as distributed
columnar expressions — everything here is built-in-function only, so
it runs inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared with the DuckDB oracles: keep the list and the regex in sync
# with plans/queries_text.py.
DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in")
TOKEN_REGEX = "[a-z0-9]+"


def tokenize(text: Column) -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.split(F.trim(text), " +")


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count: number of lowercase alnum runs."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX), 0))


def stopword_ratio(tokens: Column, stopwords=DEFAULT_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (quality signal)."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.filter(tokens, lambda t: F.array_contains(sw, t))
    return F.size(hits) / F.greatest(F.size(tokens), F.lit(1))


def fingerprint_prefix(text: Column, n_tokens: int = 4) -> Column:
    """Document fingerprint: md5 of the first n tokens (cheap
    rolling-hash stand-in; groups near-identical prefixes)."""
    toks = F.slice(tokenize(F.lower(text)), 1, n_tokens)
    return F.md5(F.array_join(toks, " "))

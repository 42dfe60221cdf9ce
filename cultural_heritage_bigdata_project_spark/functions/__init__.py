from .vectors import cosine_similarity, dot_product, l2_norm, normalize
from .text import tokenize, token_count_regex, stopword_ratio, fingerprint_prefix

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "normalize",
    "tokenize",
    "token_count_regex",
    "stopword_ratio",
    "fingerprint_prefix",
]

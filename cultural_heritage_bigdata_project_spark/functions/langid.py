"""Character-trigram language profiles (Cavnar–Trenkle-style).

A real (if compact) language-ID model: per-language trigram frequency
profiles built from small embedded sample corpora, scored as
``sum(profile weight of each document trigram) / n_trigrams``. The
profile builder is plain deterministic Python, and the same rows feed
BOTH the Spark broadcast table and the DuckDB oracle's VALUES list, so
the catalog query is hash-checked with one source of truth.

The sample corpora are original example sentences written for this
repo (ordinary textbook phrases); profiles are intentionally small —
the point is the *operator shape* (trigram explode → broadcast profile
join → per-doc aggregate → argmax), which is exactly how a production
fastText/CLD-style stage plugs in at 100 TB: swap the profile table,
keep the plan.
"""

from __future__ import annotations

from collections import Counter
from functools import lru_cache

# Original sample sentences per language (profile-building corpus).
# Deliberately disjoint from the test sentences in tests/.
SAMPLE_CORPUS: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog while the children "
        "watch from the garden and the old man reads his newspaper in the "
        "morning light because there is nothing better than a quiet day "
        "with a good book and a cup of tea on the table by the window"
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso mientras los "
        "ninos miran desde el jardin y el viejo lee su periodico en la luz "
        "de la manana porque no hay nada mejor que un dia tranquilo con un "
        "buen libro y una taza de cafe sobre la mesa junto a la ventana"
    ),
    "de": (
        "der schnelle braune fuchs springt uber den faulen hund wahrend die "
        "kinder aus dem garten zuschauen und der alte mann seine zeitung im "
        "morgenlicht liest denn es gibt nichts besseres als einen ruhigen "
        "tag mit einem guten buch und einer tasse tee auf dem tisch am "
        "fenster"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux pendant "
        "que les enfants regardent depuis le jardin et que le vieil homme "
        "lit son journal dans la lumiere du matin car il n y a rien de "
        "mieux qu une journee tranquille avec un bon livre et une tasse de "
        "the sur la table pres de la fenetre"
    ),
}

LANGS: tuple[str, ...] = tuple(SAMPLE_CORPUS)
PROFILE_SIZE = 64


def text_trigrams(s: str) -> list[str]:
    """Char trigrams of ``' ' + s.lower() + ' '`` — the same definition
    the Spark expression and the DuckDB oracle use."""
    padded = f" {s.lower()} "
    return [padded[i : i + 3] for i in range(len(padded) - 2)]


@lru_cache(maxsize=None)
def profile_rows() -> tuple[tuple[str, str, int], ...]:
    """(lang, trigram, weight) rows: each language's PROFILE_SIZE most
    frequent trigrams, weight = raw count (small exact ints, so engine
    sums are integer-exact). Deterministic: ties break on trigram."""
    rows: list[tuple[str, str, int]] = []
    for lang in LANGS:
        counts = Counter(text_trigrams(SAMPLE_CORPUS[lang]))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PROFILE_SIZE]
        rows.extend((lang, tg, int(w)) for tg, w in top)
    return tuple(rows)


def profile_values_sql() -> str:
    """The profile as a DuckDB VALUES list (single quotes escaped)."""
    parts = []
    for lang, tg, w in profile_rows():
        tg_sql = tg.replace("'", "''")
        parts.append(f"('{lang}', '{tg_sql}', {w})")
    return ", ".join(parts)


def score_python(text: str) -> dict[str, float]:
    """Pure-Python reference scorer (tests cross-check Spark/SQL)."""
    prof: dict[str, dict[str, int]] = {lang: {} for lang in LANGS}
    for lang, tg, w in profile_rows():
        prof[lang][tg] = w
    tgs = text_trigrams(text)
    n = max(len(tgs), 1)
    return {
        lang: sum(prof[lang].get(tg, 0) for tg in tgs) / n for lang in LANGS
    }


# ---------------------------------------------------------------- char-LM
#
# A compact character-trigram language model over the combined sample
# corpora (all languages pooled as "clean text"): the CCNet/KenLM-style
# perplexity-proxy quality signal, shrunk to an engine-portable profile.
# Log weights ship as PRE-COMPUTED nano-scaled integers so neither
# engine evaluates a transcendental: per-doc scoring is an exact
# integer sum followed by IEEE divisions on identical operands —
# bit-identical across Spark, DuckDB and the pure-Python referee.


@lru_cache(maxsize=None)
def _pooled_counts() -> Counter:
    """Trigram counts over ALL languages' sample corpora pooled — the
    single source both the LM weights and the add-one denominator
    derive from (one definition; they cannot desynchronize)."""
    counts: Counter[str] = Counter()
    for lang in LANGS:
        counts.update(text_trigrams(SAMPLE_CORPUS[lang]))
    return counts


@lru_cache(maxsize=None)
def lm_rows() -> tuple[tuple[str, int], ...]:
    """(trigram, ln(count+1)*1e9 as int) over the pooled corpus —
    add-one-smoothed log weights, nano-quantized."""
    import math

    return tuple(
        (tg, int(round(math.log(w + 1) * 1_000_000_000)))
        for tg, w in sorted(_pooled_counts().items())
    )


@lru_cache(maxsize=None)
def lm_norm_nano() -> int:
    """ln(T + V)*1e9 as int: T = total pooled trigram count, V =
    distinct trigrams + 1 (the OOV bucket) — the add-one denominator."""
    import math

    counts = _pooled_counts()
    t = sum(counts.values())
    v = len(counts) + 1
    return int(round(math.log(t + v) * 1_000_000_000))


def lm_values_sql() -> str:
    """The char-LM profile as a DuckDB VALUES list."""
    parts = []
    for tg, lnw in lm_rows():
        tg_sql = tg.replace("'", "''")
        parts.append(f"('{tg_sql}', {lnw})")
    return ", ".join(parts)


def charlm_score_python(text: str) -> tuple[int, float]:
    """Pure-Python referee: (n_trigrams, avg_logprob) with the exact
    integer/IEEE pipeline both engines replay."""
    prof = dict(lm_rows())
    tgs = text_trigrams(text)
    n = max(len(tgs), 1)
    s_nano = sum(prof.get(tg, 0) for tg in tgs)
    return len(tgs), round((s_nano / n - lm_norm_nano()) / 1e9, 6)


# --- DSIR importance weights (Xie et al. 2023, arXiv:2302.03169) ----
#
# Data Selection via Importance Resampling scores each raw document by
# the log-likelihood RATIO between a target-domain LM and a background
# LM over hashed n-gram features. Here the target is one language's
# trigram LM and the background is the pooled LM above — both static
# integer tables, so the ratio is an exact integer sum both engines
# (and the Python referee) replay identically. Selection is the
# deterministic top-k by importance (the paper resamples with Gumbel
# noise; top-k is the reproducible variant an audited pipeline wants).


@lru_cache(maxsize=None)
def _lang_counts(lang: str) -> Counter:
    counts: Counter[str] = Counter()
    counts.update(text_trigrams(SAMPLE_CORPUS[lang]))
    return counts


@lru_cache(maxsize=None)
def dsir_rows(target_lang: str = "en") -> tuple[tuple[str, int], ...]:
    """(trigram, nano(ln(c_target+1)) - nano(ln(c_background+1))) over
    the UNION vocabulary — each side individually nano-rounded exactly
    like lm_rows, so the diff table is derivable from published
    per-profile tables."""
    import math

    tgt = _lang_counts(target_lang)
    bg = _pooled_counts()
    vocab = sorted(set(tgt) | set(bg))
    return tuple(
        (
            tg,
            int(round(math.log(tgt.get(tg, 0) + 1) * 1_000_000_000))
            - int(round(math.log(bg.get(tg, 0) + 1) * 1_000_000_000)),
        )
        for tg in vocab
    )


@lru_cache(maxsize=None)
def dsir_norm_nano(target_lang: str = "en") -> int:
    """nano(ln(T_t + V_t)) - nano(ln(T_b + V_b)): the add-one
    denominator difference of the two LMs."""
    import math

    tgt = _lang_counts(target_lang)
    t_t, v_t = sum(tgt.values()), len(tgt) + 1
    return int(round(math.log(t_t + v_t) * 1_000_000_000)) - lm_norm_nano()


def dsir_values_sql(target_lang: str = "en") -> str:
    """The DSIR diff table as a DuckDB VALUES list."""
    parts = []
    for tg, w in dsir_rows(target_lang):
        tg_sql = tg.replace("'", "''")
        parts.append(f"('{tg_sql}', {w})")
    return ", ".join(parts)


def dsir_score_python(
    text: str, target_lang: str = "en"
) -> tuple[int, int, float | None]:
    """Pure-Python referee: (n_trigrams, n_matched, avg_log_ratio)
    with the exact integer/IEEE pipeline both engines replay.

    Scoring is restricted to IN-VOCAB trigrams (present in either LM's
    training counts): under naive add-one scoring an all-OOV garbage
    document would get score = -(norm_t - norm_b) > 0 purely from the
    smaller target corpus's smoothing denominator and outrank genuine
    target-language text. A document with NO in-vocab trigram carries
    no evidence either way → score None (ranked last)."""
    prof = dict(dsir_rows(target_lang))
    tgs = text_trigrams(text)
    hits = [prof[tg] for tg in tgs if tg in prof]
    if not hits:
        return len(tgs), 0, None
    s_nano = sum(hits)
    return (
        len(tgs),
        len(hits),
        round((s_nano / len(hits) - dsir_norm_nano(target_lang)) / 1e9, 6),
    )

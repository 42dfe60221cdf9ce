"""Corpus-assembly catalog (SURVEY.md §2.10 north-star, round 2):
deterministic splits and weighted mixing — the md5-hash selection is
replayed verbatim by the DuckDB oracle, so corpus membership itself is
hash-checked. ``pack_sequences`` (greedy FFD packing inside
applyInPandas groups) is sequential-per-group by nature, so it stays a
library operator pinned by invariant tests (tests/test_corpus.py)
rather than a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import corpus
from ..sources.tables import load_table
from .catalog import register


@register(
    "hash_split_sets",
    description="Deterministic train/val/test split (80/10/10) by md5 "
    "bucket of doc_id - partition-layout/engine independent corpus "
    "membership (what seeded randomSplit is NOT), one stateless "
    "projection",
    survey_ref="W2,A5,M1",
    oracle="""
WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 AS bk
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN bk < 8000 THEN 'train'
            WHEN bk < 9000 THEN 'val'
            ELSE 'test' END AS split
FROM b
""",
)
def hash_split_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return corpus.hash_split(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7
    )


@register(
    "corpus_mix_weighted",
    description="Weighted corpus mix: per-language sources kept at "
    "en=0.5/de=1.0/fr=0.25 by seeded md5 thresholding - the data-mixture "
    "sampling step of a pretraining recipe, deterministic across "
    "engines/layouts; filter + union, no shuffle",
    survey_ref="M1,X1,A5",
    oracle="""
SELECT doc_id, n_chars, 'en' AS source FROM documents
WHERE lang = 'en'
  AND ('0x' || substr(md5('3:en:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < 5000
UNION ALL
SELECT doc_id, n_chars, 'de' AS source FROM documents
WHERE lang = 'de'
  AND ('0x' || substr(md5('3:de:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < 10000
UNION ALL
SELECT doc_id, n_chars, 'fr' AS source FROM documents
WHERE lang = 'fr'
  AND ('0x' || substr(md5('3:fr:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000 < 2500
""",
)
def corpus_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    sources = {
        lang: docs.filter(F.col("lang") == lang).drop("lang")
        for lang in ("en", "de", "fr")
    }
    return corpus.weighted_mix(
        sources, {"en": 0.5, "de": 1.0, "fr": 0.25}, seed=3
    )

"""Corpus-assembly operator gate: split/mix determinism + packing
invariants (operators/corpus.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import corpus
from cultural_heritage_bigdata_project_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_hash_split_disjoint_exhaustive_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {r.doc_id: r.split for r in corpus.hash_split(docs, fr, seed=7).collect()}
    # repartitioned input must produce the IDENTICAL assignment
    s2 = {
        r.doc_id: r.split
        for r in corpus.hash_split(docs.repartition(13), fr, seed=7).collect()
    }
    assert s1 == s2
    n = len(s1)
    assert n == docs.count()  # exhaustive, one split per row
    from collections import Counter

    c = Counter(s1.values())
    assert set(c) <= {"train", "val", "test"}
    assert abs(c["train"] / n - 0.8) < 0.06, c
    # different seed reshuffles membership
    s3 = {r.doc_id: r.split for r in corpus.hash_split(docs, fr, seed=8).collect()}
    assert s1 != s3


def test_hash_split_rejects_bad_fractions(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        corpus.hash_split(docs, {"a": 0.5, "b": 0.2})


def test_weighted_mix_rates_and_determinism(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    srcs = {
        lang: docs.filter(F.col("lang") == lang).drop("lang")
        for lang in ("en", "de")
    }
    out1 = corpus.weighted_mix(srcs, {"en": 0.5, "de": 1.0}, seed=3)
    rows1 = {(r.doc_id, r.source) for r in out1.collect()}
    rows2 = {
        (r.doc_id, r.source)
        for r in corpus.weighted_mix(srcs, {"en": 0.5, "de": 1.0}, seed=3).collect()
    }
    assert rows1 == rows2
    n_en_total = srcs["en"].count()
    n_en_kept = sum(1 for _, s in rows1 if s == "en")
    assert abs(n_en_kept / n_en_total - 0.5) < 0.12
    assert sum(1 for _, s in rows1 if s == "de") == srcs["de"].count()


def test_pack_sequences_invariants(spark):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.col("n_chars").alias("n_tokens"))
    )
    budget = int(
        docs.agg(F.expr("percentile_approx(n_tokens, 0.9) * 3")).first()[0]
    )
    packed = corpus.pack_sequences(docs, budget=budget, n_groups=8)
    rows = packed.collect()
    # every doc packed exactly once
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in docs.collect()
    )
    tok = {r.doc_id: r.n_tokens for r in docs.collect()}
    from collections import defaultdict

    bins = defaultdict(int)
    for r in rows:
        bins[r.bin_id] += tok[r.doc_id]
    # no bin over budget (oversized singletons would get their own bin,
    # but the budget chosen above exceeds every doc)
    assert max(bins.values()) <= budget
    # bin_tokens column agrees with the recomputed totals
    for r in rows:
        assert bins[r.bin_id] == r.bin_tokens
    # packing is reasonably tight: average fill of non-trailing bins
    fills = sorted(bins.values(), reverse=True)
    if len(fills) > 8:  # ignore one partial bin per group
        core = fills[: len(fills) - 8]
        assert sum(core) / (len(core) * budget) > 0.5, "FFD fill too loose"


def test_pack_sequences_deterministic(spark):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", F.col("n_chars").alias("n_tokens"))
    )
    a = {(r.doc_id, r.bin_id) for r in corpus.pack_sequences(docs, 5000, n_groups=4).collect()}
    b = {
        (r.doc_id, r.bin_id)
        for r in corpus.pack_sequences(docs.repartition(9), 5000, n_groups=4).collect()
    }
    assert a == b


def test_temperature_mix_flattens_shares(spark):
    """alpha=0.5 keep-fractions: the smallest source keeps everything,
    larger sources keep ~sqrt(c_min*c_s) rows — shares flatten toward
    the temperature distribution without row duplication."""
    import math

    rows = (
        [(i, "big") for i in range(9000)]
        + [(9000 + i, "mid") for i in range(1000)]
        + [(10000 + i, "small") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = (
        corpus.temperature_mix(df, alpha=0.5, seed=5)
        .groupBy("source")
        .count()
        .collect()
    )
    got = {r.source: r["count"] for r in kept}
    assert got["small"] == 100  # c_min keeps 100%
    for src, c in (("big", 9000), ("mid", 1000)):
        expect = math.sqrt(100 * c)
        # md5 thresholding is a uniform draw: allow 5-sigma binomial slack
        sigma = math.sqrt(c * (expect / c) * (1 - expect / c))
        assert abs(got[src] - expect) < 5 * sigma + 1, (src, got[src], expect)


def test_temperature_mix_alpha_one_is_identity(spark):
    """alpha=1 keeps every row of every source (no reshaping)."""
    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(300)],
        "doc_id long, source string",
    )
    assert corpus.temperature_mix(df, alpha=1.0).count() == 300


def test_temperature_mix_deterministic_across_layouts(spark):
    """Same rows, different partitioning → identical selection."""
    rows = [(i, ["x", "y", "z"][i % 3]) for i in range(2000)]
    df1 = spark.createDataFrame(rows, "doc_id long, source string").repartition(1)
    df16 = spark.createDataFrame(rows, "doc_id long, source string").repartition(16)
    ids1 = {r.doc_id for r in corpus.temperature_mix(df1, seed=9).collect()}
    ids16 = {r.doc_id for r in corpus.temperature_mix(df16, seed=9).collect()}
    assert ids1 == ids16 and len(ids1) > 0

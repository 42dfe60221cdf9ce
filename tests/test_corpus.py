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


def test_shard_assign_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id")
    n = docs.count()
    out = corpus.shard_assign(docs, n_shards=8, seed=11).collect()
    assert len(out) == n  # one row in, one row out
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    # positions within a shard are exactly 0..len-1 (dense, 0-based)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # hash sharding keeps shards statistically balanced
    sizes = [len(p) for p in by_shard.values()]
    assert max(sizes) < 2.5 * (n / 8)
    # layout-independent: repartitioned input → identical assignment
    out2 = corpus.shard_assign(docs.repartition(13), n_shards=8, seed=11).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in out} == {
        (r.doc_id, r.shard, r.pos) for r in out2
    }
    with pytest.raises(ValueError, match="n_shards"):
        corpus.shard_assign(docs, n_shards=0)


def test_shard_write_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    path = str(tmp_path / "shards")
    corpus.shard_write(docs, path, n_shards=4, seed=2)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert set(back.columns) == {"doc_id", "n_chars", "pos", "shard"}
    # each shard directory exists and replays the logical assignment
    expect = {
        (r.doc_id, r.shard, r.pos)
        for r in corpus.shard_assign(docs, n_shards=4, seed=2).collect()
    }
    got = {(r.doc_id, r.shard, r.pos) for r in back.collect()}
    assert got == expect
    # physical file order within a shard IS the logical pos order:
    # a trainer reads the shard sequentially with zero read-time sort
    one = spark.read.parquet(f"{path}/shard=0")
    poss = [r.pos for r in one.select("pos").collect()]
    assert poss == sorted(poss)


def test_token_budget_select_boundary(spark):
    rows = [(i, 10) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = corpus.token_budget_select(df, budget=1005, seed=1).collect()
    # 100 docs of 10 tokens fit in 1005; the 101st would exceed it
    assert len(out) == 100
    assert max(r.cum_tokens for r in out) == 1000
    # cum is the exact inclusive prefix sum in (hash, id) order
    assert sorted(r.cum_tokens for r in out) == [10 * k for k in range(1, 101)]
    # budget 0 and negative
    assert corpus.token_budget_select(df, budget=0).count() == 0
    with pytest.raises(ValueError, match="budget"):
        corpus.token_budget_select(df, budget=-1)


def test_token_budget_select_matches_single_window(spark):
    """The distributed (bucketed prefix-sum) path must equal the naive
    single-window ORDER BY formulation row-for-row."""
    from pyspark.sql import Window as W

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_tokens")
    )
    got = {
        (r.doc_id, r.cum_tokens)
        for r in corpus.token_budget_select(
            docs.repartition(16), budget=50_000, seed=4
        ).collect()
    }
    key = F.md5(F.concat(F.lit("4:"), F.col("doc_id").cast("string")).cast("binary"))
    w = (
        W.orderBy(key, "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    naive = (
        docs.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= 50_000)
    )
    expect = {(r.doc_id, r.cum_tokens) for r in naive.collect()}
    assert got == expect and len(got) > 0


def test_token_budget_select_prefix_width_invariant(spark):
    """The subset must be identical at any prefix decomposition width
    (bucketing is an execution detail, not a semantic one)."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("n_tokens")
    )
    sel = {}
    for p in (1, 2, 3):
        sel[p] = {
            (r.doc_id, r.cum_tokens)
            for r in corpus.token_budget_select(
                docs, budget=30_000, seed=6, prefix_chars=p
            ).collect()
        }
    assert sel[1] == sel[2] == sel[3] and len(sel[1]) > 0
    with pytest.raises(ValueError, match="prefix_chars"):
        corpus.token_budget_select(docs, budget=10, prefix_chars=0)


def test_epoch_upsample_invariants(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.epoch_upsample(
        df, {"a": 2.0, "b": 0.5, "c": 1.25}, seed=3
    ).collect()
    from collections import Counter

    per_doc = Counter()
    for r in out:
        per_doc[(r.doc_id, r.source)] += 1
        assert r.epoch >= 1
    # integer repeat: every 'a' doc appears exactly twice (epochs 1,2)
    a_counts = {k: v for k, v in per_doc.items() if k[1] == "a"}
    assert len(a_counts) == 1000 and set(a_counts.values()) == {2}
    # fractional-only repeat: 'b' docs appear 0 or 1 times, ~50% kept
    b_total = sum(v for k, v in per_doc.items() if k[1] == "b")
    assert set(v for k, v in per_doc.items() if k[1] == "b") <= {1}
    assert abs(b_total - 500) < 80, b_total
    # mixed: every 'c' doc appears at least once, ~25% twice
    c_counts = [v for k, v in per_doc.items() if k[1] == "c"]
    assert len(c_counts) == 1000 and set(c_counts) <= {1, 2}
    assert abs(sum(c_counts) - 1250) < 80
    # epochs are dense 1..n per doc
    epochs: dict = {}
    for r in out:
        epochs.setdefault((r.doc_id, r.source), []).append(r.epoch)
    for k, es in epochs.items():
        assert sorted(es) == list(range(1, len(es) + 1)), (k, es)
    # layout-independence
    out16 = corpus.epoch_upsample(
        df.repartition(16), {"a": 2.0, "b": 0.5, "c": 1.25}, seed=3
    ).collect()
    assert sorted((r.doc_id, r.epoch) for r in out) == sorted(
        (r.doc_id, r.epoch) for r in out16
    )
    with pytest.raises(ValueError, match="repeat"):
        corpus.epoch_upsample(df, {"a": -0.1})


def test_bpe_tokenize_then_pack_composition(spark):
    """The full tokenizer-to-trainer chain: learn BPE merges from the
    corpus, count real subword tokens per doc, pack docs into
    fixed-budget bins — bins respect the budget measured in LEARNED
    tokens, and every doc is packed exactly once."""
    from cultural_heritage_bigdata_project_spark.operators import text as t

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").limit(300)
    merges = t.bpe_train_merges(t.bpe_word_counts(docs), n_merges=15)
    assert len(merges) > 0
    counted = t.bpe_segment(docs, merges).select("doc_id", "n_bpe_tokens")
    budget = 512
    packed = corpus.pack_sequences(
        counted, budget=budget, tokens_col="n_bpe_tokens"
    )
    rows = packed.collect()
    assert sorted(r.doc_id for r in rows) == sorted(
        r.doc_id for r in counted.collect()
    )
    toks = {r.doc_id: r.n_bpe_tokens for r in counted.collect()}
    bins: dict = {}
    for r in rows:
        bins.setdefault(r.bin_id, []).append(r.doc_id)
    for b, members in bins.items():
        total = sum(toks[d] for d in members)
        # a bin exceeds the budget only as a single oversized doc
        assert total <= budget or len(members) == 1, (b, total)


def test_shard_assign_curriculum_order(spark):
    """Curriculum columns lead the within-shard order while shard
    membership stays identical to the plain hash assignment."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    plain = corpus.shard_assign(docs, n_shards=4, seed=3).collect()
    curr = corpus.shard_assign(
        docs, n_shards=4, seed=3, curriculum=["n_chars"]
    ).collect()
    assert {(r.doc_id, r.shard) for r in plain} == {
        (r.doc_id, r.shard) for r in curr
    }
    by_shard: dict = {}
    for r in curr:
        by_shard.setdefault(r.shard, []).append((r.pos, r.n_chars))
    for shard, rows in by_shard.items():
        lens = [c for _, c in sorted(rows)]
        assert lens == sorted(lens), f"shard {shard} not in curriculum order"

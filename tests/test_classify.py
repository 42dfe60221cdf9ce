"""Behavioral gate for the quality classifier (operators/classify.py):
separable data is separated, held-out generalization, deterministic
scoring, threshold monotonicity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import classify


def _corpora(spark):
    """Synthetic separable corpora: 'clean' docs draw from a curated
    vocabulary, 'crawl' docs from a spammy one, with shared filler."""
    clean_vocab = ["archive", "museum", "heritage", "catalog", "curator", "exhibit"]
    crawl_vocab = ["click", "winner", "free", "casino", "pills", "xxx"]
    filler = ["the", "of", "and", "a"]

    def mk(vocab, n, offset):
        rows = []
        for i in range(n):
            words = [vocab[(i + j) % len(vocab)] for j in range(6)] + [
                filler[(i + j) % len(filler)] for j in range(4)
            ]
            rows.append((offset + i, " ".join(words)))
        return spark.createDataFrame(rows, "doc_id long, text string")

    return mk(clean_vocab, 120, 0), mk(crawl_vocab, 120, 1000)


def test_classifier_separates_and_generalizes(spark):
    clean, crawl = _corpora(spark)
    train_c, hold_c = clean.filter("doc_id % 5 != 0"), clean.filter("doc_id % 5 = 0")
    train_x, hold_x = crawl.filter("doc_id % 5 != 0"), crawl.filter("doc_id % 5 = 0")
    model = classify.train_quality_classifier(train_c, train_x)
    # held-out accuracy: every clean holdout scores above every crawl one
    sc = classify.score_quality_classifier(hold_c, model)
    sx = classify.score_quality_classifier(hold_x, model)
    min_clean = sc.agg(F.min("quality_prob")).first()[0]
    max_crawl = sx.agg(F.max("quality_prob")).first()[0]
    assert min_clean > 0.8 and max_crawl < 0.2, (min_clean, max_crawl)
    # deterministic scoring given a model
    again = {r.doc_id: r.quality_prob for r in sc.collect()}
    again2 = {
        r.doc_id: r.quality_prob
        for r in classify.score_quality_classifier(hold_c, model).collect()
    }
    assert again == again2
    # schema: input columns preserved + the score
    assert sc.columns == ["doc_id", "text", "quality_prob"]


def test_classifier_filter_threshold_monotone(spark):
    clean, crawl = _corpora(spark)
    model = classify.train_quality_classifier(clean, crawl)
    mixed = clean.unionByName(crawl)
    n_low = classify.classifier_filter(mixed, model, threshold=0.2).count()
    n_mid = classify.classifier_filter(mixed, model, threshold=0.5).count()
    n_high = classify.classifier_filter(mixed, model, threshold=0.9).count()
    assert n_low >= n_mid >= n_high
    # at 0.5 the filter keeps ~the clean half of the separable mix
    assert abs(n_mid - 120) <= 6, n_mid


def test_classifier_filter_pareto_properties(spark):
    """Stochastic acceptance: deterministic across layouts, keeps
    essentially all high scorers, a small minority of low scorers, and
    the keep rate rises with score."""
    import pytest

    clean, crawl = _corpora(spark)
    model = classify.train_quality_classifier(clean, crawl)
    mixed = clean.unionByName(crawl)
    kept = {
        r.doc_id
        for r in classify.classifier_filter_pareto(mixed, model, alpha=2).collect()
    }
    kept2 = {
        r.doc_id
        for r in classify.classifier_filter_pareto(
            mixed.repartition(16), model, alpha=2
        ).collect()
    }
    assert kept == kept2  # layout-independent membership
    n_clean_kept = sum(1 for d in kept if d < 1000)
    n_crawl_kept = sum(1 for d in kept if d >= 1000)
    assert n_clean_kept >= 115  # near-certain keeps
    # alpha=2: P(pareto > 1) = 0.25 -> ~30 of 120 near-zero scorers
    assert 5 < n_crawl_kept < 80  # long tail survives, cliff does not
    with pytest.raises(ValueError, match="alpha"):
        classify.classifier_filter_pareto(mixed, model, alpha=0)

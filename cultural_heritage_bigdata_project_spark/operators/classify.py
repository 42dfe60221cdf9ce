"""Quality-classifier training and scoring (the GPT-3 appendix-A /
LLaMA / CCNet "fasttext classifier" corpus filter): train a linear
classifier to distinguish a curated reference slice from raw crawl,
then score every document and keep the most reference-like.

Spark-native throughout: features are hashed token counts
(``HashingTF`` — the hashing trick keeps the feature space fixed-width
with no vocabulary broadcast), the model is MLlib logistic regression
(distributed L-BFGS — each iteration is one map-reduce over the
corpus), and scoring is one broadcast of the coefficient vector into a
codegen-friendly projection. This is the same shape fasttext training
takes on one machine, lifted to the cluster: at 100 TB the gradient
passes ARE the scan, and nothing else is materialized.

Kept as a library operator (pinned by behavioral tests, not a SQL
oracle): L-BFGS convergence is float-iterative and partitioning-
sensitive in the last ulps, so exact cross-engine replay is not a
meaningful contract — the meaningful contracts (separable data is
separated; held-out accuracy; deterministic scoring given a model;
keep-fraction monotone in threshold) are tested directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FEATURES = 1 << 18  # hashing-trick width: fixed, vocabulary-free


def _featurize(df: DataFrame, text_col: str):
    from pyspark.ml.feature import HashingTF, Tokenizer

    tok = Tokenizer(inputCol=text_col, outputCol="__words")
    tf = HashingTF(
        inputCol="__words", outputCol="features", numFeatures=_FEATURES
    )
    return tf.transform(tok.transform(df))


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str = "text",
    max_iter: int = 30,
    reg_param: float = 1e-4,
):
    """Train the reference-vs-crawl classifier. ``positive`` is the
    curated slice (label 1), ``negative`` the raw crawl sample
    (label 0). Returns the fitted MLlib model (its coefficient vector
    broadcasts to scorers; persist with ``model.write()`` beside the
    corpus version that trained it so filter decisions stay
    reproducible)."""
    from pyspark.ml.classification import LogisticRegression

    labeled = positive.select(
        F.col(text_col).alias(text_col), F.lit(1.0).alias("label")
    ).unionByName(
        negative.select(F.col(text_col).alias(text_col), F.lit(0.0).alias("label"))
    )
    feats = _featurize(labeled, text_col)
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, featuresCol="features"
    )
    model = lr.fit(feats)
    # Strip the training summary before the model ever reaches a task
    # closure: the summary holds a SparkSession reference, and a
    # session whose (lazy) observationManager has been touched — by
    # ANY Observation use anywhere in the session, e.g. the iterative
    # dedup convergence probe — is not Java-serializable, failing every
    # later model.transform with "Task not serializable". A save/load
    # round trip is the public-API way to get a summary-free model
    # (and doubles as the persist-beside-the-corpus pattern).
    import shutil
    import tempfile
    import uuid

    from pyspark.ml.classification import LogisticRegressionModel

    tmp = os.path.join(
        tempfile.gettempdir(), f"spark_graft_qclf_{uuid.uuid4().hex[:8]}"
    )
    try:
        model.write().overwrite().save(tmp)
        return LogisticRegressionModel.load(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def score_quality_classifier(
    df: DataFrame,
    model,
    text_col: str = "text",
    score_col: str = "quality_prob",
) -> DataFrame:
    """Score every document with P(reference-like): input columns +
    ``score_col``. One tokenize+hash projection and a broadcast dot
    product — scan-speed, no shuffle."""
    from pyspark.ml.functions import vector_to_array

    feats = _featurize(df, text_col)
    scored = model.transform(feats)
    return scored.select(
        *df.columns,
        F.round(vector_to_array("probability")[1], 6).alias(score_col),
    )


def classifier_filter(
    df: DataFrame,
    model,
    threshold: float,
    text_col: str = "text",
) -> DataFrame:
    """Keep documents scoring >= threshold — the corpus filter itself.
    GPT-3 used a Pareto-noised acceptance instead of a hard cut; that
    variant is the same scoring pass with the seeded md5-hash
    thresholding the corpus operators already use for reproducible
    stochastic keeps."""
    return score_quality_classifier(df, model, text_col=text_col).filter(
        F.col("quality_prob") >= float(threshold)
    )


def classifier_filter_pareto(
    df: DataFrame,
    model,
    alpha: float = 9.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """GPT-3's stochastic acceptance (appendix A): keep a document iff
    ``pareto(alpha) > 1 - score`` — high scorers are near-certain
    keeps, low scorers survive with small probability, so the filtered
    corpus keeps a long tail of crawl diversity instead of a hard
    cliff. The paper draws ``np.random.pareto``; here the draw is the
    repo's deterministic seeded-hash uniform pushed through the Pareto
    inverse CDF (``(1-u)^(-1/alpha) - 1``), so corpus membership is
    reproducible on any layout — same contract as every other
    stochastic keep in the corpus stack.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    scored = score_quality_classifier(df, model, text_col=text_col)
    s = F.concat(F.lit(f"{seed}:pareto:"), F.col(id_col).cast("string"))
    h60 = F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast("long")
    # u in [0, 1): 60-bit hash scaled; 1-u in (0, 1] so the power is finite
    u = h60.cast("double") / F.lit(float(1 << 60))
    pareto = F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.filter(pareto > (F.lit(1.0) - F.col("quality_prob")))

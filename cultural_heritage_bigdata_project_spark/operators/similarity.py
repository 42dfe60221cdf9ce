"""Vector similarity operators: kNN, threshold joins, ANN, precision@k.

Reference capabilities re-expressed Spark-first (SURVEY.md §2.10):
- J8/M5 kNN top-k over an embedding column (Qdrant ``search`` —
  ML-model/qdrant-deduplicator/deduplicate_from_qdrant.py:53-83,
  streamlit app.py:237-242)
- J9/M3 threshold similarity join (cosine ≥ τ dedup —
  deduplicate_from_qdrant.py:160-186)
- M6 precision@k retrieval evaluation (ML-model/README.md:189-210)

Everything is built-in expressions (``zip_with``/``aggregate``): the
hot path stays in whole-stage codegen, distributes with the data, and
needs no Python worker. The brute-force paths are the exact oracles;
``lsh`` gives the sub-quadratic scale path (random-hyperplane
signatures + band bucketing), trading recall for a candidate set that
avoids the O(n²) cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.vectors import cosine_similarity


def knn_brute_force(
    vectors: DataFrame,
    query_vec: Column,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exact top-k by cosine against one query vector (J8/M5/W4).

    The query vector is a literal/broadcast expression, so the plan is
    scan → project(cosine) → TakeOrderedAndProject: one pass, no
    shuffle, no driver collect. At 100 TB this is the right exact plan;
    for repeated queries use ``lsh_bucket_ann``.
    """
    sim = cosine_similarity(F.col(vec_col), query_vec)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        vectors.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def threshold_similarity_join(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    block_size: int = 2048,
) -> DataFrame:
    """J9/M3: all pairs (a<b) with cosine ≥ threshold — exact, via
    block-matrix BLAS.

    This is the O(n²) exact join the reference's Qdrant dedup implies
    (threshold 0.97 at deduplicate_from_qdrant.py:17). A row-at-a-time
    cross join with per-pair array expressions is interpreted (no
    codegen for higher-order functions) and ~50x slower than dense
    matmul, so the physical strategy is: hash vectors into blocks,
    replicate each block across its block-pair keys, and compute each
    block-pair's full similarity matrix with numpy (Arrow-batched
    ``applyInPandas``). Work per task is a (block x block) GEMM —
    cache-friendly, releases the GIL, distributes evenly. At scale the
    sub-quadratic path is ``lsh_candidate_pairs`` + verify; this is the
    exact oracle.
    """
    import math

    import numpy as np
    import pandas as pd

    n = vectors.count()
    nb = max(1, math.ceil(n / block_size))
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).cast("int").alias("b"),
    )
    # block-pair keys: block i meets block j (i<=j) exactly once —
    # i's rows on the L side, j's on the R side.
    left = (
        v.select("id", "v", "b", F.explode(F.expr(f"sequence(b, {nb - 1})")).alias("ob"))
        .select(
            (F.col("b") * nb + F.col("ob")).alias("bp"),
            F.lit(0).alias("side"),
            "id",
            "v",
        )
    )
    right = (
        v.select("id", "v", "b", F.explode(F.expr("sequence(0, b)")).alias("ob"))
        .select(
            (F.col("ob") * nb + F.col("b")).alias("bp"),
            F.lit(1).alias("side"),
            "id",
            "v",
        )
    )
    both = left.unionByName(right)
    thr = float(threshold)
    rd = round_digits

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        lp = pdf[pdf["side"] == 0]
        rp = pdf[pdf["side"] == 1]
        if len(lp) == 0 or len(rp) == 0:
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine_sim": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cosine_sim": "float64"}
            )
        la = np.stack(lp["v"].to_numpy())
        rb = np.stack(rp["v"].to_numpy())
        lnorm = la / np.linalg.norm(la, axis=1, keepdims=True)
        rnorm = rb / np.linalg.norm(rb, axis=1, keepdims=True)
        sims = lnorm @ rnorm.T
        if rd is not None:
            sims = np.round(sims, rd)
        li = lp["id"].to_numpy()
        ri = rp["id"].to_numpy()
        ii, jj = np.nonzero(sims >= thr)
        a = li[ii]
        b = ri[jj]
        keep = a != b
        a, b, s = a[keep], b[keep], sims[ii, jj][keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        out = pd.DataFrame({"a_id": lo, "b_id": hi, "cosine_sim": s})
        # diagonal block pairs see (x,y) and (y,x); collapse
        out = out.drop_duplicates(subset=["a_id", "b_id"])
        return out

    return both.groupBy("bp").applyInPandas(
        compute, "a_id long, b_id long, cosine_sim double"
    )


def _hyperplane_sign(vec_col: str, plane: int, dim: int) -> Column:
    """Deterministic ±1 random-hyperplane dot-product sign.

    Hyperplane components are pseudo-random signs derived from
    ``xxhash64(plane, index)`` — reproducible across runs/executors
    with no driver-side randomness or broadcast of plane matrices.
    """
    signed = F.expr(
        f"""
        aggregate(
          zip_with({vec_col},
                   transform(sequence(0, {dim - 1}),
                             i -> CASE WHEN (xxhash64({plane}, i) % 2 + 2) % 2 = 0
                                  THEN 1.0D ELSE -1.0D END),
                   (x, s) -> CAST(x AS DOUBLE) * s),
          0.0D, (acc, v) -> acc + v)
        """
    )
    return (signed >= 0).cast("int")


def lsh_signature(
    vectors: DataFrame,
    n_planes: int = 16,
    vec_col: str = "embedding",
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) bucket id per vector.

    ``n_planes`` sign bits packed into one int bucket key. Collisions
    preserve cosine neighborhoods (Charikar 2002): P[same bit] =
    1 - θ/π.
    """
    dim = len(vectors.select(vec_col).first()[0])
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = F.shiftleft(bucket, 1) + _hyperplane_sign(vec_col, p, dim)
    return vectors.withColumn(out_col, bucket)


def lsh_candidate_pairs(
    vectors: DataFrame,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sub-quadratic candidate pairs: vectors sharing any of
    ``n_tables`` independent ``n_planes``-bit buckets.

    Plan shape: explode to (table, bucket) keys → shuffle on the key →
    within-bucket self-join → distinct pairs. No cross join anywhere;
    at 100 TB the shuffle key count is n_tables × n_rows.
    """
    dim = len(vectors.select(vec_col).first()[0])
    sigs = []
    for t in range(n_tables):
        bucket = F.lit(0)
        for p in range(n_planes):
            bucket = F.shiftleft(bucket, 1) + _hyperplane_sign(
                vec_col, t * n_planes + p, dim
            )
        sigs.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    keyed = vectors.select(
        F.col(id_col), F.explode(F.array(*sigs)).alias("sig")
    ).select(id_col, "sig.table", "sig.bucket")
    a = keyed.select(
        F.col(id_col).alias("a_id"), F.col("table"), F.col("bucket")
    )
    b = keyed.select(
        F.col(id_col).alias("b_id"), F.col("table"), F.col("bucket")
    )
    return (
        a.join(b, on=["table", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def ann_top_k(
    vectors: DataFrame,
    query_vec: Column,
    k: int,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate kNN: rank by cosine only within the query's LSH
    buckets. Recall < 1 by construction; tests measure it against
    ``knn_brute_force``."""
    dim = len(vectors.select(vec_col).first()[0])
    q = vectors.sparkSession.range(1).select(query_vec.alias(vec_col))
    conds = []
    keyed = vectors
    for t in range(n_tables):
        bucket = F.lit(0)
        qbucket = F.lit(0)
        for p in range(n_planes):
            bucket = F.shiftleft(bucket, 1) + _hyperplane_sign(
                vec_col, t * n_planes + p, dim
            )
            qbucket = F.shiftleft(qbucket, 1) + _hyperplane_sign(
                vec_col, t * n_planes + p, dim
            )
        keyed = keyed.withColumn(f"__b{t}", bucket)
        conds.append((t, qbucket))
    qrow = q.select(
        *[qb.alias(f"__qb{t}") for t, qb in conds]
    )
    cond = None
    for t, _ in conds:
        c = F.col(f"__b{t}") == F.col(f"__qb{t}")
        cond = c if cond is None else (cond | c)
    cands = keyed.join(F.broadcast(qrow), cond)
    sim = F.round(cosine_similarity(F.col(vec_col), query_vec), 6)
    return (
        cands.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_ann_top_k(
    vectors: DataFrame,
    query_vec: Column,
    k: int,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate kNN: coarse-quantize the collection with
    KMeans centroids (the inverted lists), then rank by exact cosine
    only within the ``n_probe`` lists nearest to the query.

    The index build is one MLlib KMeans fit (sampled, driver-cheap) +
    one assignment pass; queries touch ~n_probe/n_lists of the data.
    This is the centroid-bucketed scale path the LSH variant
    (``ann_top_k``) trades against: IVF adapts to the data
    distribution, LSH is oblivious but needs no training.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__feat"),
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="__feat", predictionCol="__list")
    model = km.fit(feat.select("__feat"))
    assigned = model.transform(feat)

    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    qrow = vectors.sparkSession.range(1).select(query_vec.alias("__qv"))
    # distance of the query to each centroid — tiny, computed as a
    # literal-array expression, no collect of the collection
    dists = []
    for li, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(F.col("__qv"), carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dists.append(F.struct(d.alias("d"), F.lit(li).alias("list")))
    probe = qrow.select(
        F.slice(F.array_sort(F.array(*dists)), 1, n_probe).alias("probed")
    ).select(F.explode("probed.list").alias("__list"))

    cands = assigned.join(F.broadcast(probe), on="__list")
    sim = F.round(cosine_similarity(F.col(vec_col), query_vec), 6)
    return (
        cands.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def precision_at_k(
    vectors: DataFrame,
    k: int = 10,
    n_queries: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """M6 retrieval evaluation: for each of the first ``n_queries``
    vectors, precision@k = fraction of the k nearest (cosine, self
    excluded) sharing the query's label.

    One broadcast of the query set against the collection — a single
    pass over the big side, then a per-query top-k window.
    """
    q = vectors.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
    )
    sim = F.round(cosine_similarity(F.col("q_vec"), F.col(vec_col)), 6)
    scored = (
        vectors.join(F.broadcast(q), F.col(id_col) != F.col("q_id"))
        .select(
            "q_id",
            "q_label",
            F.col(id_col),
            F.col(label_col),
            sim.alias("cosine_sim"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy("q_id")
        .agg(
            (
                F.sum((F.col(label_col) == F.col("q_label")).cast("int")) / F.lit(k)
            ).alias("precision_at_k")
        )
    )

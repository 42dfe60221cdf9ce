"""Round-13 optimization invariants.

Each optimization that changed an operator's internals gets a focused
equivalence/safety test here (optimization round contract):

- ``spark.sql.unionOutputPartitioning=false`` (session.py): Spark 4.1's
  partitioning-aware union executed the bucketed merge-on-read fold —
  a union of n_buckets coalesce(1)+window branches — as ONE serial
  task. The session conf restores the parallel design: the fold must
  execute with one partition per bucket branch, and rows must be
  unchanged.
- ``hash_embed_knn``'s driver-side doc-0 embedding must be
  element-identical to the distributed mapInPandas path it replaced
  (same ``hash_projection_embedder`` closure, same parquet bytes).
- the LRU plan memo (txn) must evict oldest-first, never wholesale.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import txn

from .conftest import SF_DIR


def _bucketed_root(spark, tmp_path, n_buckets=4):
    """A tiny manifest-bearing bucketed table with 2 segments so the
    latest-by-key fold is non-trivial."""
    root = str(tmp_path / "bucketed_tbl")
    os.makedirs(os.path.join(root, txn.SEGMENTS_DIR))
    spec = {
        "kind": "latest_by_key",
        "keys": ["k"],
        "order_desc": ["ord"],
        "seq_col": "__sg_seq",
        "buckets": n_buckets,
    }
    for seg_i, (vals, ord_v) in enumerate(
        [([(i, f"v{i}") for i in range(40)], 1), ([(2, "V2"), (7, "V7")], 2)]
    ):
        df = (
            spark.createDataFrame(vals, "k long, v string")
            .withColumn("ord", F.lit(ord_v).cast("long"))
            .withColumn("__sg_seq", F.lit(seg_i).cast("long"))
            .withColumn(
                txn.BUCKET_COL,
                F.pmod(F.xxhash64(F.col("k").cast("string")), F.lit(n_buckets)).cast(
                    "int"
                ),
            )
        )
        seg = f"up_{seg_i}"
        df.write.partitionBy(txn.BUCKET_COL).parquet(txn.segment_path(root, seg))
    return root, spec


def test_bucketed_fold_executes_one_partition_per_bucket(spark, tmp_path):
    root, spec = _bucketed_root(spark, tmp_path, n_buckets=4)
    paths = [txn.segment_path(root, f"up_{i}") for i in range(2)]
    folded = txn.bucketed_reconstruct(spark, paths, spec)
    # the whole point of the bucket-branch union: parallelism == number
    # of non-empty bucket branches (4 here), NOT 1 (the Spark 4.1
    # partitioning-aware-union collapse this round's session conf fixes)
    n_parts = folded.rdd.getNumPartitions()
    assert n_parts >= 2, (
        f"bucketed fold collapsed to {n_parts} partition(s) — the "
        "union-of-buckets fold is executing serially"
    )
    rows = {(r["k"], r["v"]) for r in folded.select("k", "v").collect()}
    expect = {(i, f"v{i}") for i in range(40) if i not in (2, 7)} | {
        (2, "V2"),
        (7, "V7"),
    }
    assert rows == expect


def test_hash_embed_driver_vec_matches_distributed(spark):
    from cultural_heritage_bigdata_project_spark.operators import multimodal
    from cultural_heritage_bigdata_project_spark.plans.queries_vector import (
        _hash_embed_query_vec,
    )
    from cultural_heritage_bigdata_project_spark.sources.tables import load_table

    got = _hash_embed_query_vec(spark, SF_DIR, 0, 64)
    assert got is not None
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    row = (
        docs.mapInPandas(
            multimodal.hash_projection_embedder(dim=64),
            "doc_id long, embedding array<double>",
        )
        .filter(F.col("doc_id") == 0)
        .select("embedding")
        .first()
    )
    assert got == [float(x) for x in row[0]]


def test_plan_memo_lru_evicts_oldest_not_everything():
    memo = txn._READ_PLAN_MEMO
    saved = dict(memo)
    try:
        memo.clear()
        for i in range(txn._READ_PLAN_MEMO_MAX):
            txn._memo_put(("k", i), i)
        # hit the oldest entry so it becomes most-recently-used
        assert txn._memo_get(("k", 0)) == 0
        txn._memo_put(("k", "new"), "new")
        assert ("k", 0) in memo, "LRU hit should have protected the entry"
        assert ("k", 1) not in memo, "oldest un-hit entry should be evicted"
        assert len(memo) == txn._READ_PLAN_MEMO_MAX
    finally:
        memo.clear()
        memo.update(saved)

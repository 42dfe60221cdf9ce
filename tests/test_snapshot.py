"""`txn.snapshot_table` — export one retained version as a fresh
single-version table (Qdrant collection-snapshot / Delta DEEP CLONE
analog). The strong claims: both persisted index families serve from
the clone immediately with pruning intact; only the segments the
snapshotted version REFERENCES are copied; destination history starts
fresh with one 'snapshot' commit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import (
    ann_index,
    text,
    text_index,
    txn,
)
from cultural_heritage_bigdata_project_spark.sources.tables import load_table

from .conftest import SF_DIR


def _seg_names(root):
    d = os.path.join(root, txn.SEGMENTS_DIR)
    return set(os.listdir(d)) if os.path.isdir(d) else set()


def test_snapshot_ann_index_serves_identically(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    base = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    ann_index.build_ann_index(spark, base, src)
    upd = base.filter(F.col("vec_id") % 7 == 0).withColumn(
        "embedding", F.reverse(F.col("embedding"))
    )
    ann_index.ann_index_upsert(spark, upd, src)
    q = [
        float(x)
        for x in load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
    want = [tuple(r) for r in ann_index.ann_index_top_k(spark, src, q, k=10).collect()]

    txn.snapshot_table(src, dst)
    got = [tuple(r) for r in ann_index.ann_index_top_k(spark, dst, q, k=10).collect()]
    assert got == want  # probe-pruned serving, delta tail included

    d = ann_index.ann_index_describe(spark, dst, with_count=True)
    assert d["pruned_serving"] and d["n_delta_segments"] == 1
    assert d["n_points"] == base.count()

    # the clone is independent: deleting at the source leaves it intact
    ann_index.ann_index_delete(spark, [1, 2], src)
    assert (
        ann_index.ann_index_count(spark, dst).first()["n_points"]
        == base.count()
    )


def test_snapshot_copies_only_referenced_segments(spark, tmp_path):
    """After a compaction, the source segment store still holds the
    pre-compaction segments (older retained versions reference them);
    the snapshot of CURRENT must not drag them along."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    text_index.build_text_index(spark, docs, src, keep_last=4)
    extra = docs.filter(F.col("doc_id") < 3).withColumn(
        "text", F.concat(F.col("text"), F.lit(" snapshotterm"))
    )
    text_index.text_index_upsert(spark, extra, src, keep_last=4)
    text_index.text_index_compact(spark, src, keep_last=4)

    txn.snapshot_table(src, dst)
    cur = os.path.basename(txn.current_version_dir(src))
    referenced = {
        s
        for comp in txn.read_manifest(src, cur).values()
        for s in comp.get("segments", [])
    }
    assert _seg_names(dst) == referenced
    assert referenced < _seg_names(src)  # source keeps historical segments

    # the cloned index answers exactly like the source
    terms = ["snapshotterm", "merge"]
    want = [tuple(r) for r in text_index.text_index_search(spark, src, terms).collect()]
    got = [tuple(r) for r in text_index.text_index_search(spark, dst, terms).collect()]
    assert got == want and len(got) > 0


def test_snapshot_history_and_guards(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    text_index.build_text_index(spark, docs, src)

    txn.snapshot_table(src, dst)
    hist = txn.describe_history(dst)
    assert len(hist) == 1 and hist[0]["operation"] == "snapshot"
    # a backup is not a change event
    cur = os.path.basename(txn.current_version_dir(dst))
    for comp in txn.read_manifest(dst, cur).values():
        assert comp.get("changes") == []

    with pytest.raises(FileExistsError):
        txn.snapshot_table(src, dst)  # dest already published
    with pytest.raises(FileNotFoundError):
        txn.snapshot_table(str(tmp_path / "nothing"), str(tmp_path / "d2"))


def test_snapshot_plain_version_and_time_travel_pick(spark, tmp_path):
    root = str(tmp_path / "plain")
    os.makedirs(root)
    spark.range(5).withColumnRenamed("id", "k").write.parquet(
        os.path.join(root, "data_v0")
    )
    txn.publish_version(root, "data_v0", keep_last=3)
    spark.range(9).withColumnRenamed("id", "k").write.parquet(
        os.path.join(root, "data_v1")
    )
    txn.publish_version(root, "data_v1", keep_last=3)

    d0 = str(tmp_path / "d0")
    txn.snapshot_table(root, d0, version=0)  # snapshot a HISTORICAL version
    assert txn.read_version(spark, d0).count() == 5
    d1 = str(tmp_path / "d1")
    txn.snapshot_table(root, d1)  # default: CURRENT
    assert txn.read_version(spark, d1).count() == 9

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


def test_snapshot_refuses_mid_race_publish(spark, tmp_path, monkeypatch):
    """Round-10 ADVICE: the unpublished-destination guard must hold
    INSIDE the commit loop — on a CAS conflict commit_with_retry
    re-runs build against the refreshed pointer, and a racing
    publish at dest must make the loser FAIL (FileExistsError), never
    stack a second version on the winner's table. Simulated by
    blinding only the entry check so the commit path sees the winner."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    text_index.build_text_index(spark, docs, src)
    # the "winner": dst becomes a published table before our commit
    text_index.build_text_index(spark, docs.limit(5), dst)
    winner_versions = txn.list_versions(dst)

    real = txn.current_version_dir
    state = {"blinded": False}

    def blind(root_arg):
        if os.path.abspath(root_arg) == os.path.abspath(dst) and not state[
            "blinded"
        ]:
            state["blinded"] = True
            return None  # entry check passes; the commit loop sees truth
        return real(root_arg)

    monkeypatch.setattr(txn, "current_version_dir", blind)
    with pytest.raises(FileExistsError, match="mid-snapshot"):
        txn.snapshot_table(src, dst)
    # the winner's table is untouched: same single published version
    assert txn.list_versions(dst) == winner_versions


def test_snapshot_carries_pending_payload_overlays(spark, tmp_path):
    """A snapshot taken with un-compacted set_payload overlays must
    copy the overlay segments (they ride the metadata blocks, not the
    read list) — the clone's filtered serve answers like the source."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .withColumn("status", F.lit("pending"))
    )
    text_index.build_text_index(spark, docs, src, payload_cols=["status"])
    text_index.text_index_set_payload(
        spark,
        spark.createDataFrame([(3, "validated")], "doc_id long, status string"),
        src,
    )
    txn.snapshot_table(src, dst)
    terms = ["merge", "spark", "window"]
    got = text_index.text_index_search(
        spark, dst, terms, top_k=5, payload_filter="status = 'validated'"
    ).collect()
    want = text_index.text_index_search(
        spark, src, terms, top_k=5, payload_filter="status = 'validated'"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert {int(r["doc_id"]) for r in got} <= {3}


def test_vacuum_never_reclaims_live_payload_overlays(spark, tmp_path):
    """GC references now include the metadata-block payload_deltas:
    after the set_payload COMMIT ages out of retention (keep_last=1
    churn), a zero-grace vacuum must keep the overlay segment the
    CURRENT manifest still serves from."""
    root = str(tmp_path / "idx")
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .withColumn("status", F.lit("pending"))
    )
    text_index.build_text_index(
        spark, docs, root, payload_cols=["status"], keep_last=1
    )
    text_index.text_index_set_payload(
        spark,
        spark.createDataFrame([(3, "validated")], "doc_id long, status string"),
        root,
        keep_last=1,
    )
    # two more commits: the set_payload VERSION ages out of retention
    for i in (1, 2):
        text_index.text_index_upsert(
            spark,
            docs.filter(F.col("doc_id") == 7 * i),
            root,
            keep_last=1,
        )
    txn.vacuum(root, grace_seconds=0.0)
    got = text_index.text_index_search(
        spark, root, ["merge", "spark", "window"], top_k=5,
        payload_filter="status = 'validated'",
    ).collect()
    assert {int(r["doc_id"]) for r in got} <= {3}
    assert text_index.text_index_describe(root)["n_payload_delta_segments"] == 1

"""Round-11 ADVICE closures on the payload-mutation commit contract:

1. set_payload publishes NO change-feed record (its overlay rows are
   partial-column patches — a latest-per-key feed consumer applying
   them as full-row upserts would null codes/doclen in its replica);
   GC liveness rides the payload_deltas metadata reference instead.
2. Empty-batch mutations are TRUE no-ops: the new manifest's changes
   reset to [], so a feed walk across the no-op epoch never
   re-delivers the predecessor's delta.
3. update_vectors / update_docs read stored payload back INSIDE the
   commit loop: a set_payload that commits between the readback and
   the publish forces a CAS retry that re-reads the refreshed
   overlay — the re-label is never silently rolled back.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import (
    ann_index,
    text_index,
    txn,
)
from cultural_heritage_bigdata_project_spark.sources.tables import load_table

from .conftest import SF_DIR


def _base(spark):
    return load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)


def _feed_rows(spark, root, from_version, component):
    df = txn.change_feed(spark, root, from_version, component=component)
    return df.collect()


def test_ann_set_payload_publishes_no_feed_changes(spark, tmp_path):
    root = str(tmp_path / "idx")
    base = _base(spark)
    v_build = os.path.basename(
        ann_index.build_ann_index(spark, base, root, payload_cols=["label"])
    )
    flips = base.filter(F.col("vec_id") % 11 == 3).select(
        "vec_id", F.lit(7).alias("label")
    )
    ann_index.ann_index_set_payload(spark, flips, root)
    # the payload-only epoch advertises NO row changes: a feed from the
    # build version is empty (the build's own changes are the baseline)
    rows = _feed_rows(spark, root, v_build, ann_index.CODES_COMPONENT)
    assert rows == []
    # ...yet the mutation is live on the very next serve
    got = {
        r["vec_id"]: r["label"]
        for r in ann_index.ann_index_live(spark, root)
        .filter(F.col("vec_id") % 11 == 3)
        .select("vec_id", "label")
        .collect()
    }
    assert got and all(v == 7 for v in got.values())


def test_text_set_payload_publishes_no_feed_changes(spark, tmp_path):
    root = str(tmp_path / "idx")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang"
    )
    v_build = os.path.basename(
        text_index.build_text_index(spark, docs, root, payload_cols=["lang"])
    )
    flips = docs.filter(F.col("doc_id") % 9 == 2).select(
        "doc_id", F.lit("zz").alias("lang")
    )
    text_index.text_index_set_payload(spark, flips, root)
    rows = _feed_rows(spark, root, v_build, text_index.DOCLEN_COMPONENT)
    assert rows == []
    rows_p = _feed_rows(spark, root, v_build, text_index.POSTINGS_COMPONENT)
    assert rows_p == []


def test_empty_batch_mutations_do_not_redeliver_prior_delta(spark, tmp_path):
    """A no-op commit (empty set_payload batch / empty delete id set)
    must not copy the predecessor's `changes` under its new epoch —
    that re-delivered the prior upsert's delta to feed walkers."""
    root = str(tmp_path / "idx")
    base = _base(spark)
    # keep_last high enough that the walked-from epoch stays retained
    # across the two no-op commits (a feed from an aged-out epoch
    # raises by design)
    ann_index.build_ann_index(spark, base, root, payload_cols=["label"])
    v_up = os.path.basename(
        ann_index.ann_index_upsert(
            spark, base.filter(F.col("vec_id") % 7 == 0), root,
            keep_last=4,
        )
    )
    empty = base.filter(F.lit(False)).select("vec_id", "label")
    ann_index.ann_index_set_payload(spark, empty, root, keep_last=4)
    ann_index.ann_index_delete(spark, [], root, keep_last=4)
    # walking PAST the upsert epoch across both no-ops delivers nothing
    rows = _feed_rows(spark, root, v_up, ann_index.CODES_COMPONENT)
    assert rows == []
    # and the no-op manifests themselves carry empty changes lists
    cur = os.path.basename(txn.current_version_dir(root))
    comp = txn.read_manifest(root, cur)[ann_index.CODES_COMPONENT]
    assert comp.get("changes") == []


def test_update_vectors_survives_concurrent_set_payload(
    spark, tmp_path, monkeypatch
):
    """Round-10 ADVICE (low #3): a set_payload committing between
    update_vectors' payload readback and its publish used to be
    silently rolled back (the stale baked payload carried the newer
    row epoch). The readback now runs inside the commit loop: the
    injected competitor forces a CAS conflict, the retry re-reads the
    refreshed overlay, and the re-label survives the re-embed."""
    root = str(tmp_path / "idx")
    base = _base(spark)
    ann_index.build_ann_index(spark, base, root, payload_cols=["label"])

    flips = base.filter(F.col("vec_id") % 11 == 3).select(
        "vec_id", F.lit(42).alias("label")
    )
    real = txn.try_publish_version
    state = {"armed": True, "conflicts": 0}

    def racy(root_, dirname, expected, **kw):
        if state["armed"] and kw.get("op") == "ann_upsert":
            state["armed"] = False  # competitor commits exactly once,
            # re-entrancy safe: set_payload's own publish sees armed=False
            ann_index.ann_index_set_payload(spark, flips, root)
        try:
            return real(root_, dirname, expected, **kw)
        except txn.CommitConflict:
            state["conflicts"] += 1
            raise

    monkeypatch.setattr(txn, "try_publish_version", racy)
    upd = base.filter(F.col("vec_id") % 11 == 3).select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    )
    ann_index.ann_index_update_vectors(spark, upd, root)
    assert state["conflicts"] >= 1  # the race actually happened
    monkeypatch.setattr(txn, "try_publish_version", real)

    live = {
        r["vec_id"]: (r["label"], list(r["embedding"]))
        for r in ann_index.ann_index_live(spark, root)
        .filter(F.col("vec_id") % 11 == 3)
        .select("vec_id", "label", "embedding")
        .collect()
    }
    orig = {
        r["vec_id"]: list(r["embedding"])
        for r in base.filter(F.col("vec_id") % 11 == 3)
        .select("vec_id", "embedding")
        .collect()
    }
    assert live
    for vid, (label, emb) in live.items():
        assert label == 42, "concurrent re-label was rolled back"
        assert emb == list(reversed(orig[vid])), "re-embed lost"


def test_failed_build_leaves_no_claimed_version_dir(spark, tmp_path):
    """A build-callback failure (here: update of a nonexistent id)
    must clean its exclusively-claimed version directory — the commit
    was never published, so nothing may accumulate."""
    root = str(tmp_path / "idx")
    base = _base(spark)
    ann_index.build_ann_index(spark, base, root, payload_cols=["label"])
    before = sorted(
        n for n in os.listdir(root) if n.startswith("data_v")
    )
    ghost = spark.createDataFrame(
        [(10_000_000, [0.0] * len(base.first()["embedding"]))],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(KeyError):
        ann_index.ann_index_update_vectors(spark, ghost, root)
    after = sorted(n for n in os.listdir(root) if n.startswith("data_v"))
    assert after == before

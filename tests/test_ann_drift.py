"""Quantizer-drift monitoring for the persisted ANN index: every
commit records its rows' mean squared quantization error, so
`ann_index_drift` answers rebuild-vs-compact from the manifest alone —
the data-driven version of the reference's "rebuild the collection
when it feels stale" (it has no signal at all; the extractor loop
re-embeds on a timer, extracting_embeddings.py:266-457)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import ann_index, txn
from cultural_heritage_bigdata_project_spark.sources.tables import load_table

from .conftest import SF_DIR


def _base(spark):
    return load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)


def test_drift_flat_for_same_distribution_upserts(spark, tmp_path):
    root = str(tmp_path / "idx")
    base = _base(spark)
    ann_index.build_ann_index(spark, base, root)
    d0 = ann_index.ann_index_drift(spark, root)
    assert d0["build_mean"] and d0["build_mean"] > 0
    assert d0["incoming_mean"] is None and d0["incoming_ratio"] is None
    assert d0["live_mean"] == d0["build_mean"]  # pre-compaction fallback

    # re-upserting EXISTING vectors: identical rows, identical error
    ann_index.ann_index_upsert(spark, base.filter(F.col("vec_id") % 5 == 0), root)
    d1 = ann_index.ann_index_drift(spark, root)
    assert d1["n_incoming"] > 0
    # same distribution, same quantizers: ratio near 1 (subset noise only)
    assert 0.5 < d1["incoming_ratio"] < 2.0
    assert d1["build_mean"] == d0["build_mean"]  # baseline is fixed


def test_drift_detects_distribution_shift_and_survives_compaction(spark, tmp_path):
    root = str(tmp_path / "idx")
    base = _base(spark)
    ann_index.build_ann_index(spark, base, root)
    b0 = ann_index.ann_index_drift(spark, root)["build_mean"]

    # shifted regime: scale x10 => squared-L2 error ~x100
    shifted = base.filter(F.col("vec_id") % 3 == 0).withColumn(
        "embedding", F.transform("embedding", lambda x: x * 10.0)
    )
    ann_index.ann_index_upsert(spark, shifted, root)
    d = ann_index.ann_index_drift(spark, root)
    assert d["incoming_ratio"] > 10  # unmistakable rebuild signal
    desc = ann_index.ann_index_describe(spark, root)
    assert desc["drift"]["incoming_ratio"] == d["incoming_ratio"]

    # the cheap fold must NOT hide the drift
    ann_index.ann_index_compact(spark, root)
    dc = ann_index.ann_index_drift(spark, root)
    assert dc["build_mean"] == b0  # baseline untouched
    assert dc["incoming_mean"] is None  # tail folded
    assert dc["live_mean"] > b0 * 2  # drifted rows still visible in live

    # ... and the REBUILD resets the baseline to the new distribution
    live = txn.read_version(spark, root, subdir="codes").select(
        "vec_id", "embedding"
    )
    ann_index.build_ann_index(spark, live, root)
    dr = ann_index.ann_index_drift(spark, root)
    assert dr["build_mean"] != b0 and dr["incoming_mean"] is None


def test_streaming_rebuild_on_drift_triggers_quantizer_refresh(spark, tmp_path):
    root = str(tmp_path / "idx")
    base = _base(spark)
    ann_index.build_ann_index(spark, base, root)

    inc_dir = str(tmp_path / "inc")
    os.makedirs(inc_dir)
    shifted = base.filter(F.col("vec_id") % 4 == 0).withColumn(
        "embedding", F.transform("embedding", lambda x: x * 10.0)
    )
    shifted.write.parquet(os.path.join(inc_dir, "b0"))
    stream = spark.readStream.schema(shifted.schema).parquet(inc_dir + "/*")
    ann_index.foreach_batch_ann_index_run(
        spark, stream, root, checkpoint=str(tmp_path / "ckpt"),
        rebuild_every_deltas=None, rebuild_on_drift=2.0,
    )
    # the drifted batch crossed the threshold -> quantizers refreshed:
    # fresh build state (no delta tail, no incoming error, new baseline)
    d = ann_index.ann_index_drift(spark, root)
    assert d["incoming_mean"] is None
    ops = [h["operation"] for h in txn.describe_history(root)]
    assert ops[0] == "ann_build"  # newest commit is the drift rebuild
    desc = ann_index.ann_index_describe(spark, root, with_count=True)
    assert desc["n_delta_segments"] == 0
    assert desc["n_points"] == base.count()


def test_drift_none_for_pre_feature_index(spark, tmp_path):
    """Manifests written before the error column existed must report
    all-None instead of failing."""
    root = str(tmp_path / "idx")
    ann_index.build_ann_index(spark, _base(spark), root)
    cur = os.path.basename(txn.current_version_dir(root))
    components = txn.read_manifest(root, cur)
    components["codes"]["ann"].pop("qerr_build")
    components["codes"]["ann"].pop("qerr_deltas")
    txn.write_manifest(root, cur, components)
    d = ann_index.ann_index_drift(spark, root)
    assert d == {
        "build_mean": None,
        "incoming_mean": None,
        "n_incoming": 0,
        "live_mean": None,
        "incoming_ratio": None,
    }
    assert ann_index.ann_index_describe(spark, root)["drift"] is None


def test_zero_baseline_drift_is_infinite_not_disabled(spark, tmp_path):
    """Round-10 ADVICE: build_mean == 0.0 (perfect quantization —
    n_lists >= point count makes every vector its own centroid) must
    NOT read as 'no baseline': nonzero incoming error returns
    incoming_ratio = inf so any rebuild_on_drift threshold fires."""
    root = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(i, [float(i), float(-i), 1.0, 0.5]) for i in range(1, 5)],
        "vec_id long, embedding array<double>",
    )
    # n_lists == point count: each vector is its own centroid, qerr 0
    ann_index.build_ann_index(spark, base, root, n_lists=4, m=2, n_codes=4)
    d0 = ann_index.ann_index_drift(spark, root)
    assert d0["build_mean"] == 0.0 and d0["incoming_ratio"] is None

    # an upsert the stored centroids have never seen: qerr > 0
    ups = spark.createDataFrame(
        [(9, [100.0, 100.0, -100.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    ann_index.ann_index_upsert(spark, ups, root)
    d1 = ann_index.ann_index_drift(spark, root)
    assert d1["build_mean"] == 0.0 and d1["incoming_mean"] > 0.0
    assert d1["incoming_ratio"] == float("inf")
    # and the trigger comparison any caller writes fires on it
    assert d1["incoming_ratio"] > 3.0

    # zero incoming over a zero baseline is NOT drift
    same = spark.createDataFrame(
        [(10, [1.0, -1.0, 1.0, 0.5])], "vec_id long, embedding array<double>"
    )
    # exact duplicate of an existing centroid's vector -> qerr 0
    dup = base.filter(F.col("vec_id") == 1).withColumn(
        "vec_id", F.lit(20).cast("long")
    )
    root2 = str(tmp_path / "idx2")
    ann_index.build_ann_index(spark, base, root2, n_lists=4, m=2, n_codes=4)
    ann_index.ann_index_upsert(spark, dup, root2)
    d2 = ann_index.ann_index_drift(spark, root2)
    assert d2["incoming_mean"] == 0.0 and d2["incoming_ratio"] == 1.0
    del same

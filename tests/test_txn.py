"""Crash-safety gate for file-backed commits (operators/txn.py):
simulate every mid-commit crash state the round-1 advice identified and
assert the next run recovers without data loss or collision."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import scale, txn
from cultural_heritage_bigdata_project_spark.sources.tables import load_table
from cultural_heritage_bigdata_project_spark.streaming import pipelines as streaming

from .conftest import SF_DIR


def test_publish_version_roundtrip(tmp_path):
    root = str(tmp_path)
    assert txn.current_version_dir(root) is None
    os.makedirs(os.path.join(root, "data_v0"))
    txn.publish_version(root, "data_v0")
    assert txn.current_version_dir(root) == os.path.join(root, "data_v0")
    # newer version replaces and the old one is garbage-collected
    os.makedirs(os.path.join(root, "data_v1"))
    txn.publish_version(root, "data_v1")
    assert txn.current_version_dir(root) == os.path.join(root, "data_v1")
    assert not os.path.exists(os.path.join(root, "data_v0"))


def test_cleanup_unpublished_keeps_current(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "data_v3"))
    txn.publish_version(root, "data_v3")
    # crash aftermath: a partially-written next version + stale tmp ptr
    os.makedirs(os.path.join(root, "data_v4"))
    with open(os.path.join(root, "CURRENT.tmp"), "w") as f:
        f.write("data_v4")
    removed = txn.cleanup_unpublished(root)
    assert "data_v4" in removed
    assert txn.current_version_dir(root) == os.path.join(root, "data_v3")
    assert not os.path.exists(os.path.join(root, "CURRENT.tmp"))


def test_recover_swap_restores_vanished_target(tmp_path):
    path = str(tmp_path / "table")
    old = path + "__old"
    os.makedirs(old)
    with open(os.path.join(old, "part-0.parquet"), "w") as f:
        f.write("x")
    # crash window: target renamed away, staging never moved in
    os.makedirs(path + "__staging")
    txn.recover_swap(path)
    assert os.path.isdir(path)
    assert os.path.exists(os.path.join(path, "part-0.parquet"))
    assert not os.path.exists(old)
    assert not os.path.exists(path + "__staging")


def test_compact_table_after_crash(spark, tmp_path):
    p = str(tmp_path / "t")
    load_table(spark, SF_DIR, "nation").write.parquet(p)
    n_rows = spark.read.parquet(p).count()
    # simulate the crashed swap: table renamed to __old, staging stale
    os.replace(p, p + "__old")
    os.makedirs(p + "__compact_staging")
    n = scale.compact_table(spark, p, target_files=2)
    assert n == 2
    assert spark.read.parquet(p).count() == n_rows


def test_incremental_cycle_after_crash(spark, tmp_path):
    p = str(tmp_path / "t")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    scale.incremental_cycle(spark, o, p, "o_orderdate", ["o_orderkey"], ["o_orderdate"])
    n_rows = spark.read.parquet(p).count()
    os.replace(p, p + "__old")  # crash window
    final = scale.incremental_cycle(
        spark, o, p, "o_orderdate", ["o_orderkey"], ["o_orderdate"]
    )
    assert final.count() == n_rows


def test_upsert_run_no_missing_table_window(spark, tmp_path):
    """The versioned commit must keep a committed table visible at every
    point: after the run, CURRENT names a complete directory, no stale
    versions linger, and a resume (reset=False) with no new files
    returns the same table."""
    ev = load_table(spark, SF_DIR, "events").limit(200)
    src_dir = str(tmp_path / "src")
    ev.write.parquet(src_dir)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    tdir = str(tmp_path / "target")
    final = streaming.foreach_batch_upsert_run(
        spark, stream, keys=["user_id"], order_desc=["ts", "event_id"],
        target_dir=tdir, reset=True,
    )
    n = final.count()
    assert n > 0
    cur = txn.current_version_dir(tdir)
    assert cur is not None and os.path.isdir(cur)
    versions = [d for d in os.listdir(tdir) if d.startswith("data_v")]
    assert versions == [os.path.basename(cur)], f"stale versions: {versions}"
    # resume with a stale unpublished version lying around (crash relic)
    os.makedirs(os.path.join(tdir, "data_v999"))
    stream2 = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    again = streaming.foreach_batch_upsert_run(
        spark, stream2, keys=["user_id"], order_desc=["ts", "event_id"],
        target_dir=tdir, reset=False,
    )
    assert again.count() == n
    assert not os.path.exists(os.path.join(tdir, "data_v999"))


def _publish_parquet(spark, root, n, value):
    vname = f"data_v{n}"
    spark.range(value).select(F.col("id")).write.mode("overwrite").parquet(
        os.path.join(str(root), vname)
    )
    return vname


def test_time_travel_retention(spark, tmp_path):
    """keep_last retains readable history: older versions stay
    time-travel-readable until they age out, then vacuum removes them;
    retention rides the same atomic pointer write."""
    root = str(tmp_path)
    for n, rows in [(0, 5), (1, 7), (2, 9)]:
        vname = _publish_parquet(spark, root, n, rows)
        txn.publish_version(root, vname, keep_last=2)
    # v2 current, v1 retained, v0 vacuumed
    assert txn.list_versions(root) == ["data_v2", "data_v1"]
    assert txn.read_version(spark, root).count() == 9
    assert txn.read_version(spark, root, 1).count() == 7
    assert txn.read_version(spark, root, "data_v1").count() == 7
    assert not os.path.isdir(os.path.join(root, "data_v0"))
    import pytest as _pytest

    with _pytest.raises(KeyError, match="not retained"):
        txn.version_dir(root, 0)


def test_time_travel_single_line_pointer_back_compat(spark, tmp_path):
    """A pointer file from the pre-retention layout (single line) must
    read as a one-entry manifest."""
    root = str(tmp_path)
    _publish_parquet(spark, root, 3, 4)
    with open(os.path.join(root, "CURRENT"), "w", encoding="utf-8") as f:
        f.write("data_v3")
    assert txn.list_versions(root) == ["data_v3"]
    assert txn.read_version(spark, root).count() == 4
    # next publish upgrades the manifest in place
    vname = _publish_parquet(spark, root, 4, 6)
    txn.publish_version(root, vname, keep_last=2)
    assert txn.list_versions(root) == ["data_v4", "data_v3"]


def test_streaming_upsert_with_history(spark, tmp_path):
    """foreach_batch_upsert_run(keep_last=2) leaves the previous epoch
    readable — the corpus-snapshot time-travel story end to end. Two
    source files + maxFilesPerTrigger=1 force TWO epochs, so retention
    is actually exercised (one epoch would pass even if keep_last were
    ignored)."""
    import time as _time

    ev = load_table(spark, SF_DIR, "events").limit(200)
    src = tmp_path / "src"
    src.mkdir()
    for i, frac in enumerate([0.5, 1.0]):
        part = ev.limit(int(200 * frac))
        pdir = str(tmp_path / f"part{i}")
        part.coalesce(1).write.mode("overwrite").parquet(pdir)
        pfile = next(
            f for f in os.listdir(pdir) if f.endswith(".parquet")
        )
        os.replace(os.path.join(pdir, pfile), str(src / f"f{i}.parquet"))
        _time.sleep(1.1)  # distinct mtimes -> deterministic epoch order
    stream = streaming.events_stream(
        spark, str(src), max_files_per_trigger=1
    ).select("user_id", "event_id", "ts", "event_type", "value")
    final = streaming.foreach_batch_upsert_run(
        spark,
        stream,
        keys=["user_id"],
        order_desc=["ts", "event_id"],
        target_dir=str(tmp_path / "tbl"),
        keep_last=2,
    )
    assert final.count() > 0
    versions = txn.list_versions(str(tmp_path / "tbl"))
    assert len(versions) == 2, versions
    # current epoch == final state; previous epoch is a strict subset
    assert txn.read_version(spark, str(tmp_path / "tbl"), versions[0]).count() == final.count()
    prev = txn.read_version(spark, str(tmp_path / "tbl"), versions[1])
    assert 0 < prev.count() <= final.count()


def test_clustered_write_prunes_by_minmax(spark, tmp_path):
    """Range-clustered output files must carry narrow, (near-)disjoint
    cluster-key ranges so parquet min/max stats prune file reads: a
    point/range predicate touches a small subset of files, and the
    pruned scan returns the same rows as the full scan."""
    import pyarrow.parquet as pq

    out = str(tmp_path / "clustered")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    scale.clustered_write(o, out, ["o_orderkey"], n_files=8)
    files = sorted(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert len(files) >= 4
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "o_orderkey"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # file ranges must be non-overlapping (range partitioner boundary
    # keys can land on either side, so allow touching endpoints)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} vs {(lo2, hi2)}"
    # and predicate results must match the unclustered truth
    mid = ranges[len(ranges) // 2][0]
    expect = o.filter(F.col("o_orderkey") <= mid).count()
    got = spark.read.parquet(out).filter(F.col("o_orderkey") <= mid).count()
    assert got == expect


def test_zorder_clustering_bounds_both_dimensions(spark, tmp_path):
    """Range-clustering on the Morton key must bound BOTH dimensions
    per file: every file's (d1, d2) min/max box is far smaller than
    the global domain (the 2-D pruning property), while clustering on
    d1 alone leaves d2 unconstrained (full-range in every file)."""
    import pyarrow.parquet as pq

    o = load_table(spark, SF_DIR, "orders").select(
        (F.col("o_custkey") % 256).cast("long").alias("d1"),
        (F.col("o_orderkey") % 256).cast("long").alias("d2"),
    )
    z = o.withColumn("zkey", scale.zorder_key(F.col("d1"), F.col("d2"), bits=8))

    def file_boxes(path, col_idx):
        boxes = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                c = md.row_group(rg).column(col_idx)
                mins.append(c.statistics.min)
                maxs.append(c.statistics.max)
            boxes.append((min(mins), max(maxs)))
        return boxes

    out_z = str(tmp_path / "zorder")
    scale.clustered_write(z, out_z, ["zkey"], n_files=16)
    out_lin = str(tmp_path / "linear")
    scale.clustered_write(o, out_lin, ["d1"], n_files=16)

    # column order after clustered_write: d1, d2, (zkey)
    z_d1 = file_boxes(out_z, 0)
    z_d2 = file_boxes(out_z, 1)
    lin_d2 = file_boxes(out_lin, 1)
    avg = lambda boxes: sum(hi - lo for lo, hi in boxes) / len(boxes)
    # z-order: BOTH dims' per-file spans are a fraction of the 0..255
    # domain; 8 bits over 16 files → top 4 z-bits fixed per file →
    # each dim constrained to ~1/4 of its range (allow slack for
    # range-partitioner boundaries)
    assert avg(z_d1) < 0.55 * 255, avg(z_d1)
    assert avg(z_d2) < 0.55 * 255, avg(z_d2)
    # linear clustering leaves the second dimension unconstrained
    assert avg(lin_d2) > 0.9 * 255, avg(lin_d2)
    # and the z-ordered table still returns exact box-predicate results
    got = (
        spark.read.parquet(out_z)
        .filter((F.col("d1") < 64) & (F.col("d2") < 64))
        .count()
    )
    expect = o.filter((F.col("d1") < 64) & (F.col("d2") < 64)).count()
    assert got == expect


def test_maintenance_cas_survives_concurrent_sink_epoch(spark, tmp_path, monkeypatch):
    """Round-5 ADVICE medium: compact_component publishes with a CAS
    against the version it read. Inject a competing sink epoch between
    the fold and the publish — the old unconditional publish would
    silently drop that epoch's segment from the read list (lost
    update); the CAS path must detect the conflict, re-run against the
    new current, and keep BOTH the compaction and the epoch's rows."""
    root = str(tmp_path / "tbl")
    spec = {
        "kind": "latest_by_key",
        "keys": ["k"],
        "order_desc": ["ts"],
        "seq_col": "__sg_seq",
    }

    def sink_epoch(epoch, lo, hi):
        df = spark.createDataFrame(
            [(k, 10 * epoch + k) for k in range(lo, hi)], "k long, ts long"
        ).withColumn("__sg_seq", F.lit(epoch).cast("long"))
        seg = f"upsert_v{epoch}"
        df.write.parquet(txn.segment_path(root, seg))
        cur = txn.current_version_dir(root)
        prev = (
            txn.read_manifest(root, os.path.basename(cur))[""]["segments"]
            if cur
            else []
        )
        vname = f"data_v{epoch}"
        os.makedirs(os.path.join(root, vname))
        txn.write_manifest(
            root,
            vname,
            {"": {"base": None, "segments": [*prev, seg], "changes": [seg],
                  "reconstruct": spec, "collapsed": False}},
        )
        txn.publish_version(root, vname, keep_last=10, grace_seconds=3600)

    sink_epoch(0, 0, 20)
    sink_epoch(1, 10, 30)

    real_publish = txn.try_publish_version
    fired = {"n": 0}

    def racing_publish(*args, **kwargs):
        if fired["n"] == 0:
            fired["n"] += 1
            sink_epoch(2, 25, 40)  # epoch lands mid-maintenance
        return real_publish(*args, **kwargs)

    monkeypatch.setattr(txn, "try_publish_version", racing_publish)
    txn.compact_component(spark, root)
    assert fired["n"] == 1

    final = txn.read_version(spark, root)
    # every key 0..39 alive with its LATEST ts, including epoch 2's
    got = {r.k: r.ts for r in final.collect()}
    assert set(got) == set(range(40))
    for k in range(25, 40):
        assert got[k] == 20 + k, (k, got[k])  # epoch 2 won these keys
    # and the committed state is collapsed (the compaction did land)
    comp = txn.read_manifest(
        root, os.path.basename(txn.current_version_dir(root))
    )[""]
    assert comp.get("collapsed") and len(comp["segments"]) == 1


# ---------------------------------------------------------------------------
# manifest min/max data skipping (Delta stats-skipping analog)


def _disjoint_range_table(spark, tmp_path, compact_every=8):
    """Segmented upsert table whose 3 epochs carry DISJOINT id ranges
    (0-99, 100-199, 200-299), so per-segment min/max stats can prove a
    range predicate excludes whole segments."""
    import time as _time

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    for i in range(3):
        df = spark.range(i * 100, i * 100 + 100).select(
            F.col("id"), (F.col("id") * 10).alias("v"),
            F.lit(i).alias("epoch_no"),
        )
        df.coalesce(1).write.parquet(os.path.join(src_dir, f"f{i}"))
        _time.sleep(0.05)  # distinct mtimes → one file per micro-batch
    schema = spark.read.parquet(os.path.join(src_dir, "f0")).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src_dir, "*"))
    )
    tdir = str(tmp_path / "target")
    streaming.foreach_batch_upsert_run(
        spark, stream, keys=["id"], order_desc=["v"],
        target_dir=tdir, reset=True, compact_every=compact_every,
    )
    return tdir


def test_predicate_read_matches_filter(spark, tmp_path):
    """read_version(..., predicates=...) ≡ read_version(...).filter(...)
    for key predicates, non-key predicates, and their conjunction, on an
    UNCOMPACTED multi-segment table (the fold must not lose rows)."""
    tdir = _disjoint_range_table(spark, tmp_path)
    full = txn.read_version(spark, tdir)

    def rows(df):
        return sorted((r.id, r.v) for r in df.select("id", "v").collect())

    # key predicate (prunes + pushes below the fold)
    got = txn.read_version(spark, tdir, predicates={"id": (50, 149)})
    assert rows(got) == rows(full.filter(F.col("id").between(50, 149)))
    # non-key predicate (residual only — applied after reconstruction)
    got = txn.read_version(spark, tdir, predicates={"v": (None, 990)})
    assert rows(got) == rows(full.filter(F.col("v") <= 990))
    # conjunction, half-open
    got = txn.read_version(
        spark, tdir, predicates={"id": (200, None), "v": (2500, None)}
    )
    assert rows(got) == rows(
        full.filter((F.col("id") >= 200) & (F.col("v") >= 2500))
    )
    # empty-match predicate still returns the schema, zero rows
    got = txn.read_version(spark, tdir, predicates={"id": (10_000, None)})
    assert got.count() == 0 and "v" in got.columns


def test_predicate_read_prunes_segments_metadata_only(spark, tmp_path):
    """The sink records per-segment min/max in the manifest; a key-range
    predicate drops provably-excluded segments from the read list WITHOUT
    opening any parquet footer (pruning is metadata-only)."""
    tdir = _disjoint_range_table(spark, tmp_path)
    cur = txn.current_version_dir(tdir)
    comp = txn.read_manifest(tdir, os.path.basename(cur))[""]
    assert len(comp["segments"]) == 3
    stats = comp.get("stats")
    assert stats and set(stats) == set(comp["segments"])
    for seg in comp["segments"]:
        assert stats[seg]["id"][1] - stats[seg]["id"][0] == 99
    spec = comp.get("reconstruct")

    # one segment survives a narrow key range — and no footer is read
    import unittest.mock as mock

    with mock.patch.object(
        txn, "collect_parquet_stats",
        side_effect=AssertionError("pruning touched a parquet footer"),
    ):
        kept = txn._prune_component_paths(
            tdir, cur, comp, spec, {"id": (120, 130)}
        )
    assert len(kept) == 1 and comp["segments"][1] in kept[0]
    # non-key predicate never prunes a merge-on-read component
    kept = txn._prune_component_paths(tdir, cur, comp, spec, {"v": (0, 1)})
    assert len(kept) == 3


def test_predicate_read_after_compaction_and_rewrite_stats(spark, tmp_path):
    """Collapsed reads accept predicates too, and maintenance rewrites
    (compact_component) record fresh stats for the rewritten segment."""
    tdir = _disjoint_range_table(spark, tmp_path, compact_every=2)
    cur = txn.current_version_dir(tdir)
    comp = txn.read_manifest(tdir, os.path.basename(cur))[""]
    assert comp.get("collapsed")  # 3 epochs > compact_every=2
    got = txn.read_version(spark, tdir, predicates={"id": (0, 99), "v": (500, None)})
    assert sorted(r.id for r in got.collect()) == list(range(50, 100))

    txn.compact_component(spark, tdir)
    cur = txn.current_version_dir(tdir)
    comp = txn.read_manifest(tdir, os.path.basename(cur))[""]
    stats = comp.get("stats")
    assert stats and set(stats) == set(comp["segments"])
    (seg_stats,) = stats.values()
    assert seg_stats["id"] == [0, 299]


def test_segment_key_bloom_cross_side_hash_agreement(spark):
    """Spark-side bloom build and driver-side probe use the same md5
    positions: every present value hits; absent values mostly miss."""
    df = spark.range(0, 200).select(
        F.col("id"), F.col("id").cast("string").alias("sid")
    )
    blooms = txn.segment_key_bloom(df, ["id", "sid"])
    for col in ("id", "sid"):
        mask = int(blooms[col], 16)
        for v in (0, 7, 199):
            probe = v if col == "id" else str(v)
            assert all(
                (mask >> p) & 1 for p in txn._bloom_probe_positions(probe)
            ), f"present value {probe!r} missed in {col}"
    # absent values: at ~200 keys / 4096 bits the FP rate is tiny —
    # a run of 50 absent probes must contain misses
    mask = int(blooms["id"], 16)
    missed = sum(
        0 if all((mask >> p) & 1 for p in txn._bloom_probe_positions(v))
        else 1
        for v in range(10_000, 10_050)
    )
    assert missed >= 45, f"only {missed}/50 absent values excluded"
    # non-portable value types never exclude
    assert txn._bloom_probe_positions(1.5) is None
    assert txn._bloom_probe_positions(True) is None


def _interleaved_key_table(spark, tmp_path):
    """3 epochs with INTERLEAVED key ranges (id % 3 == e): per-segment
    min/max spans [e, ~300] so range stats cannot prune anything — the
    regime where only the key bloom can skip segments."""
    import time as _time

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    for e in range(3):
        df = (
            spark.range(0, 300)
            .filter(F.col("id") % 3 == e)
            .select(F.col("id"), (F.col("id") * 7).alias("v"))
        )
        df.coalesce(1).write.parquet(os.path.join(src_dir, f"f{e}"))
        _time.sleep(0.05)
    schema = spark.read.parquet(os.path.join(src_dir, "f0")).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src_dir, "*"))
    )
    tdir = str(tmp_path / "target")
    streaming.foreach_batch_upsert_run(
        spark, stream, keys=["id"], order_desc=["v"],
        target_dir=tdir, reset=True, compact_every=8, key_blooms=True,
    )
    return tdir


def test_bloom_prunes_point_lookup_where_minmax_cannot(spark, tmp_path):
    tdir = _interleaved_key_table(spark, tmp_path)
    cur = txn.current_version_dir(tdir)
    comp = txn.read_manifest(tdir, os.path.basename(cur))[""]
    assert set(comp["blooms"]) == set(comp["segments"]) and len(
        comp["segments"]
    ) == 3
    spec = comp["reconstruct"]
    # range predicate: stats overlap everywhere -> nothing pruned
    kept = txn._prune_component_paths(tdir, cur, comp, spec, {"id": (40, 45)})
    assert len(kept) == 3
    # equality predicate: only segments whose bloom MAY contain 42
    # survive (42 % 3 == 0 -> epoch-0 segment, plus <=~1% FP others)
    kept = txn._prune_component_paths(tdir, cur, comp, spec, {"id": (42, 42)})
    assert any("upsert_v0" in p for p in kept)
    assert len(kept) <= 2, f"bloom failed to prune: {kept}"
    # end-to-end: the pruned read is exactly the filtered full read
    got = txn.read_version(spark, tdir, predicates={"id": (42, 42)}).collect()
    assert [(r.id, r.v) for r in got] == [(42, 294)]
    # absent key: correct empty result
    assert (
        txn.read_version(spark, tdir, predicates={"id": (301, 301)}).count()
        == 0
    )


# ---------------------------------------------------------------------------
# size-tiered minor compaction


def _overlapping_epochs_table(spark, tmp_path, n_epochs=6, n_buckets=None):
    """n_epochs upsert epochs with OVERLAPPING key windows (epoch e
    covers ids e*5 .. e*5+14, v = epoch so later epochs win), plus a
    tie key (id=100, v=0 every epoch -> tie resolves to the EARLIEST
    epoch) and a tombstone (id=3 deleted in epoch 2)."""
    import time as _time

    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    for e in range(n_epochs):
        rows = [
            (i, e, f"val_{e}_{i}", False) for i in range(e * 5, e * 5 + 15)
        ] + [(100, 0, f"tie_{e}", False)]
        if e == 2:
            rows.append((3, e, None, True))
        df = spark.createDataFrame(
            rows, "id long, v long, val string, is_del boolean"
        )
        df.coalesce(1).write.parquet(os.path.join(src_dir, f"f{e}"))
        _time.sleep(0.05)
    schema = spark.read.parquet(os.path.join(src_dir, "f0")).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src_dir, "*"))
    )
    tdir = str(tmp_path / "target")
    streaming.foreach_batch_upsert_run(
        spark, stream, keys=["id"], order_desc=["v"],
        target_dir=tdir, reset=True, compact_every=100,
        delete_col="is_del", n_buckets=n_buckets, key_blooms=True,
    )
    return tdir


def _comp(tdir):
    cur = txn.current_version_dir(tdir)
    return txn.read_manifest(tdir, os.path.basename(cur))[""]


def test_minor_compaction_preserves_reads(spark, tmp_path):
    tdir = _overlapping_epochs_table(spark, tmp_path)
    before = sorted(
        (r.id, r.v, r.val) for r in txn.read_version(spark, tdir).collect()
    )
    assert len(_comp(tdir)["segments"]) == 6
    assert (100, 0, "tie_0") in before  # tie -> earliest epoch
    assert all(r[0] != 3 for r in before)  # tombstoned

    vdir = txn.compact_component_minor(spark, tdir, max_segments=3)
    assert vdir is not None
    comp = _comp(tdir)
    assert len(comp["segments"]) == 3 and not comp.get("collapsed")
    # newest two delta segments carried verbatim, prefix folded
    assert comp["segments"][1:] == ["upsert_v4", "upsert_v5"]
    assert set(comp["stats"]) == set(comp["segments"])
    assert set(comp["blooms"]) == set(comp["segments"])
    after = sorted(
        (r.id, r.v, r.val) for r in txn.read_version(spark, tdir).collect()
    )
    assert after == before
    # already within bound: no-op
    assert txn.compact_component_minor(spark, tdir, max_segments=3) is None
    # the sink keeps committing on top of the rewritten manifest
    extra = spark.createDataFrame(
        [(0, 99, "resurrect", False), (3, 99, "undeleted", False)],
        "id long, v long, val string, is_del boolean",
    )
    src2 = str(tmp_path / "src2")
    extra.coalesce(1).write.parquet(os.path.join(src2, "f0"))
    schema = extra.schema
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src2, "*"))
    )
    streaming.foreach_batch_upsert_run(
        spark, stream2, keys=["id"], order_desc=["v"],
        target_dir=tdir, reset=False, compact_every=100,
        delete_col="is_del",
    )
    got = {r.id: r.val for r in txn.read_version(spark, tdir).collect()}
    assert got[0] == "resurrect" and got[3] == "undeleted"


def test_minor_compaction_bucketed_stays_exchange_free(spark, tmp_path):
    tdir = _overlapping_epochs_table(spark, tmp_path, n_buckets=4)
    before = sorted(
        (r.id, r.v) for r in txn.read_version(spark, tdir).collect()
    )
    assert txn.compact_component_minor(spark, tdir, max_segments=3)
    comp = _comp(tdir)
    assert len(comp["segments"]) == 3 and not comp.get("collapsed")
    df = txn.read_version(spark, tdir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]
    assert sorted((r.id, r.v) for r in df.collect()) == before


def test_version_row_count_metadata_only(spark, tmp_path):
    """version_row_count answers COUNT(*) from the manifest exactly
    when safe, and refuses (None) when only the fold knows the answer."""
    # merge-on-read table WITHOUT delete_col
    tdir = _disjoint_range_table(spark, tmp_path, compact_every=8)
    # uncompacted MOR: must refuse (raw segment rows ≠ folded rows)
    assert txn.version_row_count(tdir) is None
    txn.compact_component(spark, tdir)
    n_meta = txn.version_row_count(tdir)
    assert n_meta == txn.read_version(spark, tdir).count() == 300
    # tombstoned table: collapsed counts include physical tombstones,
    # so metadata must refuse rather than overcount
    tdir2 = _overlapping_epochs_table(spark, tmp_path / "t2")
    txn.compact_component(spark, tdir2)
    assert txn.version_row_count(tdir2) is None  # delete_col present


def test_version_row_count_append_component(spark, tmp_path):
    """The streaming corpus-dedup sink's append-only components carry
    exact per-segment counts: metadata count == real count."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    docs.limit(60).coalesce(1).write.parquet(os.path.join(src, "f0"))
    docs.limit(120).coalesce(1).write.parquet(os.path.join(src, "f1"))
    schema = spark.read.parquet(os.path.join(src, "f0")).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src, "*"))
    )
    tdir = str(tmp_path / "corpus")
    streaming.streaming_corpus_dedup_run(
        spark, stream, target_dir=tdir, reset=True
    )
    for comp in ("corpus", "fps", "bands"):
        meta = txn.version_row_count(tdir, subdir=comp)
        real = txn.read_version(spark, tdir, subdir=comp).count()
        assert meta == real and meta is not None, (comp, meta, real)


def test_bucketed_point_lookup_reads_one_bucket(spark, tmp_path):
    """A fully-pinned key on a bucketed table reads ONLY its bucket's
    leaf dirs — 1/n of the files — in both the uncompacted fold path
    and the collapsed path, with results identical to filter-after-
    full-read (which also pins the write/read Murmur3 hash agreement,
    including the int-vs-long literal cast)."""
    tdir = _overlapping_epochs_table(spark, tmp_path, n_buckets=8)
    full = txn.read_version(spark, tdir)
    n_full_files = len(full.inputFiles())
    truth = {r.id: (r.v, r.val) for r in full.collect()}
    # every live key resolves through its one bucket (hash agreement)
    for k in sorted(truth):
        df = txn.read_version(spark, tdir, predicates={"id": (k, k)})
        assert len(df.inputFiles()) <= n_full_files // 4, k
        got = [(r.v, r.val) for r in df.collect()]
        assert got == [truth[k]], (k, got)
    # absent key: empty but schema-complete (bucket dir may not exist)
    miss = txn.read_version(spark, tdir, predicates={"id": (9999, 9999)})
    assert miss.count() == 0 and "val" in miss.columns
    # collapsed path: same contract after major compaction
    txn.compact_component(spark, tdir)
    full2 = txn.read_version(spark, tdir)
    n2 = len(full2.inputFiles())
    for k in (0, 14, 100):
        df = txn.read_version(spark, tdir, predicates={"id": (k, k)})
        assert len(df.inputFiles()) < n2, k
        assert [(r.v, r.val) for r in df.collect()] == [truth[k]], k


def test_clustered_compaction_prunes_row_groups(spark, tmp_path):
    """compact_component(sort_cols=...) range-clusters the collapsed
    segment: row-group min/max ranges on the sort column become
    (near-)disjoint, so residual predicates prune row groups inside
    the surviving segment — and the read stays correct."""
    import pyarrow.parquet as pq

    tdir = _disjoint_range_table(spark, tmp_path, compact_every=8)
    txn.compact_component(spark, tdir, sort_cols=["v"], sort_files=6)
    comp = _comp(tdir)
    assert comp.get("collapsed") and len(comp["segments"]) == 1
    sdir = txn.segment_path(tdir, comp["segments"][0])
    ranges = []
    for dirpath, _dirs, files in os.walk(sdir):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(dirpath, fname)).metadata
            idx = next(
                i
                for i in range(md.row_group(0).num_columns)
                if md.row_group(0).column(i).path_in_schema == "v"
            )
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                ranges.append((st.min, st.max))
    assert len(ranges) >= 2, "expected multiple clustered row groups"
    ranges.sort()
    for (_lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping row-group ranges {ranges}"
    # predicate read over the clustered segment still exact
    got = txn.read_version(spark, tdir, predicates={"v": (500, 1500)})
    assert sorted(r.id for r in got.collect()) == list(range(50, 151))


def test_table_info_metadata_only(spark, tmp_path):
    """table_info reads pointer + manifests + os.stat only, and its
    facts agree with the live table."""
    tdir = _interleaved_key_table(spark, tmp_path)
    info = txn.table_info(tdir)
    comp = info["components"][""]
    assert info["format"] == "manifest"
    assert comp["n_segments"] == 3 and not comp["collapsed"]
    assert comp["merge_keys"] == ["id"] and comp["has_stats"]
    assert comp["has_blooms"]  # key_blooms=True table
    assert comp["exact_row_count"] is None  # uncompacted MOR: refuses
    assert comp["bytes"] > 0 and len(comp["bytes_per_segment"]) == 3
    assert sum(comp["rows_recorded"].values()) == 300  # 3 epochs x 100 raw
    txn.compact_component(spark, tdir)
    info2 = txn.table_info(tdir)
    comp2 = info2["components"][""]
    assert comp2["collapsed"] and comp2["exact_row_count"] == 300


# --------------------------------------------------------- restore + cursor


def _three_epoch_table(spark, tmp_path, keep_last=4):
    """A segmented table with three batch MERGE epochs on key `id`:
    epoch 0 = ids 0..9 (v=0), epoch 1 = ids 5..14 (v=1), epoch 2 =
    ids 10..19 (v=2). Later epochs win overlapping keys."""
    tdir = str(tmp_path / "rtbl")
    for e, lo in enumerate([0, 5, 10]):
        df = spark.createDataFrame(
            [(i, e, f"e{e}_{i}") for i in range(lo, lo + 10)],
            "id long, v long, val string",
        )
        streaming.batch_upsert_commit(
            spark, df, ["id"], ["v"], tdir, keep_last=keep_last
        )
    return tdir


def test_restore_version_metadata_only(spark, tmp_path):
    """RESTORE to a retained epoch equals that epoch's snapshot, moves
    only the pointer (no new segment directories), and keeps the rolled-
    back versions time-travelable."""
    tdir = _three_epoch_table(spark, tmp_path)
    want = {
        (r.id, r.v, r.val)
        for r in txn.read_version(spark, tdir, "data_v1").collect()
    }
    seg_root = os.path.join(tdir, txn.SEGMENTS_DIR)
    segs_before = sorted(os.listdir(seg_root))
    committed = txn.restore_version(tdir, "data_v1")
    assert sorted(os.listdir(seg_root)) == segs_before  # metadata-only
    got = {(r.id, r.v, r.val) for r in txn.read_version(spark, tdir).collect()}
    assert got == want
    # the botched head stays retained for forensics
    assert "data_v2" in txn.list_versions(tdir)
    head = txn.read_version(spark, tdir, "data_v2")
    assert head.filter(F.col("id") >= 15).count() == 5
    assert os.path.basename(committed) == txn.list_versions(tdir)[0]


def test_restore_noop_when_already_current(spark, tmp_path):
    tdir = _three_epoch_table(spark, tmp_path)
    cur = txn.current_version_dir(tdir)
    assert txn.restore_version(tdir, "data_v2") == cur
    assert txn.current_version_dir(tdir) == cur


def test_restore_unretained_version_raises(spark, tmp_path):
    tdir = _three_epoch_table(spark, tmp_path, keep_last=1)
    import pytest

    with pytest.raises(KeyError):
        txn.restore_version(tdir, "data_v0")


def test_restore_plain_version_copies(spark, tmp_path):
    """Plain (pre-manifest) parquet versions restore by file copy."""
    root = str(tmp_path / "plain")
    os.makedirs(root)
    df0 = spark.range(5).withColumnRenamed("id", "k")
    df0.write.parquet(os.path.join(root, "data_v0"))
    txn.publish_version(root, "data_v0", keep_last=3)
    spark.range(9).withColumnRenamed("id", "k").write.parquet(
        os.path.join(root, "data_v1")
    )
    txn.publish_version(root, "data_v1", keep_last=3)
    txn.restore_version(root, 0)
    assert txn.read_version(spark, root).count() == 5


def test_restore_then_new_commit_advances_epoch(spark, tmp_path):
    """A MERGE after a restore lands above every prior epoch and folds
    against the RESTORED state (rolled-back epoch 2 rows stay gone
    unless re-upserted)."""
    tdir = _three_epoch_table(spark, tmp_path)
    txn.restore_version(tdir, "data_v1")
    df = spark.createDataFrame(
        [(14, 9, "new_14"), (30, 9, "new_30")], "id long, v long, val string"
    )
    vname = streaming.batch_upsert_commit(spark, df, ["id"], ["v"], tdir, keep_last=6)
    assert vname == "data_v3"  # above the retained (rolled-back) epoch 2
    got = {r.id: r.val for r in txn.read_version(spark, tdir).collect()}
    assert got[30] == "new_30" and got[14] == "new_14"
    assert 19 not in got  # epoch-2-only key stays rolled back


def test_poll_changes_cursor_lifecycle(spark, tmp_path):
    """poll → ack → poll consumes each epoch exactly once; an unacked
    poll re-delivers (at-least-once); a drained cursor polls empty."""
    tdir = str(tmp_path / "ctbl")
    cursor = str(tmp_path / "cursor.json")
    for e, lo in enumerate([0, 5]):
        df = spark.createDataFrame(
            [(i, e, f"e{e}_{i}") for i in range(lo, lo + 10)],
            "id long, v long, val string",
        )
        streaming.batch_upsert_commit(spark, df, ["id"], ["v"], tdir, keep_last=6)
    df1, hi1 = txn.poll_changes(spark, tdir, cursor)
    assert hi1 == 1 and df1.count() == 20  # fresh cursor: full window
    # crash before ack: the same window re-delivers
    df1b, hi1b = txn.poll_changes(spark, tdir, cursor)
    assert hi1b == 1 and df1b.count() == 20
    txn.ack_cursor(cursor, hi1)
    df2, hi2 = txn.poll_changes(spark, tdir, cursor)
    assert hi2 == 1 and df2.count() == 0  # drained, schema intact
    assert set(df2.columns) == set(df1.columns)
    third = spark.createDataFrame(
        [(i, 2, f"e2_{i}") for i in range(10, 15)], "id long, v long, val string"
    )
    streaming.batch_upsert_commit(spark, third, ["id"], ["v"], tdir, keep_last=6)
    df3, hi3 = txn.poll_changes(spark, tdir, cursor)
    assert hi3 == 2 and df3.count() == 5  # ONLY the new epoch
    assert {r.id for r in df3.collect()} == set(range(10, 15))
    txn.ack_cursor(cursor, hi3)


def test_feeds_complete_across_burned_epoch(spark, tmp_path):
    """Round-10 adjudication of the multiwriter retention finding: a
    writer that claims an epoch but loses the publish race BURNS the
    number (its rows/segments were already stamped with it), so the
    retained numeric tail has gaps — [.., 1, 3] here — with zero data
    loss. Feeds must stay complete and quiet across the gap (the old
    hi-lo commit arithmetic raised a false 'versions were vacuumed'
    KeyError), and time travel to the burned number must explain
    itself instead of looking like corruption."""
    import pytest

    tdir = str(tmp_path / "btbl")
    cursor = str(tmp_path / "cursor.json")
    for e in range(2):
        df = spark.createDataFrame(
            [(i, e, f"e{e}_{i}") for i in range(5)],
            "id long, v long, val string",
        )
        streaming.batch_upsert_commit(spark, df, ["id"], ["v"], tdir, keep_last=6)
    # a competitor claims epoch 2 (exclusive mkdir) and dies before
    # publishing — exactly what a lost CAS race leaves behind
    os.makedirs(os.path.join(tdir, "data_v2"))
    third = spark.createDataFrame(
        [(i, 3, f"e3_{i}") for i in range(5, 8)], "id long, v long, val string"
    )
    streaming.batch_upsert_commit(spark, third, ["id"], ["v"], tdir, keep_last=6)
    numeric = [
        e
        for n in txn.list_versions(tdir)
        if (e := txn._numeric_epoch(n)) is not None
    ]
    assert numeric == [3, 1, 0], numeric  # 2 burned, never published
    # fresh cursor: the whole window, hi is the real max epoch
    df1, hi1 = txn.poll_changes(spark, tdir, cursor)
    assert hi1 == 3 and df1.count() == 13
    # cursor acked mid-chain, feed crosses the burned number silently
    txn.ack_cursor(cursor, 1)
    df2, hi2 = txn.poll_changes(spark, tdir, cursor)
    assert hi2 == 3
    assert {r.id for r in df2.collect()} == {5, 6, 7}
    # change_feed across the gap delivers exactly the committed epochs
    feed = txn.change_feed(spark, tdir, from_version=0)
    assert {r["__sg_seq"] for r in feed.collect()} == {1, 3}
    # time travel to the burned number: loud, and names the cause
    with pytest.raises(KeyError, match="never committed"):
        txn.version_dir(tdir, 2)


def test_poll_changes_behind_retention_raises(spark, tmp_path):
    """A cursor that fell behind the sink's retention must fail loudly,
    never deliver a silently-partial feed."""
    import pytest

    tdir = str(tmp_path / "gtbl")
    cursor = str(tmp_path / "cursor.json")
    # keep_last=1: only the newest version (and its changes) retained
    for e in range(3):
        df = spark.createDataFrame(
            [(i, e, f"e{e}_{i}") for i in range(5)], "id long, v long, val string"
        )
        streaming.batch_upsert_commit(spark, df, ["id"], ["v"], tdir, keep_last=1)
    txn.ack_cursor(cursor, 0)
    with pytest.raises(KeyError, match="retention"):
        txn.poll_changes(spark, tdir, cursor)


def test_poll_changes_cursor_ahead_raises(spark, tmp_path):
    import pytest

    tdir = str(tmp_path / "atbl")
    cursor = str(tmp_path / "cursor.json")
    df = spark.createDataFrame([(1, 0, "a")], "id long, v long, val string")
    streaming.batch_upsert_commit(spark, df, ["id"], ["v"], tdir)
    txn.ack_cursor(cursor, 99)
    with pytest.raises(ValueError, match="restored"):
        txn.poll_changes(spark, tdir, cursor)


def test_restore_invisible_to_cursor(spark, tmp_path):
    """A restore is a rewrite, not a change: a drained cursor stays
    drained across it, and the next real MERGE epoch is delivered."""
    tdir = _three_epoch_table(spark, tmp_path)
    cursor = str(tmp_path / "cursor.json")
    _df, hi = txn.poll_changes(spark, tdir, cursor)
    txn.ack_cursor(cursor, hi)
    txn.restore_version(tdir, "data_v1")
    df, hi2 = txn.poll_changes(spark, tdir, cursor)
    assert hi2 == hi and df.count() == 0
    nxt = spark.createDataFrame([(50, 9, "x")], "id long, v long, val string")
    streaming.batch_upsert_commit(spark, nxt, ["id"], ["v"], tdir, keep_last=8)
    df2, hi3 = txn.poll_changes(spark, tdir, cursor)
    assert hi3 == 3 and df2.count() == 1


def test_replicate_changes_follows_source(spark, tmp_path):
    """CDC replication: after every acked poll the replica's
    merge-on-read state equals the source's — upserts, overlapping
    keys, order regressions, and tombstone deletes included."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    cursor = str(tmp_path / "cursor.json")

    def commit(rows):
        df = spark.createDataFrame(
            rows, "id long, v long, val string, is_del boolean"
        )
        streaming.batch_upsert_commit(
            spark, df, ["id"], ["v"], src, delete_col="is_del", keep_last=8
        )

    def snap(root):
        return {
            (r.id, r.v, r.val)
            for r in txn.read_version(spark, root).collect()
        }

    commit([(1, 10, "a", False), (2, 10, "b", False), (3, 10, "c", False)])
    commit([(2, 20, "b2", False), (4, 20, "d", False)])
    hi = streaming.replicate_changes(spark, src, dst, cursor)
    assert hi == 1
    assert snap(dst) == snap(src)
    # epoch 2: delete key 3, stale write for key 2 (order regression),
    # new key 5 — then replicate the single epoch
    commit([(3, 30, None, True), (2, 5, "stale", False), (5, 30, "e", False)])
    hi = streaming.replicate_changes(spark, src, dst, cursor)
    assert hi == 2
    got = snap(dst)
    assert got == snap(src)
    assert 3 not in {t[0] for t in got}  # delete replicated
    assert ("2", ) not in got and dict((t[0], t[2]) for t in got)[2] == "b2"
    # drained poll: no destination epoch spent
    before = txn.list_versions(dst)
    assert streaming.replicate_changes(spark, src, dst, cursor) == 2
    assert txn.list_versions(dst) == before


def test_replicate_changes_crash_before_ack_idempotent(spark, tmp_path):
    """A crash between the replica MERGE and the ack re-applies the
    same poll; the destination fold makes the redelivery a no-op."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    cursor = str(tmp_path / "cursor.json")
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "id long, v long, val string"
    )
    streaming.batch_upsert_commit(spark, df, ["id"], ["v"], src, keep_last=8)
    streaming.replicate_changes(spark, src, dst, cursor)
    want = {(r.id, r.v, r.val) for r in txn.read_version(spark, dst).collect()}
    # simulate the crash: rewind the cursor as if ack never happened
    os.remove(cursor)
    streaming.replicate_changes(spark, src, dst, cursor)
    got = {(r.id, r.v, r.val) for r in txn.read_version(spark, dst).collect()}
    assert got == want


def test_vacuum_dry_run_lists_without_deleting(spark, tmp_path):
    """vacuum(dry_run=True) reports exactly what a real vacuum would
    reclaim — and reclaims nothing; the real run then removes exactly
    that list."""
    tdir = _three_epoch_table(spark, tmp_path, keep_last=1)
    # keep_last=1 already GC'd epochs 0-1's versions; age a fake
    # orphan version dir + orphan segment past any grace window
    orphan_v = os.path.join(tdir, "data_v99")
    os.makedirs(orphan_v)
    orphan_s = txn.segment_path(tdir, "upsert_v99")
    os.makedirs(orphan_s)
    old = 1_000_000_000  # well before any grace window
    os.utime(orphan_v, (old, old))
    os.utime(orphan_s, (old, old))
    would = txn.vacuum(tdir, grace_seconds=3600.0, dry_run=True)
    assert set(would) == {"data_v99", os.path.join("segments", "upsert_v99")}
    assert os.path.isdir(orphan_v) and os.path.isdir(orphan_s)  # untouched
    done = txn.vacuum(tdir, grace_seconds=3600.0)
    assert set(done) == set(would)
    assert not os.path.exists(orphan_v) and not os.path.exists(orphan_s)
    # the live table is intact
    assert txn.read_version(spark, tdir).count() > 0


def test_replicate_changes_schema_evolution(spark, tmp_path):
    """A source epoch that adds a NEW column replicates cleanly: the
    replica surfaces the column, with NULL for pre-evolution keys."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    cursor = str(tmp_path / "cursor.json")
    b0 = spark.createDataFrame([(1, 10, "a")], "id long, v long, val string")
    streaming.batch_upsert_commit(spark, b0, ["id"], ["v"], src, keep_last=8)
    b1 = spark.createDataFrame(
        [(2, 20, "b", "extra")], "id long, v long, val string, note string"
    )
    streaming.batch_upsert_commit(spark, b1, ["id"], ["v"], src, keep_last=8)
    streaming.replicate_changes(spark, src, dst, cursor)
    got = {r.id: (r.val, r.note) for r in txn.read_version(spark, dst).collect()}
    assert got == {1: ("a", None), 2: ("b", "extra")}


def test_vacuum_dry_run_includes_stale_pointer_tmp(spark, tmp_path):
    """Round-6 ADVICE (low): a stale CURRENT.tmp from a crashed pointer
    write is reclaimed by a real vacuum, so the dry run must LIST it —
    dry-run output is 'exactly what a real vacuum would reclaim'."""
    tdir = _three_epoch_table(spark, tmp_path, keep_last=1)
    stale = os.path.join(tdir, txn.CURRENT + ".tmp")
    with open(stale, "w") as f:
        f.write("data_v99")
    would = txn.vacuum(tdir, grace_seconds=3600.0, dry_run=True)
    assert txn.CURRENT + ".tmp" in would
    assert os.path.exists(stale)  # dry run reclaims nothing
    done = txn.vacuum(tdir, grace_seconds=3600.0)
    assert set(done) == set(would)
    assert not os.path.exists(stale)


def test_drained_poll_schema_matches_nonempty_poll(spark, tmp_path):
    """Round-6 ADVICE (low): a drained poll must carry the FEED schema
    (incl. the __sg_seq epoch column and tombstone flag) even when the
    component is base-only/compacted — consumers select the seq column
    unconditionally (change_feed_cursor does) and a schema that
    flip-flops between polls would crash them."""
    from cultural_heritage_bigdata_project_spark.streaming import (
        pipelines as streaming,
    )

    root = str(tmp_path / "t")
    cursor = str(tmp_path / "c.json")
    df = spark.createDataFrame(
        [(1, 1, "a", False)], "k long, seq long, v string, is_del boolean"
    )
    streaming.batch_upsert_commit(
        spark, df, keys=["k"], order_desc=["seq"], target_dir=root,
        delete_col="is_del", compact_every=0,  # roll to a collapsed base
    )
    poll, hi = txn.poll_changes(spark, root, cursor)
    nonempty_cols = set(poll.columns)
    assert "__sg_seq" in nonempty_cols and "is_del" in nonempty_cols
    txn.ack_cursor(cursor, hi)
    drained, hi2 = txn.poll_changes(spark, root, cursor)
    assert hi2 == hi
    assert drained.count() == 0
    assert set(drained.columns) == nonempty_cols
    # and change_feed's drained path shares the schema too
    feed = txn.change_feed(spark, root, hi, hi)
    assert set(feed.columns) == nonempty_cols


def test_hand_edited_pointer_fails_feed_reads(spark, tmp_path):
    """_check_numeric_chain (round 10): the chain-suffix invariant
    feeds rely on is validated, not assumed — a pointer whose numeric
    epochs are out of publish order (only possible by editing CURRENT
    by hand) makes change_feed/poll_changes refuse instead of
    guessing which commits are missing."""
    import pytest

    tdir = str(tmp_path / "htbl")
    for e in range(3):
        df = spark.createDataFrame(
            [(i, e, f"e{e}_{i}") for i in range(3)],
            "id long, v long, val string",
        )
        streaming.batch_upsert_commit(spark, df, ["id"], ["v"], tdir, keep_last=6)
    cur = os.path.join(tdir, "CURRENT")
    with open(cur, encoding="utf-8") as f:
        names = f.read().splitlines()
    with open(cur, "w", encoding="utf-8") as f:
        f.write("\n".join(reversed(names)))  # oldest-first: out of order
    with pytest.raises(RuntimeError, match="publish order"):
        txn.change_feed(spark, tdir, from_version=0)
    with pytest.raises(RuntimeError, match="publish order"):
        txn.poll_changes(spark, tdir, str(tmp_path / "c.json"))


def test_target_bucket_is_job_free_and_matches_job_path(spark, tmp_path):
    """_target_bucket must evaluate over a LocalRelation (zero Spark
    jobs) and pick the same bucket the writer's bucket_expr assigned,
    for long, string, and multi-key shapes."""
    import os

    p = os.path.join(str(tmp_path), "seg")
    df = spark.range(50).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), F.col("id").cast("string")).alias("g"),
        F.lit(1).alias("v"),
    )
    df.write.parquet(p)

    def jobs_count():
        return spark._jsc.sc().statusStore().jobsList(None).size()

    for keys, vals in [
        (["k"], {"k": 17}),
        (["g"], {"g": "g17"}),
        (["k", "g"], {"k": 3, "g": "g3"}),
    ]:
        spec = {"keys": keys, "buckets": 8}
        before = jobs_count()
        got = txn._target_bucket(spark, p, spec, vals)
        assert jobs_count() == before, "bucket eval launched a Spark job"
        expect = (
            spark.range(1)
            .select(
                *[
                    F.lit(vals[k]).cast(dict(k="bigint", g="string")[k]).alias(k)
                    for k in keys
                ]
            )
            .select(txn.bucket_expr(keys, 8).alias("b"))
            .first()["b"]
        )
        assert got == int(expect), (keys, vals, got, expect)

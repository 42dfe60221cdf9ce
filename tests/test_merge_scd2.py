"""SCD Type 2 merge semantics: change capture, history preservation,
idempotency — validated on hand-built snapshots."""

from __future__ import annotations

from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import merge

SCHEMA = "k long, attr string, valid_from long, valid_to long, is_current boolean"


def _apply(spark, target_rows, source_rows):
    target = spark.createDataFrame(target_rows, SCHEMA)
    source = spark.createDataFrame(source_rows, "k long, attr string, ts long")
    return merge.scd2_apply(
        target, source, keys=["k"], change_cols=["attr"], ts_col="ts"
    )


def test_scd2_change_capture_and_history(spark):
    target = [
        (1, "a", 0, None, True),     # will change
        (2, "b", 0, None, True),     # identical in source -> untouched
        (3, "c", 0, None, True),     # absent from source -> untouched
        (1, "old", -5, 0, False),    # history row -> untouched
    ]
    source = [
        (1, "a2", 100, ),
        (2, "b", 100),
        (4, "d", 100),               # brand-new key
    ]
    got = {
        (r.k, r.attr): (r.valid_from, r.valid_to, r.is_current)
        for r in _apply(spark, target, source).collect()
    }
    assert got == {
        (1, "old"): (-5, 0, False),      # history preserved
        (1, "a"): (0, 100, False),       # closed at source ts
        (1, "a2"): (100, None, True),    # new current version
        (2, "b"): (0, None, True),       # unchanged
        (3, "c"): (0, None, True),       # untouched (no delete)
        (4, "d"): (100, None, True),     # inserted
    }


def test_scd2_idempotent(spark):
    target = [(1, "a", 0, None, True), (2, "b", 0, None, True)]
    source = [(1, "a2", 50), (3, "c", 50)]
    once = _apply(spark, target, source)
    twice = merge.scd2_apply(
        once,
        once.sparkSession.createDataFrame(source, "k long, attr string, ts long"),
        keys=["k"],
        change_cols=["attr"],
        ts_col="ts",
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_null_safe_change_detection(spark):
    """NULL -> value and value -> NULL are changes; NULL -> NULL is not."""
    target = [(1, None, 0, None, True), (2, None, 0, None, True)]
    source = [(1, "x", 10), (2, None, 10)]
    got = {
        (r.k, r.attr): r.is_current for r in _apply(spark, target, source).collect()
    }
    assert got == {
        (1, None): False,  # closed
        (1, "x"): True,
        (2, None): True,   # unchanged single version
    }


def test_scd2_rejects_duplicate_source_keys(spark):
    import pytest

    target = [(1, "a", 0, None, True)]
    source = [(1, "x", 10), (1, "y", 10)]
    with pytest.raises(ValueError, match="duplicate"):
        _apply(spark, target, source)


def test_scd2_guards(spark):
    import pytest

    target = spark.createDataFrame([(1, "a", 0, None, True)], SCHEMA)
    source = spark.createDataFrame([(1, "b", 10)], "k long, attr string, ts long")
    # empty change_cols would silently drop matched rows — must raise
    with pytest.raises(ValueError, match="at least one change column"):
        merge.scd2_apply(target, source, keys=["k"], change_cols=[], ts_col="ts")
    # untracked target columns would silently vanish — must raise
    t2 = target.withColumn("untracked", F.lit("x"))
    with pytest.raises(ValueError, match="untracked"):
        merge.scd2_apply(t2, source, keys=["k"], change_cols=["attr"], ts_col="ts")


def test_scd2_null_ts_raises_by_default(spark):
    """A NULL source ts on a changed/new key corrupts interval
    semantics (valid_to=NULL on a CLOSED row reads as an open
    interval) — the default must raise, not silently write it
    (round-3 advice)."""
    import pytest

    target = spark.createDataFrame([(1, "a", 0, None, True)], SCHEMA)
    source = spark.createDataFrame(
        [(1, "changed", None)], "k long, attr string, ts long"
    )
    with pytest.raises(ValueError, match="NULL source"):
        merge.scd2_apply(
            target, source, keys=["k"], change_cols=["attr"], ts_col="ts"
        )
    # a NULL ts on an UNCHANGED key writes nothing — no raise
    same = spark.createDataFrame([(1, "a", None)], "k long, attr string, ts long")
    out = merge.scd2_apply(
        target, same, keys=["k"], change_cols=["attr"], ts_col="ts"
    )
    assert [(r.k, r.attr, r.is_current) for r in out.collect()] == [(1, "a", True)]


def test_scd2_null_ts_and_null_is_current(spark):
    """With the guard opted out, a NULL source ts must not read as
    row-absence (presence markers, not ts IS NOT NULL), and NULL
    is_current rows route to history — never silently dropped."""
    target = spark.createDataFrame(
        [(1, "a", 0, None, True), (9, "ghost", 0, None, None)], SCHEMA
    )
    source = spark.createDataFrame(
        [(1, "changed", None)], "k long, attr string, ts long"
    )
    out = merge.scd2_apply(
        target, source, keys=["k"], change_cols=["attr"], ts_col="ts",
        check_ts=False,
    )
    rows = {(r.k, r.attr): (r.valid_to, r.is_current) for r in out.collect()}
    # the change IS captured (NULL ts means an unknown close time, not absence)
    assert (1, "changed") in rows and rows[(1, "changed")][1] is True
    assert (1, "a") in rows and rows[(1, "a")][1] is False
    # NULL-is_current row preserved as history
    assert (9, "ghost") in rows


def test_scd2_check_order_rejects_stale_snapshot(spark):
    import pytest

    target = spark.createDataFrame([(1, "v2", 100, None, True)], SCHEMA)
    stale = spark.createDataFrame([(1, "v1", 50)], "k long, attr string, ts long")
    with pytest.raises(ValueError, match="out-of-order"):
        merge.scd2_apply(
            target, stale, keys=["k"], change_cols=["attr"], ts_col="ts",
            check_order=True,
        )


def test_streaming_scd2_matches_batch_history(spark, tmp_path):
    """Two time-ordered micro-batches of a changing dimension must
    produce: current rows = each key's latest value, closed rows for
    every key whose value changed between the two snapshots, and a
    readable previous version under keep_last=2."""
    import os
    import time as _time

    from cultural_heritage_bigdata_project_spark import streaming
    from cultural_heritage_bigdata_project_spark.operators import txn

    # snapshot 0: keys 0..9 value "v0"; snapshot 1 (later ts): keys
    # 0..4 change to "v1", keys 5..7 resent unchanged, 8..9 absent,
    # key 10 is new
    snap0 = [(k, "v0", 100) for k in range(10)]
    snap1 = (
        [(k, "v1", 200) for k in range(5)]
        + [(k, "v0", 200) for k in range(5, 8)]
        + [(10, "v1", 200)]
    )
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate([snap0, snap1]):
        df = spark.createDataFrame(rows, "k long, attr string, ts_us long")
        pdir = str(tmp_path / f"p{i}")
        df.coalesce(1).write.mode("overwrite").parquet(pdir)
        pf = next(f for f in os.listdir(pdir) if f.endswith(".parquet"))
        os.replace(os.path.join(pdir, pf), str(src / f"f{i}.parquet"))
        _time.sleep(1.1)
    reader = spark.readStream.schema("k long, attr string, ts_us long").option(
        "maxFilesPerTrigger", 1
    )
    stream = reader.parquet(str(src))
    tbl = str(tmp_path / "dim")
    final = streaming.foreach_batch_scd2_run(
        spark,
        stream,
        keys=["k"],
        change_cols=["attr"],
        ts_col="ts_us",
        target_dir=tbl,
        keep_last=2,
    )
    rows = {(r.k, r.attr, r.is_current): (r.valid_from, r.valid_to) for r in final.collect()}
    # changed keys: closed v0 + current v1
    for k in range(5):
        assert rows[(k, "v0", False)] == (100, 200)
        assert rows[(k, "v1", True)] == (200, None)
    # unchanged / absent keys: single open version from snapshot 0
    for k in range(5, 10):
        assert rows[(k, "v0", True)] == (100, None)
    # new key
    assert rows[(10, "v1", True)] == (200, None)
    assert len(rows) == 5 * 2 + 5 + 1
    # time travel: the pre-change snapshot is retained and has no history
    versions = txn.list_versions(tbl)
    assert len(versions) == 2
    prev = txn.read_version(spark, tbl, versions[1])
    assert prev.filter(~prev.is_current).count() == 0
    assert prev.count() == 10

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

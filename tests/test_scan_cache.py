"""Splittable-layout scan cache (sources/scan_cache.py), WIRED through
load_table this round (round-6 ADVICE medium: the module shipped dead —
splittable_path was never called, so the promised first-stage
parallelization never took effect). Pins: the wiring exists, the
conversion is a semantic no-op (values, schema, row count), parallelism
actually rises for big single-file fixtures, small tables pass through,
and the opt-out env var works."""

from __future__ import annotations

import os

import pytest

from cultural_heritage_bigdata_project_spark.sources import scan_cache
from cultural_heritage_bigdata_project_spark.sources.tables import load_table

from .conftest import SF_DIR

SF01 = "/root/testdata/sf0.01"


def test_load_table_routes_through_scan_cache(spark, monkeypatch):
    seen = []
    real = scan_cache.splittable_path

    def spy(src):
        out = real(src)
        seen.append((src, out))
        return out

    monkeypatch.setattr(scan_cache, "splittable_path", spy)
    load_table(spark, SF_DIR, "region")
    assert seen and seen[0][0].endswith("region.parquet")


def test_conversion_is_semantic_noop_and_splits(spark):
    """lineitem at sf0.01 (~60k rows, one file, one row group) must
    convert: same rows/values, more input files => more scan tasks."""
    src = f"{SF01}/lineitem.parquet"
    out = scan_cache.splittable_path(src)
    assert out != src, "a 60k-row single-file table should convert"
    assert os.path.isdir(out)
    n_files = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_files > 1
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert a.schema == b.schema
    assert a.count() == b.count()
    # order-insensitive full-content equality via a cheap digest
    from pyspark.sql import functions as F

    def dig(df):
        h40 = (
            F.conv(F.substring(F.md5(F.to_json(F.struct(*sorted(df.columns)))), 1, 15), 16, 10)
            .cast("long")
            .bitwiseAND(F.lit((1 << 40) - 1))
        )
        return (
            df.select(h40.alias("h"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("h").alias("s"))
            .first()
        )

    assert dig(a) == dig(b)


def test_small_table_passes_through():
    src = f"{SF_DIR}/region.parquet"
    assert scan_cache.splittable_path(src) == src


def test_opt_out_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_SCAN_CACHE", "1")
    src = f"{SF01}/lineitem.parquet"
    assert scan_cache.splittable_path(src) == src


def test_cache_key_tracks_mtime(tmp_path):
    """A regenerated fixture (new mtime/size) must invalidate: the two
    cache paths differ."""
    import shutil

    src = tmp_path / "t.parquet"
    shutil.copyfile(f"{SF01}/lineitem.parquet", src)
    p1 = scan_cache.splittable_path(str(src))
    os.utime(src, (1_700_000_000, 1_700_000_000))
    p2 = scan_cache.splittable_path(str(src))
    assert p1 != p2

"""Digest-bundle gate: the folded catalog fits the driver's 50-slot
check window, the generated column specs match live query schemas, and
every bundle's Spark digest matches its DuckDB oracle digest exactly
(the bundle inherits the full per-value strictness of the member
queries — one flipped value anywhere flips a 40-bit hash sum)."""

from __future__ import annotations

import pytest

from cultural_heritage_bigdata_project_spark.plans.catalog import (
    CATALOG,
    CATALOG_ORDER,
    DRIVER_SLOT_CAP,
    catalog_entries,
)
from cultural_heritage_bigdata_project_spark.plans import digests

from . import parity
from .conftest import SF_DIR


def test_catalog_fits_driver_window():
    entries = catalog_entries()
    assert list(entries) == list(CATALOG_ORDER)
    assert len(entries) <= DRIVER_SLOT_CAP
    # every raw catalog query is either public or folded into a bundle
    public = set(CATALOG_ORDER)
    folded = set(digests.GROUPED_PARTS)
    assert set(CATALOG) == (public - set(digests.GROUPS)) | folded


def test_part_cols_match_live_schema(spark):
    """PART_COLS is generated; drift between it and the real query
    schemas must fail loudly, not silently hash-mismatch."""
    for part, spec in digests.PART_COLS.items():
        df = CATALOG[part].fn(spark, SF_DIR)
        live = sorted((f.name, f.dataType.simpleString()) for f in df.schema.fields)
        expect = sorted(spec)
        assert [n for n, _ in live] == [n for n, _ in expect], (
            f"{part}: columns drifted: {live} vs spec {expect}"
        )
        for (name, dtype), (_, kind) in zip(live, expect):
            want_kind = "f" if dtype in ("double", "float") else "s"
            assert kind == want_kind, (
                f"{part}.{name}: dtype {dtype} needs kind {want_kind!r}, spec has {kind!r}"
            )
            assert dtype in ("double", "float", "string", "int", "bigint", "boolean"), (
                f"{part}.{name}: unsupported digest dtype {dtype}"
            )


@pytest.mark.parametrize("group", sorted(digests.GROUPS))
def test_digest_parity(group, spark, duck):
    entry = catalog_entries()[group]
    spdf = entry.fn(spark, SF_DIR).toPandas()
    opdf = duck.execute(entry.oracle).df()
    parity.compare(spdf, opdf, name=group)
    assert len(spdf) == len(digests.GROUPS[group])
    assert (spdf["n_rows"] > 0).all(), f"{group}: a member returned no rows"


def test_float_serialization_parity_adversarial(spark, duck):
    """The digest serializer's trunc(x*1e6) must agree between engines
    on the risky value classes: exact 6-decimal values (product lands
    next to an integer), halfway values, negatives, -0.0, large
    magnitudes, NULL."""
    import pandas as pd
    from pyspark.sql import functions as F
    from cultural_heritage_bigdata_project_spark.plans import digests

    vals = [
        0.0, -0.0, 1.5, -1.5, 0.1, -0.1, 1234.56, -1234.56,
        0.0000005, -0.0000005, 25.5286, 311582.535, -311582.535,
        8.9e12, -8.9e12, 1e-7, 123456789.123456, None,
        2.0 / 3.0, -2.0 / 3.0, 0.3000003, 1.0000005,
    ]
    sdf = spark.createDataFrame(pd.DataFrame({"v": pd.array(vals, dtype="float64")}))
    ser = sdf.select(
        F.coalesce(
            (F.col("v").cast("double") * F.lit(1000000.0)).cast("long").cast("string"),
            F.lit(digests.NUL),
        ).alias("s")
    )
    got_spark = [r.s for r in ser.collect()]
    got_duck = []
    for v in vals:
        lit = "NULL" if v is None else repr(v)
        (res,) = duck.execute(
            f"SELECT coalesce(cast(cast(trunc(cast({lit} AS DOUBLE) * 1000000.0)"
            f" AS BIGINT) AS VARCHAR), chr(30))"
        ).fetchone()
        got_duck.append(res)
    assert got_spark == got_duck, list(zip(vals, got_spark, got_duck))

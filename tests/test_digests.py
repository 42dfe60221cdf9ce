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

    import math

    vals = [
        0.0, -0.0, 1.5, -1.5, 0.1, -0.1, 1234.56, -1234.56,
        0.0000005, -0.0000005, 25.5286, 311582.535, -311582.535,
        8.9e12, -8.9e12, 1e-7, 123456789.123456, None,
        2.0 / 3.0, -2.0 / 3.0, 0.3000003, 1.0000005,
        # truncation-boundary stradlers (round-2 advice): one ulp either
        # side of values whose ×1e6 product sits next to an integer — a
        # rounding (instead of truncating) engine flips these by 1
        2.35, math.nextafter(2.35, 0.0), math.nextafter(2.35, 10.0),
        -2.35, math.nextafter(-2.35, 0.0), math.nextafter(-2.35, -10.0),
        2.675, math.nextafter(1.0, 0.0), math.nextafter(1.0, 2.0),
        # ulp(x*1e6) = 2 territory: the integer grid is coarser than 1
        9007199254.740992, math.nextafter(9007199254.740992, 0.0),
    ]
    # feed both engines bit-identical doubles through columns (the
    # production path). NOT through SQL literals: DuckDB parses a
    # 16-digit literal as DECIMAL(17,16) and constant-folds the product
    # in decimal, which rounds differently — a test-methodology trap,
    # not an engine divergence (columns from parquet never hit it).
    pdf = pd.DataFrame(
        {"i": range(len(vals)), "v": pd.array(vals, dtype="float64")}
    )
    sdf = spark.createDataFrame(pdf)
    ser = sdf.select(
        "i",
        F.coalesce(
            (F.col("v").cast("double") * F.lit(1000000.0)).cast("long").cast("string"),
            F.lit(digests.NUL),
        ).alias("s"),
    )
    got_spark = [r.s for r in ser.orderBy("i").collect()]
    duck.register("__ser_vals", pdf)
    got_duck = [
        r[0]
        for r in duck.execute(
            "SELECT coalesce(cast(cast(trunc(cast(v AS DOUBLE) * 1000000.0)"
            " AS BIGINT) AS VARCHAR), chr(30)) FROM __ser_vals ORDER BY i"
        ).fetchall()
    ]
    duck.unregister("__ser_vals")
    assert got_spark == got_duck, list(zip(vals, got_spark, got_duck))


def test_full_digest_parity_on_boundary_doubles(spark, duck, monkeypatch):
    """End-to-end digest (serialize → md5 → 40-bit sum) over a part
    whose double column is ALL truncation-boundary values: the whole
    pipeline — not just the serialization — must agree across engines
    on bit-identical inputs."""
    import math

    import pandas as pd

    from cultural_heritage_bigdata_project_spark.plans import digests

    vals = [
        2.35, math.nextafter(2.35, 0.0), math.nextafter(2.35, 10.0),
        -2.35, math.nextafter(-2.35, 0.0), 2.675,
        math.nextafter(1.0, 0.0), 0.1, -0.0, None,
        9007199254.740992, math.nextafter(9007199254.740992, 0.0),
    ]
    pdf = pd.DataFrame(
        {"id": range(len(vals)), "value": pd.array(vals, dtype="float64")}
    )
    monkeypatch.setitem(
        digests.PART_COLS, "__boundary", (("id", "s"), ("value", "f"))
    )
    sdf = spark.createDataFrame(pdf)
    got = digests.digest_part_df(sdf, "__boundary").first()
    duck.register("__boundary_vals", pdf)
    sql = digests.digest_part_sql(
        "SELECT id, value FROM __boundary_vals", "__boundary"
    )
    part, n_rows, digest = duck.execute(sql).fetchone()
    duck.unregister("__boundary_vals")
    assert (got.n_rows, got.digest) == (n_rows, digest)

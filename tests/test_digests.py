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

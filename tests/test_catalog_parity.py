"""The big gate: every catalog query with an oracle must match DuckDB
exactly at sf0.001 — a stricter local mirror of the driver's sf0.01
check (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from cultural_heritage_bigdata_project_spark.plans.catalog import CATALOG, catalog_queries

from . import parity
from .conftest import SF_DIR


def _oracle_cases():
    catalog_queries()  # force registration
    return sorted(CATALOG)


@pytest.mark.parametrize("name", _oracle_cases())
def test_parity(name, spark, duck):
    q = CATALOG[name]
    sdf = q.fn(spark, SF_DIR)
    spdf = sdf.toPandas()
    if q.oracle is None:
        assert len(spdf) >= 0  # rows-only: dedicated tests elsewhere
        return
    opdf = duck.execute(q.oracle).df()
    parity.compare(spdf, opdf, name=name)
    assert len(spdf) > 0, f"{name}: empty result weakens the check"

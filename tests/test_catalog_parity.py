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


def test_catalog_md_matches_live_registry():
    """CATALOG.md is generated, but two consecutive rounds shipped it
    stale (a query registered after the last gen run). Gate: the
    full-index table in CATALOG.md must list EXACTLY the live
    registry's query names, and the stated total must match — any
    drift fails CI until tools/gen_catalog_md.py is re-run."""
    import os
    import re

    catalog_queries()  # force registration
    md = open(
        os.path.join(os.path.dirname(__file__), "..", "CATALOG.md"),
        encoding="utf-8",
    ).read()
    full_index = md.split("## Per-operator queries (full index)", 1)[1]
    listed = set(re.findall(r"^\| `([a-z0-9_]+)` \|", full_index, re.M))
    live = set(CATALOG)
    assert listed == live, (
        f"CATALOG.md stale — missing {sorted(live - listed)}, "
        f"phantom {sorted(listed - live)}; re-run tools/gen_catalog_md.py"
    )
    m = re.search(r"Total: (\d+) per-operator queries", md)
    assert m and int(m.group(1)) == len(live), (
        f"CATALOG.md total {m and m.group(1)} != registry {len(live)}"
    )

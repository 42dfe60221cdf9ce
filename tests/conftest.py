from __future__ import annotations

import os

import pytest

from cultural_heritage_bigdata_project_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


def _slow_nodeids() -> set[str]:
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    try:
        with open(path, encoding="utf-8") as f:
            return {
                ln.strip()
                for ln in f
                if ln.strip() and not ln.startswith("#")
            }
    except OSError:
        return set()


def pytest_collection_modifyitems(config, items):
    """Apply the `slow` marker from tests/slow_tests.txt (data-driven so
    the measured-slow set is one reviewable list, not 116 scattered
    decorators). pytest.ini deselects `slow` by default — the driver's
    bounded verify run gets the ~10-min functional/parity set; the full
    suite runs with `-m ""`."""
    slow = _slow_nodeids()
    if not slow:
        return
    marker = pytest.mark.slow
    for item in items:
        if item.nodeid in slow:
            item.add_marker(marker)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from . import parity

    con = parity.duckdb_con(SF_DIR)
    yield con
    con.close()

from __future__ import annotations

import pytest

from cultural_heritage_bigdata_project_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


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

"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query catalog
(``cultural_heritage_bigdata_project_spark.plans.catalog``): every implemented
operator from SURVEY.md §2 registers a named query plus (where
SQL-expressible) a DuckDB oracle; this module just re-exports them.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make the package importable regardless of the caller's CWD
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from cultural_heritage_bigdata_project_spark.plans.catalog import (
    catalog_oracles,
    catalog_queries,
)

FLAGSHIP = "reference_curated_flow"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog_queries()[FLAGSHIP](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return catalog_oracles()

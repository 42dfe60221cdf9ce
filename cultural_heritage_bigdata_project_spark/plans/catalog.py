"""Named-query catalog: the engine's operator coverage, oracle-checked.

Every operator from SURVEY.md §2 is exposed as a named query: a
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
an equivalent ANSI-SQL string the DuckDB oracle runs on the same
parquet tables. The driver compares row-count + schema + order-
insensitive value-hash, so:

- every computed column is aliased identically on both sides;
- doubles are ``round()``-ed identically on both sides (the fold order
  of a distributed sum differs from DuckDB's sequential sum in the
  last ulp; rounding removes it);
- timestamps are formatted to strings on both sides (Spark timestamps
  are session-TZ-aware through Arrow, DuckDB's are naive).

Queries whose semantics are not ANSI-SQL-expressible (seeded shuffles,
LSH bucketing, iterative fixpoints, streaming) register with
``oracle=None`` → the driver records a rows-only check and the local
test suite carries the stronger self-oracle.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str
    survey_ref: str  # SURVEY.md §2 operator ids this query exercises


CATALOG: dict[str, CatalogQuery] = {}


def register(
    name: str, *, oracle: str | None, description: str, survey_ref: str
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in CATALOG:
            raise ValueError(f"duplicate catalog query {name!r}")
        CATALOG[name] = CatalogQuery(
            name=name, fn=fn, oracle=oracle, description=description, survey_ref=survey_ref
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so registration side effects run."""
    from . import queries_relational  # noqa: F401
    from . import queries_text  # noqa: F401
    from . import queries_vector  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_pipeline  # noqa: F401
    from . import queries_sources  # noqa: F401
    from . import queries_advanced  # noqa: F401
    from . import queries_sql  # noqa: F401
    from . import queries_scale  # noqa: F401
    from . import queries_misc  # noqa: F401


def catalog_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: q.fn for name, q in CATALOG.items()}


def catalog_oracles() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}

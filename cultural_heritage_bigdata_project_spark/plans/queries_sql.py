"""SQL-front-door catalog: correlated/scalar subqueries, HAVING,
outer-join distributions — the Spark SQL surface over registered views
(SURVEY.md §4.1: subquery decorrelation etc. come from stock Catalyst;
these queries prove the engine exposes them).

Each query registers the fixture views and runs ANSI SQL through
``spark.sql`` — same Catalyst plans as the DataFrame API, and the
oracle text doubles as documentation of exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from .catalog import register


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


_Q4 = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
GROUP BY o_orderpriority
"""


@register(
    "correlated_exists",
    description="Q4-shaped correlated EXISTS subquery (decorrelated by "
    "Catalyst into a semi-join) through the SQL front door",
    survey_ref="J5,A1",
    oracle=_Q4,
)
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q4)


_Q13 = """
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY n_orders
"""


@register(
    "outer_join_distribution",
    description="Q13-shaped left-outer join + two-level aggregation "
    "(customer order-count distribution)",
    survey_ref="J1,A1",
    oracle=_Q13,
)
def outer_join_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q13)


_Q18 = """
SELECT o.o_orderkey, o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 150
)
GROUP BY o.o_orderkey, o.o_totalprice
"""


@register(
    "in_subquery_having",
    description="Q18-shaped IN-subquery with HAVING (large-volume orders)",
    survey_ref="J5,A1",
    oracle=_Q18,
)
def in_subquery_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q18)


_Q22 = """
SELECT c.c_mktsegment, count(*) AS n_idle_rich,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 400000)
GROUP BY c.c_mktsegment
"""


@register(
    "scalar_subquery_anti",
    description="Q22-shaped scalar subquery threshold + NOT EXISTS "
    "anti-join (avg is exact here: DuckDB and Spark both compute "
    "sum/count over the same doubles — single partition at oracle scale; "
    "threshold comparisons tolerate last-ulp drift except on exact ties)",
    survey_ref="J5,A1",
    oracle=_Q22,
)
def scalar_subquery_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q22)


_QMIN = """
SELECT p.p_brand, p.p_partkey, p.p_retailprice
FROM part p
WHERE p.p_retailprice = (SELECT min(p2.p_retailprice) FROM part p2
                         WHERE p2.p_brand = p.p_brand)
"""


@register(
    "correlated_scalar_min",
    description="Q2-shaped correlated scalar subquery: cheapest part per "
    "brand (min is order-independent — exact double parity)",
    survey_ref="J1,A3",
    oracle=_QMIN,
)
def correlated_scalar_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _QMIN)

"""Scale-pattern catalog: skew-salted aggregation (oracle-checked
equivalence with the plain plan) and approximate aggregates (rows-only;
accuracy asserted in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import scale
from ..sources.tables import load_table
from .catalog import register


@register(
    "skew_salted_agg",
    description="Two-phase salted aggregation for skewed keys (AQE splits "
    "skewed joins but not hot aggregate keys): same result as the plain "
    "groupBy, spread over 16 salt reducers",
    survey_ref="A1",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       count(*) AS cnt_items,
       min(l_extendedprice) AS min_price,
       max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
""",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = scale.salted_aggregate(
        li,
        ["l_returnflag"],
        {
            "sum_qty": F.sum(F.col("l_quantity").cast("decimal(38,6)")),
            "cnt_items": F.count(F.lit(1)),
            "min_price": F.min("l_extendedprice"),
            "max_price": F.max("l_extendedprice"),
        },
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("double").alias("sum_qty"),
        "cnt_items",
        "min_price",
        "max_price",
    )


@register(
    "approx_stats",
    description="Approximate aggregates for 100TB-scale profiling: "
    "approx_count_distinct (HLL) + percentile_approx — sketch values are "
    "engine-specific, so rows-only; accuracy vs exact asserted in tests",
    survey_ref="A2",
    oracle=None,
)
def approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )

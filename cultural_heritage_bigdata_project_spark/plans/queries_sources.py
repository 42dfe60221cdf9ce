"""Source/sink round-trip catalog (SURVEY.md §2.1): JSON lake landing
with explicit-schema re-read, keyed idempotent landing, partitioned
writes with partition pruning. Each query performs the write, reads it
back, and returns a result the DuckDB oracle reproduces from the
original table — so the round trip itself is what's verified."""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import sinks
from ..sources.tables import load_table
from .catalog import register


def _tmp(sf_dir: str, tag: str) -> str:
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return os.path.join(tempfile.gettempdir(), f"spark_graft_{tag}_{h}")


EVENTS_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@register(
    "json_landing_roundtrip",
    description="S2/S6 analog: land events as JSON in the raw lake, re-read "
    "with an EXPLICIT schema (no inference pass — SURVEY.md §4.1 fixes the "
    "reference's per-run inference at eu_raw_to_cleansed_merge.py:35), "
    "HWM-filter and aggregate",
    survey_ref="S2,S6,P5,F1",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
WHERE ts > TIMESTAMP '2024-01-10 00:00:00'
GROUP BY event_type
""",
)
def json_landing_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    path = _tmp(sf_dir, "json_landing")
    ev.write.mode("overwrite").json(path)
    back = spark.read.schema(EVENTS_JSON_SCHEMA).json(path)
    cutoff_us = 1704844800000000  # 2024-01-10 00:00:00 UTC
    return (
        back.filter(F.col("ts_us") > cutoff_us)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "sum_value"
            ),
        )
    )


@register(
    "keyed_landing_roundtrip",
    description="S7 scale-fix: idempotent keyed raw landing as a distributed "
    "bucketed JSON write (replaces the reference's collect()-to-driver + "
    "one-PUT-per-row sink, metadata_eu_to_raw.py:74-112); re-read and "
    "project",
    survey_ref="S7,A5,F6",
    oracle="""
SELECT o_custkey,
       'order_' || CAST(min(o_orderkey) AS VARCHAR) AS landed_key,
       count(*) AS n_total
FROM orders
GROUP BY o_custkey
""",
)
def keyed_landing_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("first_order"), F.count(F.lit(1)).alias("n_total")
    )
    landed = per_cust.select(
        "o_custkey",
        F.concat(F.lit("order_"), F.col("first_order").cast("string")).alias(
            "landed_key"
        ),
        "n_total",
    )
    path = _tmp(sf_dir, "keyed_landing")
    sinks.keyed_json_landing(landed, "o_custkey", path, [F.col("landed_key")])
    schema = T.StructType(
        [
            T.StructField("o_custkey", T.LongType()),
            T.StructField("landed_key", T.StringType()),
            T.StructField("n_total", T.LongType()),
        ]
    )
    # drop the hash-bucket partition column the reader appends
    return spark.read.schema(schema).json(path).drop("bucket")


@register(
    "partitioned_landing_prune",
    description="S8 partitioned lake write (partitionBy year — the "
    "reference's dt partitioning, kafka_annotations_to_minio_raw.py:39) + "
    "re-read with a partition-pruned scan (the pruning the reference leaves "
    "unused, SURVEY.md §4.1)",
    survey_ref="S8,S9,P9",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       o_orderpriority,
       count(*) AS n_orders
FROM orders
WHERE year(o_orderdate) IN (1999, 2000)
GROUP BY 1, 2
""",
)
def partitioned_landing_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = _tmp(sf_dir, "part_landing")
    sinks.partitioned_parquet_landing(o, path, ["order_year"])
    back = spark.read.parquet(path)
    # the filter on the partition column prunes directories at planning
    # time — only 2 of ~7 year partitions are scanned
    return (
        back.filter(F.col("order_year").isin(1999, 2000))
        .groupBy("order_year", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.col("order_year").cast("int").alias("order_year"),
            "o_orderpriority",
            "n_orders",
        )
    )


@register(
    "csv_landing_roundtrip",
    description="CSV source/sink round trip with explicit schema (no "
    "inferSchema pass) — header write, typed re-read, aggregate",
    survey_ref="S2",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
FROM customer GROUP BY c_mktsegment
""",
)
def csv_landing_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    path = _tmp(sf_dir, "csv_landing")
    c.write.mode("overwrite").option("header", True).csv(path)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    )
    back = spark.read.schema(schema).option("header", True).csv(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double").alias(
            "total_bal"
        ),
    )


@register(
    "orc_landing_roundtrip",
    description="ORC source/sink round trip (columnar alternative with the "
    "same pushdown/pruning machinery as parquet)",
    survey_ref="S2,S9",
    oracle="""
SELECT p_brand, count(*) AS n_parts,
       CAST(sum(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
FROM part WHERE p_size > 25 GROUP BY p_brand
""",
)
def orc_landing_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    path = _tmp(sf_dir, "orc_landing")
    p.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return (
        back.filter(F.col("p_size") > 25)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(38,6)")).cast("double").alias(
                "total_price"
            ),
        )
    )

"""Inventory-completion catalog: the remaining SURVEY.md §2 operators
not covered by the larger query families (A9, A10, J2, X3, F2/F9/F11)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .catalog import register


@register(
    "explode_tokens_distinct",
    description="A9: unnest + distinct (ref SELECT DISTINCT UNNEST(tags) "
    "for filter options, app.py:100)",
    survey_ref="A9,A4",
    oracle="""
SELECT DISTINCT lang, unnest(string_split(lower(trim(text)), ' ')) AS token
FROM documents
""",
)
def explode_tokens_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "lang", F.explode(F.split(F.trim(F.lower("text")), " +")).alias("token")
    ).distinct()


@register(
    "arrays_overlap_filter",
    description="A10: any-overlap array predicate (ref tags && %s::TEXT[], "
    "app.py:134-136)",
    survey_ref="A10",
    oracle="""
SELECT doc_id, lang FROM documents
WHERE list_has_any(string_split(lower(trim(text)), ' '),
                   ['vector', 'window', 'stream'])
""",
)
def arrays_overlap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower("text")), " +")
    probe = F.array(F.lit("vector"), F.lit("window"), F.lit("stream"))
    return d.filter(F.arrays_overlap(toks, probe)).select("doc_id", "lang")


@register(
    "right_join_orders",
    description="J2: right equi-join (ref ugc ⟖ europeana, "
    "join_eu_ugc_qdrant_overwrite.py:180)",
    survey_ref="J2",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey
FROM orders o RIGHT JOIN customer c
  ON o.o_custkey = c.c_custkey AND o.o_totalprice > 350000
""",
)
def right_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 350000)
    return o.join(c, cond, "right").select("c_custkey", "c_name", "o_orderkey")


@register(
    "flatten_distinct_union",
    description="X3: union-all + distinct over nested guid lists (ref "
    "list(set(flattened)) join_eu_ugc_qdrant_merge.py:207-211) — "
    "flatten + array_distinct, fully JVM-side",
    survey_ref="X3,A6",
    oracle="""
WITH v AS (
  SELECT 'item/' || CAST(vec_id AS VARCHAR) AS guid,
         CASE WHEN vec_id % 50 = 0 THEN 'g' || CAST(vec_id % 7 AS VARCHAR)
              ELSE 'solo' || CAST(vec_id % 25 AS VARCHAR) END AS grp
  FROM embeddings
), lists AS (
  SELECT grp, list_sort(list(guid)) AS guids FROM v GROUP BY grp
)
SELECT CAST(count(DISTINCT u.g) AS BIGINT) AS n_distinct_guids,
       CAST(count(*) AS BIGINT) AS n_total
FROM lists, unnest(lists.guids) AS u(g)
""",
)
def flatten_distinct_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vid = F.col("vec_id")
    v = e.select(
        F.concat(F.lit("item/"), vid.cast("string")).alias("guid"),
        F.when(vid % 50 == 0, F.concat(F.lit("g"), (vid % 7).cast("string")))
        .otherwise(F.concat(F.lit("solo"), (vid % 25).cast("string")))
        .alias("grp"),
    )
    lists = v.groupBy("grp").agg(F.array_sort(F.collect_list("guid")).alias("guids"))
    all_lists = lists.agg(F.collect_list("guids").alias("nested"))
    return all_lists.select(
        F.size(F.array_distinct(F.flatten("nested"))).cast("long").alias(
            "n_distinct_guids"
        ),
        F.size(F.flatten("nested")).cast("long").alias("n_total"),
    )


@register(
    "complex_types_gallery",
    description="Engine type floor beyond the reference (SURVEY §1.2: no "
    "decimal/interval/map/nested-struct in the reference, engine covers "
    "them): map construction+lookup, struct field access, exact decimal "
    "arithmetic, interval date math",
    survey_ref="F4,F5",
    oracle="""
SELECT o_orderkey,
       CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled'
            ELSE 'other' END AS status_name,
       o_totalprice AS nested_price,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS VARCHAR) AS dec_doubled,
       epoch_us(o_orderdate + INTERVAL 30 DAY) AS due_us
FROM orders
""",
)
def complex_types_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    status_map = F.create_map(
        F.lit("O"), F.lit("open"), F.lit("F"), F.lit("filled"), F.lit("P"), F.lit("other")
    )
    nested = F.struct(
        F.col("o_orderkey").alias("k"),
        F.struct(F.col("o_totalprice").alias("price")).alias("inner"),
    )
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.element_at(status_map, F.col("o_orderstatus")), F.lit("other")
        ).alias("status_name"),
        nested.getField("inner").getField("price").alias("nested_price"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 2)
        .cast("string")
        .alias("dec_doubled"),
        F.unix_micros(
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("timestamp")
        ).alias("due_us"),
    )


@register(
    "cube_status_priority",
    description="CUBE multi-dimensional aggregate (engine SQL surface "
    "sibling of rollup_order_status)",
    survey_ref="A1",
    oracle="""
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "temporal_scalar_gallery",
    description="F2/F3/F9/F11 scalar surface: to_timestamp parse, "
    "date_format, year/quarter extraction, element_at on split arrays",
    survey_ref="F2,F9,F11",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date_str,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
       epoch_us(strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                         '%Y-%m-%d %H:%M:%S')) AS reparsed_us,
       string_split(o_orderpriority, '-')[1] AS priority_code
FROM orders
""",
)
def temporal_scalar_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    fmt = F.date_format(ts, "yyyy-MM-dd HH:mm:ss")
    return o.select(
        "o_orderkey",
        F.date_format(ts, "yyyy-MM-dd").alias("order_date_str"),
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.unix_micros(F.to_timestamp(fmt, "yyyy-MM-dd HH:mm:ss")).alias(
            "reparsed_us"
        ),
        F.element_at(F.split("o_orderpriority", "-"), 1).alias("priority_code"),
    )

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


@register(
    "filtered_revenue",
    description="Q6-shaped tight-filter aggregate (date range + discount "
    "band + quantity cap, all pushed to the scan) — single global agg",
    survey_ref="A1,P5",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue_effect,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(38,6)"))
            .cast("double")
            .alias("revenue_effect"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "conditional_share",
    description="Q14-shaped conditional aggregate: revenue share of one "
    "part-type family (CASE inside sum over a join)",
    survey_ref="A1,J1,F4",
    oracle="""
SELECT CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
                ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS promo_revenue,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS total_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
""",
)
def conditional_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    zero = F.lit(0).cast("decimal(38,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero))
            .cast("double")
            .alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )


@register(
    "multi_or_predicates",
    description="Q19-shaped disjunctive multi-clause predicate over a join "
    "(Catalyst pushes the common conjuncts, keeps the OR residual)",
    survey_ref="A1,J1",
    oracle="""
SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       count(*) AS n_rows
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'BRAND#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1 AND l.l_quantity <= 20)
   OR (p.p_brand = 'BRAND#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity >= 5 AND l.l_quantity <= 35)
   OR (p.p_brand = 'BRAND#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity >= 10 AND l.l_quantity <= 50)
""",
)
def multi_or_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(p, p.p_partkey == li.l_partkey)
    def clause(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
    cond = (
        clause("BRAND#1", 1, 15, 1, 20)
        | clause("BRAND#2", 10, 30, 5, 35)
        | clause("BRAND#3", 20, 50, 10, 50)
    )
    return j.filter(cond).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "table_profile",
    description="Data-profiling utility a training-data pipeline needs: "
    "per-column nulls / distincts / extrema in one pass, long-form output",
    survey_ref="A1,A2",
    oracle="""
SELECT 'o_orderstatus' AS column_name,
       count(*) - count(o_orderstatus) AS n_nulls,
       count(DISTINCT o_orderstatus) AS n_distinct,
       min(o_orderstatus) AS min_str, max(o_orderstatus) AS max_str
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
       count(DISTINCT o_orderpriority),
       min(o_orderpriority), max(o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_custkey', count(*) - count(o_custkey),
       count(DISTINCT o_custkey),
       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
FROM orders
""",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    def prof(col, cast_str=False):
        # min/max on the NATIVE type, cast the result (casting first
        # would compare numerics lexicographically)
        return o.agg(
            F.lit(col).alias("column_name"),
            (F.count(F.lit(1)) - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(F.col(col)).cast("string").alias("min_str"),
            F.max(F.col(col)).cast("string").alias("max_str"),
        )
    return (
        prof("o_orderstatus")
        .unionByName(prof("o_orderpriority"))
        .unionByName(prof("o_custkey", cast_str=True))
    )


@register(
    "ntile_quartiles",
    description="NTILE window binning: price quartile per order within its "
    "priority class (unique tiebreak for determinism)",
    survey_ref="W5",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice, o_orderkey) AS price_quartile
FROM orders
""",
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
    )


@register(
    "global_sort_nulls",
    description="W3 + null-ordering parity: multi-column global sort with "
    "explicit NULLS FIRST/LAST (Spark default asc=nulls-first differs from "
    "DuckDB's nulls-last — both sides pin it explicitly), top-200 slice",
    survey_ref="W3,W1",
    oracle="""
WITH src AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS etype,
         value
  FROM events
)
SELECT event_id, etype, value FROM src
ORDER BY etype ASC NULLS FIRST, value DESC, event_id ASC
LIMIT 200
""",
)
def global_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("event_type"))
        .alias("etype"),
        "value",
    )
    return src.orderBy(
        F.col("etype").asc_nulls_first(), F.col("value").desc(), F.col("event_id").asc()
    ).limit(200)


@register(
    "statistical_moments",
    description="Variance/stddev/correlation derived from exact decimal "
    "power sums (Σx, Σx², Σxy) — order-independent cross-engine, unlike "
    "native stddev/corr whose float accumulation order differs",
    survey_ref="A1",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
       round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
       round((sxy - sx * sy / n) / (n - 1), 4) AS cov_qty_price
FROM s
""",
)
def statistical_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    DEC = "decimal(38,6)"
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q.cast(DEC)).cast("double").alias("sx"),
        F.sum((q * q).cast(DEC)).cast("double").alias("sxx"),
        F.sum(p.cast(DEC)).cast("double").alias("sy"),
        F.sum((q * p).cast(DEC)).cast("double").alias("sxy"),
    )
    n = F.col("n")
    var = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    return s.select(
        "l_returnflag",
        "n",
        F.round(var, 6).alias("var_qty"),
        F.round(F.sqrt(var), 6).alias("stddev_qty"),
        F.round(cov, 4).alias("cov_qty_price"),
    )


@register(
    "rank_distributions",
    description="percent_rank / cume_dist / dense_rank analytic windows "
    "(rank-derived ratios are exact int divisions — cross-engine safe)",
    survey_ref="W5",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       dense_rank() OVER w AS dr,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
)
def rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.dense_rank().over(w).cast("long").alias("dr"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@register(
    "scd2_orders",
    description="SCD Type 2 merge (Kimball history-tracking upsert, the "
    "two-action Delta MERGE pattern): a changed orders snapshot closes "
    "current versions (valid_to = snapshot ts) and inserts new ones; "
    "unchanged/absent keys untouched, history never deleted. One "
    "current-rows-only shuffle; full hash-checked output "
    "(operators/merge.py:scd2_apply)",
    survey_ref="S12,S14",
    oracle="""
WITH tgt AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         0::BIGINT AS valid_from, CAST(NULL AS BIGINT) AS valid_to,
         TRUE AS is_current
  FROM orders
), src AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         o_totalprice + CASE WHEN o_orderkey % 4 = 0 THEN 10.0 ELSE 0.0 END AS o_totalprice,
         1000::BIGINT AS ts
  FROM orders WHERE o_orderkey % 5 = 0
), chg AS (
  SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice, s.ts
  FROM src s JOIN tgt t ON s.o_orderkey = t.o_orderkey
  WHERE s.o_orderstatus IS DISTINCT FROM t.o_orderstatus
     OR s.o_totalprice IS DISTINCT FROM t.o_totalprice
)
SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice, t.valid_from,
       t.valid_to, t.is_current
FROM tgt t LEFT JOIN chg c USING (o_orderkey) WHERE c.o_orderkey IS NULL
UNION ALL
SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice, t.valid_from,
       c.ts AS valid_to, FALSE AS is_current
FROM tgt t JOIN chg c USING (o_orderkey)
UNION ALL
SELECT o_orderkey, o_orderstatus, o_totalprice, ts AS valid_from,
       CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
FROM chg
""",
)
def scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import merge

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    target = o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    source = o.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 4 == 0, F.lit(10.0)).otherwise(F.lit(0.0))
        ).alias("o_totalprice"),
        F.lit(1000).cast("long").alias("ts"),
    )
    return merge.scd2_apply(
        target,
        source,
        keys=["o_orderkey"],
        change_cols=["o_orderstatus", "o_totalprice"],
        ts_col="ts",
    )

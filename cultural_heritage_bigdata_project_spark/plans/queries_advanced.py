"""Advanced operator catalog: as-of/range joins, sessionization,
canonical grouping, the Python UDF surface (grouped-agg pandas UDF,
applyInPandas, UDTF — SURVEY.md §2.9 U3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import temporal
from ..sources.tables import load_table
from .catalog import register


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )


@register(
    "asof_join_purchase_click",
    description="As-of join (engine extension; Spark lacks a native one): "
    "for each purchase, the latest preceding-or-equal click by the same "
    "user — union-tag + ordered window, one shuffle, no inequality join",
    survey_ref="J1",
    oracle="""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
p AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts_us AS click_ts_us FROM e
      WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts_us,
       c.click_id AS asof_click_id, c.click_ts_us AS asof_click_ts_us
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts_us >= c.click_ts_us
""",
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_us(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts_us").alias("click_ts_us"),
    )
    return temporal.asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts_us",
        right_ts="click_ts_us",
        right_cols=["click_id", "click_ts_us"],
        right_tiebreak="click_id",
    )


@register(
    "range_join_bursts",
    description="Range join (engine extension): same-user event pairs "
    "within 2 minutes — bucketized equi-join (2 hash joins), never an "
    "inequality nested loop",
    survey_ref="J1",
    oracle="""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
       b.ts_us - a.ts_us AS delta_us
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND b.ts_us > a.ts_us AND b.ts_us <= a.ts_us + 120000000
""",
)
def range_join_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_us(spark, sf_dir)
    return temporal.range_join_pairs(
        e, key="user_id", ts_us_col="ts_us", id_col="event_id",
        max_delta_us=120_000_000,
    )


@register(
    "sessionization",
    description="Batch sessionization (lag + conditional cumsum; batch "
    "analog of streaming session_window): sessions per user at 1h gap, "
    "with per-session stats",
    survey_ref="W5,T6",
    oracle="""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
g AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > 3600000000
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
), s AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       max(ts_us) - min(ts_us) AS duration_us,
       min(event_id) AS first_event_id
FROM s GROUP BY user_id, session_id
""",
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events_us(spark, sf_dir)
    sessions = temporal.sessionize(
        e, key="user_id", ts_us_col="ts_us", gap_us=3_600_000_000
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.min("event_id").alias("first_event_id"),
    )


@register(
    "canonical_grouping",
    description="A6: canonical-group aggregation — guid list + "
    "representative per group (ref driver-side pandas groupby "
    "join_eu_ugc_qdrant_merge.py:61-79 → distributed collect_list/min)",
    survey_ref="A6,M4",
    oracle="""
WITH v AS (
  SELECT 'item/' || CAST(vec_id AS VARCHAR) AS guid,
         CASE WHEN vec_id % 50 = 0 THEN 'g' || CAST(vec_id % 7 AS VARCHAR)
              ELSE 'solo' || CAST(vec_id AS VARCHAR) END AS grp
  FROM embeddings
)
SELECT grp AS canonical_group,
       min(guid) AS representative,
       count(*) AS n_members,
       array_to_string(list_sort(list(guid)), ',') AS member_guids
FROM v GROUP BY grp
""",
)
def canonical_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines.curated import derive_verdicts

    v = derive_verdicts(spark, sf_dir)
    return v.groupBy(F.col("grp").alias("canonical_group")).agg(
        F.min("guid").alias("representative"),
        F.count(F.lit(1)).alias("n_members"),
        F.array_join(F.array_sort(F.collect_list("guid")), ",").alias("member_guids"),
    )


@register(
    "pandas_grouped_agg",
    description="U3: GROUPED_AGG pandas UDF — per-segment acctbal spread "
    "(max-min; deterministic regardless of arrow batch order)",
    survey_ref="U3",
    oracle="""
SELECT c_mktsegment,
       max(c_acctbal) - min(c_acctbal) AS acctbal_spread,
       count(*) AS n_customers
FROM customer GROUP BY c_mktsegment
""",
)
def pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    # annotations set explicitly: `from __future__ import annotations`
    # stringifies hints module-wide and pandas_udf can't resolve them
    def _spread(v):
        return float(v.max() - v.min())

    _spread.__annotations__ = {"v": pd.Series, "return": float}
    spread = F.pandas_udf(_spread, "double")

    def _n(v):
        return len(v)

    _n.__annotations__ = {"v": pd.Series, "return": int}
    n_rows = F.pandas_udf(_n, "long")

    # pandas grouped-aggs can't mix with JVM aggregates in one agg() —
    # both metrics go through the pandas path
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        spread("c_acctbal").alias("acctbal_spread"),
        n_rows("c_acctbal").alias("n_customers"),
    )


@register(
    "apply_in_pandas_normalize",
    description="U3: applyInPandas grouped-map — per-priority min-max "
    "normalization of order totals (model-per-group shape; min/max based "
    "so values are batch-order independent)",
    survey_ref="U3,U2",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round((o_totalprice - min(o_totalprice) OVER w)
             / (max(o_totalprice) OVER w - min(o_totalprice) OVER w), 6)
         AS price_norm
FROM orders WINDOW w AS (PARTITION BY o_orderpriority)
""",
)
def apply_in_pandas_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["o_totalprice"].min(), pdf["o_totalprice"].max()
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderpriority": pdf["o_orderpriority"],
                "price_norm": ((pdf["o_totalprice"] - lo) / (hi - lo)).round(6),
            }
        )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return o.groupBy("o_orderpriority").applyInPandas(
        normalize, "o_orderkey long, o_orderpriority string, price_norm double"
    )


@register(
    "udtf_token_explode",
    description="U3: Python UDTF (Spark 3.5+) — tokenize documents into "
    "(doc_id, position, token) rows",
    survey_ref="U3",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
  FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       CAST(unnest(range(len(toks))) AS INTEGER) AS position,
       unnest(toks) AS token
FROM t
""",
)
def udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="position int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(str(text).lower().strip().split(" ")):
                yield i, tok

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("__udtf_docs")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        """
        SELECT d.doc_id, t.position, t.token
        FROM __udtf_docs d, LATERAL tokenize_udtf(d.text) t
        """
    )

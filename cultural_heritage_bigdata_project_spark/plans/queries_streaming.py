"""Structured Streaming catalog (SURVEY.md §2.8) — batch-equivalence
oracled.

Each entry replays the bounded ``events`` fixture as a file stream
with an ``availableNow`` trigger and returns the materialized result;
the DuckDB oracle states the batch semantics the stream must converge
to. Multi-batch behavior (watermark progression, late-data drops,
cross-batch upserts) is exercised in tests/test_streaming.py where the
fixture is split into time-ordered files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import streaming
from .catalog import register


def _events_path(sf_dir: str) -> str:
    """File-source streams need a directory; expose the (read-only)
    events fixture through a symlink dir."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"spark_graft_events_{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    target = f"{sf_dir}/events.parquet"
    # islink, not exists: a dangling symlink (stale tempdir) reports
    # False on exists and the create below would raise; also retarget
    # if the link points somewhere else (ADVICE r1)
    if os.path.islink(link):
        if os.readlink(link) != target:
            os.remove(link)
            os.symlink(target, link)
    else:
        os.symlink(target, link)
    return d


@register(
    "stream_tumbling_window",
    description="T6 capability: watermarked 6h tumbling-window count/sum "
    "per event_type over the events stream (replaces the reference's "
    "while-True HWM loops, T5); availableNow replay == batch oracle",
    survey_ref="T1,T2,T6,S1",
    oracle="""
SELECT epoch_us(time_bucket(INTERVAL '6 hours', ts)) AS window_start_us,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = streaming.events_stream(spark, _events_path(sf_dir))
    agg = streaming.tumbling_window_agg(stream, "6 hours", "1 hour")
    return streaming.run_to_memory(agg, output_mode="complete")


@register(
    "stream_dedup_keys",
    description="A5/T6: dropDuplicatesWithinWatermark over the stream, "
    "key-set projection (bounded-state replacement for the reference's "
    "HWM+dropDuplicates loop, ugc_raw_to_cleansed.py:37-70)",
    survey_ref="A5,T6",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = streaming.events_stream(spark, _events_path(sf_dir))
    deduped = streaming.stream_dedup_keys(stream, ["user_id", "event_type"])
    return streaming.run_to_memory(deduped, output_mode="append")


@register(
    "stream_sliding_window",
    description="T6 capability: sliding-window (12h window, 6h slide) "
    "count/sum per event_type — every event lands in exactly two "
    "epoch-aligned windows",
    survey_ref="T6,T1",
    oracle="""
WITH buckets AS (
  SELECT epoch_us(time_bucket(INTERVAL '6 hours', ts)) AS window_start_us,
         event_type, value
  FROM events
  UNION ALL
  SELECT epoch_us(time_bucket(INTERVAL '6 hours', ts)) - 21600000000,
         event_type, value
  FROM events
)
SELECT window_start_us, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM buckets GROUP BY 1, 2
""",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    stream = streaming.events_stream(spark, _events_path(sf_dir))
    agg = (
        stream.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ltz", "1 hour")
        .groupBy(F.window("ts_ltz", "12 hours", "6 hours"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return streaming.run_to_memory(agg, output_mode="complete")


@register(
    "stream_session_window",
    description="T6 capability the reference entirely lacks: streaming "
    "session windows (1h gap) per user — merged-session start/end/count "
    "(native replacement for the T5 while-True loops)",
    survey_ref="T6",
    oracle="""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
g AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > 3600000000
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS sid
  FROM g
)
SELECT user_id,
       min(ts_us) AS session_start_us,
       max(ts_us) + 3600000000 AS session_end_us,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
""",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    stream = streaming.events_stream(spark, _events_path(sf_dir))
    agg = (
        stream.withColumn("ts_ltz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_ltz", "1 hour")
        .groupBy(F.session_window("ts_ltz", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )
    return streaming.run_to_memory(agg, output_mode="complete")


@register(
    "stream_static_join",
    description="Stream-static enrichment join: the events stream joined "
    "to a static dimension derived from customer (broadcast per "
    "micro-batch; the streaming analog of the curated metadata join)",
    survey_ref="J1,T1",
    oracle="""
WITH dim AS (
  SELECT c_custkey AS user_id, c_mktsegment FROM customer WHERE c_custkey < 150
)
SELECT d.c_mktsegment,
       count(*) AS n_events,
       CAST(sum(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events e JOIN dim d ON e.user_id = d.user_id
GROUP BY d.c_mktsegment
""",
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..sources.tables import load_table

    stream = streaming.events_stream(spark, _events_path(sf_dir))
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 150)
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    agg = (
        stream.join(dim, "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "sum_value"
            ),
        )
    )
    return streaming.run_to_memory(agg, output_mode="complete")


@register(
    "stream_stream_interval_join",
    description="Watermarked stream-stream interval join: each purchase "
    "joined to same-user clicks within the preceding 30 minutes (state "
    "bounded by the watermark + time-range condition)",
    survey_ref="J1,T6",
    oracle="""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
p AS (SELECT event_id AS purchase_id, user_id, ts_us AS p_ts FROM e
      WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts_us AS c_ts FROM e
      WHERE event_type = 'click')
SELECT p.purchase_id, c.click_id, p.user_id, p.p_ts - c.c_ts AS gap_us
FROM p JOIN c ON p.user_id = c.user_id
 AND c.c_ts <= p.p_ts AND c.c_ts > p.p_ts - 1800000000
""",
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    purchases = (
        streaming.events_stream(spark, _events_path(sf_dir))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        streaming.events_stream(spark, _events_path(sf_dir))
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    return streaming.run_to_memory(joined, output_mode="append")


@register(
    "stream_stream_outer_join",
    description="Watermarked stream-stream LEFT OUTER interval join: "
    "every purchase emits, joined to same-user clicks within the "
    "preceding 30 minutes or as a NULL row once the click watermark "
    "proves no match can arrive. Null emission is driven by a far-"
    "future sentinel batch that advances both watermarks past the real "
    "data (excluded from the result AFTER the stream completes — a "
    "filter inside the streaming query would propagate through the "
    "equi-join constraint to the click side, drop the sentinel click, "
    "and freeze the watermark: the last purchases would silently never "
    "emit, which is exactly the bug this query's oracle would catch)",
    survey_ref="J1,T6",
    oracle="""
WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events),
p AS (SELECT event_id AS purchase_id, user_id, ts_us AS p_ts FROM e
      WHERE event_type = 'purchase'),
c AS (SELECT event_id AS click_id, user_id, ts_us AS c_ts FROM e
      WHERE event_type = 'click')
SELECT p.purchase_id, c.click_id, p.user_id, p.p_ts - c.c_ts AS gap_us
FROM p LEFT JOIN c ON p.user_id = c.user_id
 AND c.c_ts <= p.p_ts AND c.c_ts > p.p_ts - 1800000000
""",
)
def stream_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import os
    import shutil
    import tempfile
    import time

    from pyspark.sql import functions as F

    from ..sources.tables import load_table

    SENTINEL_UID = 2_000_000_000
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    src = os.path.join(tempfile.gettempdir(), f"spark_graft_ssoj_{tag}")
    shutil.rmtree(src, ignore_errors=True)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    ev.coalesce(1).write.parquet(os.path.join(src, "f0"))
    # sentinel purchase+click pair a decade in the future: processed as
    # a LATER micro-batch (distinct mtime + maxFilesPerTrigger=1), it
    # advances BOTH sides' watermarks past every real event so the
    # outer join's final null rows actually emit before the bounded
    # run terminates — without it, append-mode outer state near the
    # stream tail is never evicted
    mx = ev.agg(F.max("ts")).first()[0]
    far = (
        mx + 10**18
        if isinstance(mx, int)
        else mx + datetime.timedelta(days=3650)
    )
    time.sleep(0.05)
    spark.createDataFrame(
        [
            (SENTINEL_UID, SENTINEL_UID, "purchase", far),
            (SENTINEL_UID + 1, SENTINEL_UID, "click", far),
        ],
        ev.schema,
    ).coalesce(1).write.parquet(os.path.join(src, "f1"))

    stream = streaming.events_stream(
        spark, os.path.join(src, "*"), max_files_per_trigger=1
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")),
        "left_outer",
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("gap_us"),
    )
    out = streaming.run_to_memory(joined, output_mode="append")
    # sentinel exclusion runs on the BATCH result, after the stream —
    # see the description for why it must not live inside the query
    return out.filter(F.col("user_id") < SENTINEL_UID)


@register(
    "stream_scd2_asof_enrich",
    description="Stream-static AS-OF enrichment against an SCD2 "
    "dimension: each streamed event joins the dimension version VALID "
    "AT ITS EVENT TIME (valid_from <= ts < valid_to, open-ended "
    "current row) — the consumption pattern every SCD2 table exists "
    "for, and the interval predicate a plain stream-static equi-join "
    "(stream_static_join) cannot express. Per micro-batch this is a "
    "broadcast range join against the (small, slowly-changing) "
    "dimension; at 100 TB the dim stays broadcast-sized while the "
    "stream is the big side",
    survey_ref="J1,T6,S12",
    oracle="""
WITH u AS (SELECT DISTINCT user_id FROM events),
dim AS (
  SELECT user_id, 'basic' AS tier,
         0::BIGINT AS valid_from, 1705276800000000::BIGINT AS valid_to
  FROM u
  UNION ALL
  SELECT user_id,
         CASE user_id % 3 WHEN 0 THEN 'gold' WHEN 1 THEN 'silver'
              ELSE 'basic' END AS tier,
         1705276800000000::BIGINT AS valid_from, CAST(NULL AS BIGINT) AS valid_to
  FROM u
)
SELECT e.event_id, e.user_id, d.tier, epoch_us(e.ts) AS ts_us
FROM events e JOIN dim d ON e.user_id = d.user_id
 AND epoch_us(e.ts) >= d.valid_from
 AND (d.valid_to IS NULL OR epoch_us(e.ts) < d.valid_to)
""",
)
def stream_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..sources.tables import load_table

    T = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z in micros
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    tier2 = (
        F.when(F.col("user_id") % 3 == 0, F.lit("gold"))
        .when(F.col("user_id") % 3 == 1, F.lit("silver"))
        .otherwise(F.lit("basic"))
    )
    dim = users.select(
        "user_id",
        F.lit("basic").alias("tier"),
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(T).cast("long").alias("valid_to"),
    ).unionByName(
        users.select(
            "user_id",
            tier2.alias("tier"),
            F.lit(T).cast("long").alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )
    )
    stream = streaming.events_stream(spark, _events_path(sf_dir)).select(
        "event_id",
        F.col("user_id").alias("e_user"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    joined = stream.join(
        F.broadcast(dim),
        (F.col("e_user") == F.col("user_id"))
        & (F.col("ts_us") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts_us") < F.col("valid_to"))),
    ).select("event_id", "user_id", "tier", "ts_us")
    return streaming.run_to_memory(joined, output_mode="append")


@register(
    "stream_stateful_totals",
    description="Custom stateful streaming operator (applyInPandasWithState, "
    "T6 surface the reference lacks): per-user running totals in explicit "
    "group state; single-batch replay == batch group-by (multi-batch "
    "accumulation exercised in tests)",
    survey_ref="T6,U3",
    oracle="""
SELECT user_id,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS value_micro
FROM events GROUP BY user_id
""",
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = streaming.events_stream(spark, _events_path(sf_dir))
    out = streaming.stateful_user_totals(stream)
    return streaming.run_to_memory(out, output_mode="update")


@register(
    "stream_upsert_latest",
    description="T4+S12: foreachBatch last-write-wins keyed upsert into a "
    "parquet table with staging-swap commit (distributed replacement for "
    "the reference's collect()-per-batch sink S7 and Postgres staging "
    "transaction S14); final table == latest event per user",
    survey_ref="T4,S12,S14,S7",
    oracle="""
SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def stream_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pyspark.sql import functions as F

    stream = streaming.events_stream(spark, _events_path(sf_dir)).select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    final = streaming.foreach_batch_upsert_run(
        spark,
        stream,
        keys=["user_id"],
        order_desc=["ts", "event_id"],
        # deterministic path (no /tmp leak across runs) + key-bucketed
        # segments: the merge-on-read fold below reads exchange-free
        target_dir=os.path.join(
            tempfile.gettempdir(), f"spark_graft_upsl_{tag}"
        ),
        n_buckets=16,
    )
    return final.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type",
        "value",
    )


@register(
    "stream_upsert_view",
    description="Streaming materialized view over the keyed-upsert "
    "stream (T4+S12 sink + per-epoch O(changes) retract+apply IVM): "
    "per-event_type sum/count of each user's LATEST event, maintained "
    "incrementally as epochs commit — the retraction semantics native "
    "streaming aggregation cannot express (append-only state double-"
    "counts re-keyed rows). Integral floor(value) measure keeps the "
    "incremental double sum bit-exact for the hash check. The oracle "
    "re-aggregates the final latest-per-user table from scratch, so "
    "any incremental drift flips the hash",
    survey_ref="T4,S12,T6,A1",
    oracle="""
SELECT event_type, CAST(sum(floor(value)) AS DOUBLE) AS value_fl,
       CAST(count(*) AS BIGINT) AS n_rows
FROM (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 GROUP BY event_type
""",
)
def stream_upsert_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pyspark.sql import functions as F

    from ..operators import txn

    stream = streaming.events_stream(spark, _events_path(sf_dir)).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.floor("value").alias("value_fl"),
    )
    # deterministic per-sf path: reset=True replaces the previous run's
    # table+view instead of leaking uuid dirs (round-5 ADVICE low)
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    tdir = os.path.join(tempfile.gettempdir(), f"spark_graft_upsv_{tag}")
    vdir = os.path.join(tempfile.gettempdir(), f"spark_graft_upsv_{tag}_view")
    streaming.foreach_batch_upsert_run(
        spark,
        stream,
        keys=["user_id"],
        order_desc=["ts", "event_id"],
        target_dir=tdir,
        view_group_cols=["event_type"],
        view_sum_cols=["value_fl"],
        view_dir=vdir,
        n_buckets=16,
    )
    return txn.read_version(spark, vdir)

"""Scale-pattern catalog: skew-salted aggregation (oracle-checked
equivalence with the plain plan) and approximate aggregates (rows-only;
accuracy asserted in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import scale
from ..sources.tables import load_table
from .catalog import register

# ---------------------------------------------------------------------------
# Per-process fixture memo for the txn-layer queries below. Their segmented
# source tables are expensive deterministic functions of sf_dir (streaming /
# batch upsert epochs); building them inside the timed query body made the
# bench numbers measure the SINK rather than the read/feed operator under
# test, and multiplied bench wall-clock by repeats × setup (round-6 VERDICT
# item 1). The builder runs ONCE per (kind, sf_dir) per process — correctness
# runs, bench repeats, and sweeps within one process all hit the same table —
# and a fresh process rebuilds from scratch into the SAME deterministic path
# (no /tmp accumulation, per round-5 ADVICE). batch_merge_commits stays
# sink-timed on purpose: write cost is its point.
# ---------------------------------------------------------------------------
_FIXTURE_MEMO: dict[tuple, object] = {}


def _fixture(kind: str, sf_dir: str, build):
    key = (kind, sf_dir)
    if key not in _FIXTURE_MEMO:
        _FIXTURE_MEMO[key] = build()
    return _FIXTURE_MEMO[key]


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
    "bucketed_colocated_join",
    description="Bucketing: orders and lineitem written CLUSTERED BY the "
    "join key into matching buckets, then joined WITHOUT a shuffle on "
    "either side (the co-location pattern that amortizes one write-time "
    "shuffle across every later join at 100 TB; absence of Exchange "
    "asserted in tests)",
    survey_ref="J1",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice,
       CAST(sum(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
       count(*) AS n_items
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY o.o_orderkey, o.o_totalprice
""",
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import shutil
    import tempfile
    import os as _os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    base = _os.path.join(tempfile.gettempdir(), f"spark_graft_buckets_{tag}")
    for tbl, src_sql in [
        ("b_orders", "SELECT o_orderkey, o_totalprice, o_orderstatus FROM __b_src_orders"),
        ("b_lineitem", "SELECT l_orderkey, l_quantity FROM __b_src_lineitem"),
    ]:
        loc = _os.path.join(base, tbl)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(loc, ignore_errors=True)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__b_src_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__b_src_lineitem")
    spark.sql(
        f"""CREATE TABLE b_orders USING parquet
            CLUSTERED BY (o_orderkey) INTO 8 BUCKETS
            LOCATION '{base}/b_orders'
            AS SELECT o_orderkey, o_totalprice, o_orderstatus FROM __b_src_orders"""
    )
    spark.sql(
        f"""CREATE TABLE b_lineitem USING parquet
            CLUSTERED BY (l_orderkey) INTO 8 BUCKETS
            LOCATION '{base}/b_lineitem'
            AS SELECT l_orderkey, l_quantity FROM __b_src_lineitem"""
    )
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice,
               CAST(sum(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty,
               count(*) AS n_items
        FROM b_orders o JOIN b_lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'O'
        GROUP BY o.o_orderkey, o.o_totalprice
        """
    )


@register(
    "approx_stats",
    description="Approximate aggregates for 100TB-scale profiling: "
    "approx_count_distinct (HLL) + percentile_approx. Sketch values are "
    "engine-specific, so the checked output is the EXACT statistics plus "
    "within-tolerance flags for the sketches (HLL within 5% of the exact "
    "distinct count, approx median within 5% of the exact median) — the "
    "oracle computes the exact side and asserts the flags TRUE; both "
    "sketches are deterministic, so the flags are stable",
    survey_ref="A2",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS n_orders_exact,
       TRUE AS approx_orders_ok,
       TRUE AS approx_median_ok,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
)
def approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # TWO aggregations joined on the (tiny) group key, NOT one: mixing a
    # DISTINCT aggregate with imperative sketch aggregates (percentile /
    # HLL) makes Spark rewrite the plan through an Expand keyed by
    # (group, distinct-col), which materializes a sketch buffer per
    # DISTINCT KEY instead of per group — measured 25.6 s vs 1.5 s for
    # the same aggregates run separately at sf0.1 (150k percentile
    # buffers instead of 3). Two scans of the fact table are strictly
    # cheaper than that rewrite at every scale.
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    sketch = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("__approx_orders"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("__median_exact"),
        F.percentile_approx("l_extendedprice", 0.5).alias("__approx_median"),
    )
    agg = exact.join(sketch, "l_returnflag")
    rel_err = lambda a, b: F.abs(a - b) / F.greatest(F.abs(b), F.lit(1e-9))  # noqa: E731
    return agg.select(
        "l_returnflag",
        "n_orders_exact",
        (rel_err(F.col("__approx_orders"), F.col("n_orders_exact")) <= 0.05).alias(
            "approx_orders_ok"
        ),
        (rel_err(F.col("__approx_median"), F.col("__median_exact")) <= 0.05).alias(
            "approx_median_ok"
        ),
        "n_rows",
    )


@register(
    "key_skew_profile",
    description="Key-distribution skew diagnostics on lineitem.l_orderkey: "
    "n_keys/max/avg/skew-ratio/top-10-share from ONE count-per-key "
    "aggregate (map-side combine => reducer input is |keys|) — the "
    "pre-flight measurement that decides salting vs AQE vs broadcast",
    survey_ref="A1,A2,W4",
    oracle="""
WITH c AS (
  SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY l_orderkey
), s AS (
  SELECT count(*) AS n_keys,
         cast(sum(cnt) AS BIGINT) AS n_rows,
         max(cnt) AS max_key_rows,
         cast(sum(cnt) AS BIGINT) / count(*) AS avg_key_rows
  FROM c
), t AS (
  SELECT cast(sum(cnt) AS BIGINT) AS top_rows
  FROM (SELECT cnt FROM c ORDER BY cnt DESC, l_orderkey ASC LIMIT 10)
)
SELECT n_keys, n_rows, max_key_rows, avg_key_rows,
       max_key_rows / avg_key_rows AS skew_ratio,
       top_rows / n_rows AS top_share
FROM s, t
""",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return scale.key_skew_profile(li, "l_orderkey", top_n=10)


@register(
    "time_travel_versions",
    description="Versioned-commit time travel (the Delta VERSION AS OF "
    "analog, operators/txn.py): publish two versions of an orders "
    "snapshot with keep_last=2, read BOTH back through the CURRENT "
    "pointer manifest (read_version), and return per-version status "
    "counts — the digest hash covers the full contents of the retained "
    "historical version AND the current one, so a retention/GC bug that "
    "corrupts either read flips the hash",
    survey_ref="S14",
    oracle="""
SELECT 0 AS version, o_orderstatus, count(*) AS n_orders
FROM orders WHERE year(o_orderdate) < 1995 GROUP BY o_orderstatus
UNION ALL
SELECT 1 AS version, o_orderstatus, count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
""",
)
def time_travel_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators import txn

    # deterministic per-sf path, reset on entry — repeated bench/sweep
    # runs reuse one root instead of leaking uuid dirs (round-5 ADVICE)
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_tt_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_orderdate")
    # version 0: the pre-1995 snapshot; version 1: the full table —
    # deterministic functions of the fixture, so both reads are
    # oracle-replayable from `orders` alone
    o.filter(F.year("o_orderdate") < 1995).write.parquet(
        os.path.join(root, "data_v0")
    )
    txn.publish_version(root, "data_v0", keep_last=2)
    o.write.parquet(os.path.join(root, "data_v1"))
    txn.publish_version(root, "data_v1", keep_last=2)
    prev = txn.read_version(spark, root, 0)  # retained historical version
    cur = txn.read_version(spark, root)      # CURRENT
    tagged = prev.withColumn("version", F.lit(0)).unionByName(
        cur.withColumn("version", F.lit(1))
    )
    return tagged.groupBy("version", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "data_skipping_read",
    description="Manifest min/max data skipping (the Delta stats-"
    "skipping analog, operators/txn.py): three deterministic upsert "
    "epochs (orders sliced by o_orderkey thirds, so each delta segment "
    "records a disjoint key range in the manifest) commit into a "
    "segmented table; a predicate read then prunes provably-excluded "
    "segments metadata-only, pushes the key range below the merge-on-"
    "read fold, and applies the non-key clause as a residual — the "
    "result must equal filter-after-full-read, which is exactly what "
    "the oracle states",
    survey_ref="S14,S12,S8",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice_i
FROM (
  SELECT o_custkey, o_orderkey, o_orderstatus,
         cast(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS o_totalprice_i,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
  AND o_custkey BETWEEN 100 AND 400
  AND o_totalprice_i >= 5000000
""",
)
def data_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators import txn
    from ..streaming import pipelines as streaming

    def build() -> str:
        tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
        base = os.path.join(tempfile.gettempdir(), f"spark_graft_dskip_{tag}")
        shutil.rmtree(base, ignore_errors=True)
        src, root = os.path.join(base, "src"), os.path.join(base, "table")
        o = load_table(spark, sf_dir, "orders").select(
            "o_custkey",
            "o_orderkey",
            "o_orderstatus",
            # integral cents via explicit half-up floor: DuckDB's double->
            # bigint cast ROUNDS while Spark's truncates, so a bare cast is
            # off-by-one on half of all values — floor(x*100 + 0.5) runs the
            # identical IEEE ops on both engines
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("o_totalprice_i"),
        )
        # custkey TERCILES per epoch: each delta segment's manifest min/max
        # covers a disjoint key range, so the predicate read below provably
        # drops 2 of the 3 segments before Spark lists a single file
        hi = o.agg(F.max("o_custkey")).first()[0]
        b1, b2 = hi // 3, 2 * (hi // 3)
        slices = [
            F.col("o_custkey") < b1,
            (F.col("o_custkey") >= b1) & (F.col("o_custkey") < b2),
            F.col("o_custkey") >= b2,
        ]
        for e, pred in enumerate(slices):
            o.filter(pred).coalesce(1).write.parquet(os.path.join(src, f"f{e}"))
        stream = (
            spark.readStream.schema(o.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "*"))
        )
        streaming.foreach_batch_upsert_run(
            spark,
            stream,
            keys=["o_custkey"],
            order_desc=["o_orderkey"],
            target_dir=root,
            reset=True,
            compact_every=10,  # stay uncompacted: prune REAL delta segments
        )
        return root

    root = _fixture("dskip", sf_dir, build)
    latest = txn.read_version(
        spark,
        root,
        predicates={
            "o_custkey": (100, 400),  # merge key: prunes + pushes down
            "o_totalprice_i": (5_000_000, None),  # residual, post-fold
        },
    )
    return latest.select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice_i"
    )


@register(
    "point_lookup_read",
    description="Point-lookup serving reads on a key-bucketed segmented "
    "table with key blooms (operators/txn.py): three INTERLEAVED upsert "
    "epochs (orders sliced by o_orderkey mod 3, so every segment spans "
    "the full custkey range and min/max stats can prune nothing) commit "
    "through the real sink with key_blooms=True and n_buckets=8; four "
    "fully-pinned equality reads then resolve through bloom segment "
    "skipping + single-bucket restriction (1/8 of files listed), one of "
    "them a provably-absent key returning empty — the union must equal "
    "the oracle's latest-order-per-custkey fold filtered to those keys",
    survey_ref="S14,S12,J8,W4",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderstatus
FROM (
  SELECT o_custkey, o_orderkey, o_orderstatus,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1 AND o_custkey IN (5, 17, 100)
""",
)
def point_lookup_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools
    import os
    import shutil
    import tempfile

    from ..operators import txn
    from ..streaming import pipelines as streaming

    def build() -> str:
        tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
        base = os.path.join(tempfile.gettempdir(), f"spark_graft_plook_{tag}")
        shutil.rmtree(base, ignore_errors=True)
        src, root = os.path.join(base, "src"), os.path.join(base, "table")
        o = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_orderstatus"
        )
        for e in range(3):
            o.filter(F.col("o_orderkey") % 3 == e).coalesce(1).write.parquet(
                os.path.join(src, f"f{e}")
            )
        stream = (
            spark.readStream.schema(o.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "*"))
        )
        streaming.foreach_batch_upsert_run(
            spark,
            stream,
            keys=["o_custkey"],
            order_desc=["o_orderkey"],
            target_dir=root,
            reset=True,
            compact_every=10,  # stay uncompacted: lookups cross 3 segments
            n_buckets=8,
            key_blooms=True,
        )
        return root

    root = _fixture("plook", sf_dir, build)
    lookups = [
        txn.read_version(spark, root, predicates={"o_custkey": (k, k)})
        for k in (5, 17, 100, 1_000_000_007)  # last one provably absent
    ]
    return functools.reduce(lambda a, b: a.unionByName(b), lookups).select(
        "o_custkey", "o_orderkey", "o_orderstatus"
    )


@register(
    "batch_merge_commits",
    description="Batch MERGE INTO a delta-segmented table "
    "(streaming.batch_upsert_commit — the Delta MERGE equivalent for "
    "batch jobs, CAS-published): three sequential batch commits of "
    "orders slices (orderkey mod 3) land as O(batch) delta segments "
    "under monotone table epochs with a minor-compaction roll "
    "(minor_every=2), and the merge-on-read read must equal the "
    "latest-order-per-custkey fold over all three slices",
    survey_ref="S12,S14,A5",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderpriority
FROM (
  SELECT o_custkey, o_orderkey, o_orderpriority,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def batch_merge_commits(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators import txn
    from ..streaming import pipelines as streaming

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_bmerge_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    for e in range(3):
        streaming.batch_upsert_commit(
            spark,
            o.filter(F.col("o_orderkey") % 3 == e),
            keys=["o_custkey"],
            order_desc=["o_orderkey"],
            target_dir=root,
            minor_every=2,  # exercise the shared roll in batch mode
            compact_every=10,
        )
    return txn.read_version(spark, root).select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )


@register(
    "change_feed_cursor",
    description="Checkpointed incremental change-feed consumption (the "
    "Delta readChangeFeed + Trigger.AvailableNow consumption model, "
    "operators/txn.py poll_changes/ack_cursor): two batch MERGE epochs "
    "(orders sliced by orderkey mod 3, latest order per customer) "
    "commit, a fresh cursor polls them as one batch and acks; a third "
    "epoch commits and the table is then ROLLED BACK with "
    "restore_version (metadata-only RESTORE); the second poll must "
    "deliver exactly the third epoch's rows — O(changes since last "
    "ack), never a table scan, and the restore is invisible to the "
    "feed (a rewrite is not a change). The oracle replays both polls "
    "from the slice definitions, so a cursor that skips, re-delivers, "
    "or leaks restore rows flips the hash",
    survey_ref="S14,T4,S12",
    oracle="""
WITH latest AS (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderkey % 3 AS epoch,
         row_number() OVER (PARTITION BY o_orderkey % 3, o_custkey
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
)
SELECT CAST(CASE WHEN epoch <= 1 THEN 0 ELSE 1 END AS BIGINT) AS batch,
       epoch, o_custkey, o_orderkey, o_orderstatus
FROM latest WHERE rn = 1
""",
)
def change_feed_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators import txn
    from ..streaming import pipelines as streaming

    def build() -> tuple[str, str, int]:
        tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
        base = os.path.join(tempfile.gettempdir(), f"spark_graft_cursor_{tag}")
        shutil.rmtree(base, ignore_errors=True)
        root = os.path.join(base, "tbl")
        o = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_orderstatus"
        )

        def commit(e: int) -> None:
            streaming.batch_upsert_commit(
                spark,
                o.filter(F.col("o_orderkey") % 3 == e),
                keys=["o_custkey"],
                order_desc=["o_orderkey"],
                target_dir=root,
                keep_last=8,
            )

        commit(0)
        commit(1)
        hi0 = max(  # table epoch the first poll originally observed
            e
            for n in txn.list_versions(root)
            if (e := txn._numeric_epoch(n)) is not None
        )
        commit(2)
        # rollback under the consumer: a restore is a rewrite, not a change
        txn.restore_version(root, "data_v1")
        return base, root, hi0

    base, root, hi0 = _fixture("cursor", sf_dir, build)
    # Timed body: the CONSUMER — two bounded polls replaying the original
    # batch boundaries against the prebuilt table (to_epoch = the Delta CDF
    # endingVersion analog). The cursor file is re-seeded per run.
    cursor = os.path.join(base, "cursor.json")
    if os.path.exists(cursor):
        os.remove(cursor)
    poll0, _ = txn.poll_changes(spark, root, cursor, to_epoch=hi0)
    txn.ack_cursor(cursor, hi0)
    poll1, _hi1 = txn.poll_changes(spark, root, cursor)
    seq = streaming._SEQ_COL
    out0 = poll0.withColumn("batch", F.lit(0).cast("long"))
    out1 = poll1.withColumn("batch", F.lit(1).cast("long"))
    return out0.unionByName(out1).select(
        "batch",
        F.col(seq).alias("epoch"),
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
    )


@register(
    "cdc_replication",
    description="CDC table replication (streaming.replicate_changes — "
    "the cross-region follower a 100 TB deployment runs on a "
    "schedule): three batch MERGE epochs (orders sliced by orderkey "
    "mod 3) plus a tombstone epoch (custkeys divisible by 10 deleted "
    "at a sentinel order key) commit into a source table; a cursor-"
    "driven replica applies them in two polls — O(changes) on the "
    "source, one O(batch) CAS-published MERGE on the replica per poll "
    "— and the REPLICA's merge-on-read read must equal the source's "
    "latest-order-per-customer fold minus the deleted keys, which is "
    "exactly what the oracle states from `orders` alone",
    survey_ref="S14,S12,T4",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderstatus
FROM (
  SELECT o_custkey, o_orderkey, o_orderstatus,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1 AND o_custkey % 10 <> 0
""",
)
def cdc_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators import txn
    from ..streaming import pipelines as streaming

    def build() -> tuple[str, str, int]:
        tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
        base = os.path.join(tempfile.gettempdir(), f"spark_graft_cdcrep_{tag}")
        shutil.rmtree(base, ignore_errors=True)
        src = os.path.join(base, "src")
        o = load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_orderstatus"
        )

        def commit(df) -> None:
            streaming.batch_upsert_commit(
                spark,
                df,
                keys=["o_custkey"],
                order_desc=["o_orderkey"],
                target_dir=src,
                delete_col="is_del",
                keep_last=8,
            )

        upsert = lambda e: commit(  # noqa: E731 - local shorthand
            o.filter(F.col("o_orderkey") % 3 == e).withColumn(
                "is_del", F.lit(False)
            )
        )
        upsert(0)
        upsert(1)
        hi0 = max(  # source epoch the first replication originally saw
            e
            for n in txn.list_versions(src)
            if (e := txn._numeric_epoch(n)) is not None
        )
        upsert(2)
        # tombstone epoch: delete every custkey divisible by 10 at a
        # sentinel order key above every real one, so the delete wins
        commit(
            o.select("o_custkey")
            .distinct()
            .filter(F.col("o_custkey") % 10 == 0)
            .select(
                "o_custkey",
                (F.lit(1_000_000_000).cast("long") + F.col("o_custkey")).alias(
                    "o_orderkey"
                ),
                F.lit(None).cast("string").alias("o_orderstatus"),
                F.lit(True).alias("is_del"),
            )
        )
        return base, src, hi0

    base, src, hi0 = _fixture("cdcrep", sf_dir, build)
    # Timed body: the REPLICATOR — two cursor-driven O(changes) polls +
    # O(batch) replica merges, replayed at the original batch boundaries
    # (to_epoch bounds the first poll). Replica and cursor reset per run.
    dst = os.path.join(base, "dst")
    cursor = os.path.join(base, "cursor.json")
    shutil.rmtree(dst, ignore_errors=True)
    if os.path.exists(cursor):
        os.remove(cursor)
    streaming.replicate_changes(spark, src, dst, cursor, to_epoch=hi0)
    streaming.replicate_changes(spark, src, dst, cursor)
    return txn.read_version(spark, dst).select(
        "o_custkey", "o_orderkey", "o_orderstatus"
    )


@register(
    "change_feed_ivm",
    description="Change feed + incremental view maintenance, driver-"
    "gated end to end (the Delta CDF -> streaming-agg consumer shape): "
    "three deterministic upsert epochs (orders sliced by key mod 3, "
    "latest order per customer) commit into a delta-segmented table; "
    "the maintained per-priority sum/count view is built from the "
    "epoch-0 segment plus txn.change_feed(0,2) with retraction against "
    "the v0 merge-on-read snapshot — O(changes) maintenance, never a "
    "re-scan. The oracle re-derives the final table's latest-row-per-"
    "key fold (order date desc, epoch asc, key desc) in one window and "
    "re-aggregates from scratch, so ANY drift between the incremental "
    "and full answer flips the hash",
    survey_ref="S14,T4,S12,A1",
    oracle="""
WITH rows AS (
  SELECT o_custkey AS k, o_orderpriority,
         CAST(o_orderkey % 1000 AS DOUBLE) AS units,
         o_orderdate, o_orderkey, o_orderkey % 3 AS epoch
  FROM orders
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY k
    ORDER BY o_orderdate DESC, epoch ASC, o_orderkey DESC) AS rn
  FROM rows
)
SELECT o_orderpriority, CAST(sum(units) AS DOUBLE) AS units,
       CAST(count(*) AS BIGINT) AS n_rows
FROM ranked WHERE rn = 1 GROUP BY o_orderpriority
""",
)
def change_feed_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators import cleanse, merge, txn

    # deterministic per-sf path, reset on entry: repeated bench/sweep/
    # correctness runs overwrite ONE table instead of accumulating
    # uuid-named /tmp garbage (round-5 ADVICE low)
    root = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_cf_{os.path.basename(sf_dir.rstrip('/')) or 'sf'}",
    )
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        "o_orderpriority",
        # integral double: incremental add/retract stays bit-exact, so
        # the digest cannot straddle a truncation boundary
        (F.col("o_orderkey") % 1000).cast("double").alias("units"),
        "o_orderdate",
        "o_orderkey",
    )
    spec = {
        "kind": "latest_by_key",
        "keys": ["k"],
        "order_desc": ["o_orderdate"],
        "seq_col": "__sg_seq",
    }
    # All three epoch segments in ONE pass (optimization round 12,
    # guide §2.4): the per-epoch loop scanned orders three times and
    # ran three one-third-size dedup shuffles; a single window over
    # (epoch, k) — identical per-epoch semantics, epochs are disjoint
    # — dedups everything in one scan + one same-byte shuffle, and a
    # partitioned write lands each epoch's rows as its own directory,
    # renamed into place as the three immutable segments. File
    # contents per segment are unchanged (the epoch rides as the
    # directory key, __sg_seq stays a data column).
    staged = o.withColumn("__e", (F.col("o_orderkey") % 3).cast("int"))
    latest_all = cleanse.dedup_first_wins(
        staged,
        ["__e", "k"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    ).withColumn("__sg_seq", F.col("__e").cast("long"))
    stage_dir = os.path.join(root, "_epoch_stage")
    latest_all.write.partitionBy("__e").parquet(stage_dir)
    os.makedirs(os.path.join(root, txn.SEGMENTS_DIR), exist_ok=True)
    segments: list[str] = []
    for e in range(3):
        # move each epoch's directory into the segment store right
        # before ITS publish: publish-time retention sweeps segments
        # no retained manifest references, so pre-placing all three
        # would get the future epochs vacuumed by the first publish
        # (the stage dir sits outside the segment store and is safe)
        seg = f"upsert_v{e}"
        os.rename(
            os.path.join(stage_dir, f"__e={e}"), txn.segment_path(root, seg)
        )
        segments.append(seg)
        vname = f"data_v{e}"
        os.makedirs(os.path.join(root, vname))
        txn.write_manifest(
            root,
            vname,
            {
                "": {
                    "base": None,
                    "segments": list(segments),
                    "changes": [seg],
                    "reconstruct": spec,
                }
            },
        )
        txn.publish_version(root, vname, keep_last=3)
    shutil.rmtree(stage_dir, ignore_errors=True)
    snap0 = txn.read_version(spark, root, 0)  # merge-on-read v0 snapshot
    state0 = merge.incremental_agg_maintain(
        None,
        spark.read.parquet(txn.segment_path(root, "upsert_v0")),
        None,
        keys=["k"],
        group_cols=["o_orderpriority"],
        sum_cols=["units"],
    )
    feed = txn.change_feed(spark, root, 0, 2)  # O(changes): epochs 1-2 only
    return merge.incremental_agg_maintain(
        state0,
        feed,
        snap0,
        keys=["k"],
        group_cols=["o_orderpriority"],
        sum_cols=["units"],
        order_desc=["o_orderdate"],
    )


@register(
    "version_diff",
    description="CDC-style snapshot diff (the Delta Change Data Feed "
    "analog, audit companion of time_travel_versions): classify every "
    "order key as added/removed/changed/unchanged between two "
    "deterministic snapshots — old = keys not div by 13, new = keys "
    "not div by 17 with prices bumped on keys div by 5. One null-safe "
    "full-outer join on the key, the same single exchange MERGE costs",
    survey_ref="S12,J4,A1",
    oracle="""
WITH old_t AS (
  SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0
), new_t AS (
  SELECT o_orderkey, o_orderstatus,
         round(o_totalprice + CASE WHEN o_orderkey % 5 = 0 THEN 1.0 ELSE 0.0 END, 2)
           AS o_totalprice
  FROM orders WHERE o_orderkey % 17 <> 0
)
SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
              OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
            ELSE 'unchanged' END AS change,
       o.o_orderstatus AS old_o_orderstatus,
       o.o_totalprice AS old_o_totalprice,
       n.o_orderstatus AS new_o_orderstatus,
       n.o_totalprice AS new_o_totalprice
FROM old_t o FULL OUTER JOIN new_t n ON o.o_orderkey = n.o_orderkey
""",
)
def version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import merge

    ok = F.col("o_orderkey")
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = base.filter(ok % 13 != 0).withColumn(
        "o_totalprice", F.round(F.col("o_totalprice"), 2)
    )
    new = base.filter(ok % 17 != 0).withColumn(
        "o_totalprice",
        F.round(
            F.col("o_totalprice")
            + F.when(ok % 5 == 0, F.lit(1.0)).otherwise(F.lit(0.0)),
            2,
        ),
    )
    return merge.table_diff(old, new, keys=["o_orderkey"])


@register(
    "zorder_keys",
    description="Morton/Z-order clustering key (the Delta ZORDER BY "
    "analog): interleave the low 8 bits of two bucketed dimensions — "
    "range-clustering on this key gives parquet min/max pruning for "
    "2-D box predicates. Pure integer shift/mask projection, no "
    "shuffle, engine-replayable bit arithmetic",
    survey_ref="F7,A1",
    oracle="""
WITH b AS (
  SELECT o_orderkey,
         o_custkey % 256 AS d1,
         o_orderkey % 256 AS d2
  FROM orders
), z AS (
  SELECT o_orderkey, d1, d2,
         (
           ((d1 >> 0) & 1) * 1    + ((d2 >> 0) & 1) * 2 +
           ((d1 >> 1) & 1) * 4    + ((d2 >> 1) & 1) * 8 +
           ((d1 >> 2) & 1) * 16   + ((d2 >> 2) & 1) * 32 +
           ((d1 >> 3) & 1) * 64   + ((d2 >> 3) & 1) * 128 +
           ((d1 >> 4) & 1) * 256  + ((d2 >> 4) & 1) * 512 +
           ((d1 >> 5) & 1) * 1024 + ((d2 >> 5) & 1) * 2048 +
           ((d1 >> 6) & 1) * 4096 + ((d2 >> 6) & 1) * 8192 +
           ((d1 >> 7) & 1) * 16384 + ((d2 >> 7) & 1) * 32768
         ) AS zkey
  FROM b
)
SELECT o_orderkey, CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
       CAST(zkey AS BIGINT) AS zkey
FROM z
""",
)
def zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scale import zorder_key

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 256).cast("long").alias("d1"),
        (F.col("o_orderkey") % 256).cast("long").alias("d2"),
    )
    return o.select(
        "o_orderkey", "d1", "d2",
        zorder_key(F.col("d1"), F.col("d2"), bits=8).alias("zkey"),
    )

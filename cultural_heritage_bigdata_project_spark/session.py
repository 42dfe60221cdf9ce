"""SparkSession factory tuned for the engine.

The reference runs every job with a bare ``local[*]`` session and zero
``spark.sql.*`` tuning (reference: spark-apps/eu-to-cleansed/
eu_raw_to_cleansed_merge.py:14-24) — it relies on stock Catalyst for
pushdown/pruning/join selection. We keep that reliance but turn on the
knobs that matter at scale:

- AQE (runtime partition coalescing, skew-join splitting, dynamic join
  strategy) so the same declarative plan survives a 100x scale-up.
- ``spark.sql.shuffle.partitions`` sized to the local core count for
  tests; on a real cluster AQE coalescing makes the static value less
  critical, but we still avoid the 200-partition default on tiny data.
- Arrow for any pandas exchange (vector/text UDF paths).
- UTC session timezone so results compare bit-for-bit against the
  DuckDB oracle (naive-UTC timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cultural-heritage-bigdata-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when the env var
    is set, else ``local[*]``. On a real cluster, pass ``master=None``
    and submit with ``--master``; every config here is cluster-safe.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus_i = os.cpu_count() or 8
        shuffle_partitions = min(64, max(8, cpus_i))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Multi-root segment-union reads (persisted ANN/text index
        # serving) pass up to ~50 segment directories to one reader;
        # above this threshold Spark ships file LISTING to the cluster
        # as its own job, which on a local filesystem costs a full
        # job-scheduling round trip (~100 ms, profiled: one 48-task
        # listing job per text-index label lookup) to list directories
        # the driver stats in microseconds. Default raised for local
        # paths; deployments listing huge object-store prefixes set
        # SPARK_GRAFT_LIST_PARALLEL_THRESHOLD back down (guide §6:
        # listing cost lives on the driver — distribute it only when
        # the driver is actually the bottleneck).
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "512"),
        )
        # Spark 4.1's union output-partitioning propagation (SQLConf
        # UNION_OUTPUT_PARTITIONING, default true) makes a Union whose
        # children are all SinglePartition execute as ONE partition
        # (SQLPartitioningAwareUnionRDD zips the branches into a single
        # task). That SERIALIZES the bucketed merge-on-read fold
        # (txn.bucketed_reconstruct: one coalesce(1)+window branch per
        # bucket, union of n_buckets branches) whose entire design is
        # "parallelism = bucket count with zero exchanges" — measured at
        # sf0.1: the 16-bucket doclen fold ran as 1 task (0.48 s serial)
        # with the flag on, 16 tasks with it off; at 100 TB a serial
        # bucketed-table read is a non-starter. Off restores the
        # documented pre-4.1 union behavior (sum of child partitions) at
        # every scale; env-parameterized for workloads whose unions
        # WANT the propagated partitioning (guide §2.5 — stragglers:
        # one task owning all buckets is the degenerate straggler).
        .config(
            "spark.sql.unionOutputPartitioning",
            os.environ.get("SPARK_GRAFT_UNION_OUTPUT_PARTITIONING", "false"),
        )
        # events.parquet carries INT64 TIMESTAMP(NANOS) which vanilla
        # Spark rejects; read as long and convert in sources.tables.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

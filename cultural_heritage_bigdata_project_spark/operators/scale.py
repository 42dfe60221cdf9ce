"""Scale-pattern operators: skew salting, small-file compaction,
incremental high-water-mark processing.

These are the engine-level answers to the reference's acknowledged
scale gaps (SURVEY.md §4.1): `coalesce(1)` small-file mitigation that
serializes writes, full re-reads every scheduler cycle, and "Implement
Delta Lake OPTIMIZE" left as future work (reference README.md:410-411).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cleanse, merge, txn


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups on (keys, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers instead of one straggler — phase 2
    merges the partials on the true keys. Only algebraic aggregates
    (sum/count/min/max) compose this way; ``aggs`` maps output column
    name → phase-1 aggregate, and phase 2 re-combines by sum for
    sum/count and min/max for min/max (inferred from the name prefix:
    ``sum_*``/``cnt_*`` → sum, ``min_*`` → min, ``max_*`` → max).

    AQE's skew-join handling covers joins; this covers aggregations,
    where AQE cannot split a single hot reduce key.
    """
    # salt assignment need not be reproducible: algebraic aggregates
    # are invariant to how rows split across salts (exactness of the
    # final values is the caller's concern — use decimal sums)
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)),
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[a.alias(name) for name, a in aggs.items()]
    )
    phase2_aggs = []
    for name in aggs:
        if name.startswith("min_"):
            phase2_aggs.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            phase2_aggs.append(F.max(name).alias(name))
        else:  # sums and counts re-combine additively
            phase2_aggs.append(F.sum(name).alias(name))
    return phase1.groupBy(*keys).agg(*phase2_aggs)


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 10,
) -> DataFrame:
    """Key-distribution skew diagnostics: the measurement that decides
    whether a join/agg on ``key_col`` needs salting, AQE skew handling,
    or a broadcast — before the straggler shows up in production.

    One row: n_keys, n_rows, max_key_rows, avg_key_rows (exact double),
    skew_ratio = max/avg (1.0 = uniform; ≥ salt_buckets means one key
    dominates a reducer even after salting), top_share = fraction of
    all rows held by the ``top_n`` heaviest keys (deterministic
    tiebreak on the key).

    Plan: one count-per-key aggregate (map-side partial combine ⇒
    reducer input is |keys|, not |rows|), then a scalar summary and a
    top-n TakeOrdered over that — both on the already-tiny per-key
    frame. At 100 TB this is the cheap pre-flight scan its output
    saves you from repeating.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__c"))
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__c").alias("n_rows"),
        F.max("__c").alias("max_key_rows"),
        (F.sum("__c") / F.count(F.lit(1))).alias("avg_key_rows"),
    )
    top = (
        counts.orderBy(F.col("__c").desc(), F.col(key_col).asc())
        .limit(top_n)
        .agg(F.sum("__c").alias("__top_rows"))
    )
    return (
        summary.crossJoin(F.broadcast(top))
        .select(
            "n_keys",
            "n_rows",
            "max_key_rows",
            "avg_key_rows",
            (F.col("max_key_rows") / F.col("avg_key_rows")).alias("skew_ratio"),
            (F.col("__top_rows") / F.col("n_rows")).alias("top_share"),
        )
    )


def compact_table(
    spark: SparkSession, path: str, target_files: int
) -> int:
    """Small-file compaction maintenance op (the OPTIMIZE the reference
    defers; README.md:410-411): rewrite a parquet dir into
    ``target_files`` files via a staging-swap commit. Returns the
    resulting file count.
    """
    # repair any earlier crashed swap first: restores a vanished target
    # from its __old backup and clears stale staging dirs (ADVICE r1)
    txn.recover_swap(path, staging_suffixes=("__compact_staging",))
    df = spark.read.parquet(path)
    staging = path.rstrip("/") + "__compact_staging"
    df.repartition(target_files).write.mode("overwrite").parquet(staging)
    old = path.rstrip("/") + "__old"
    os.replace(path, old)
    os.replace(staging, path)
    shutil.rmtree(old, ignore_errors=True)
    return len([f for f in os.listdir(path) if f.endswith(".parquet")])


def zorder_key(c1, c2, bits: int = 16):
    """Morton / Z-order key: interleave the low ``bits`` bits of two
    non-negative integer columns — the space-filling-curve key that
    gives ``clustered_write`` MULTI-dimension file pruning (the Delta
    ``ZORDER BY (a, b)`` analog): range-clustering on the interleaved
    key keeps rows close in BOTH dimensions inside the same files, so
    parquet min/max statistics prune 2-D box predicates instead of
    only a prefix column.

    Pure integer shift/mask expression (one codegen projection, no
    shuffle, replayable by any engine with bit ops — the DuckDB oracle
    re-derives identical keys). Callers bucket unbounded/signed/non-int
    dimensions into [0, 2^bits) first (e.g. ``pmod(hash, 2^bits)`` or
    value scaling); values wider than ``bits`` are masked.
    """
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    a = c1.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = c2.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def clustered_write(
    df,
    path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> None:
    """Range-clustered parquet write: globally range-partition on
    ``cluster_cols`` then sort within each partition before writing —
    the liner ZORDER/CLUSTER BY analog for single-dimension scan
    locality. Each output file then covers a narrow, (near-)disjoint
    range of the cluster key, so parquet row-group min/max statistics
    prune file reads for range/point predicates on that key — the
    difference between scanning 100 TB and scanning the few files a
    predicate touches.

    One range-exchange shuffle (sampling-based bounds) + local sort;
    ``n_files`` caps output file count (default: current shuffle
    parallelism). For multi-dimension locality use a space-filling
    curve key upstream and cluster on it.
    """
    cols = [F.col(c) for c in cluster_cols]
    part = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def incremental_cycle(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    hwm_col: str,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """One batch incremental cycle: read the target's high-water mark,
    process only newer source rows, insert-only upsert, staging-swap
    commit (the reference's T5 while-True loop body — scheduler.py +
    P5 + S11 — as a composable function; the streaming-native version
    is streaming.foreach_batch_upsert_run).
    """
    txn.recover_swap(target_path)  # repair a crashed swap before reading
    exists = os.path.isdir(target_path) and any(
        f.endswith(".parquet") for f in os.listdir(target_path)
    )
    if exists:
        target = spark.read.parquet(target_path)
        hwm = target.agg(F.max(hwm_col)).first()[0]
        fresh = cleanse.high_water_mark_filter(source, hwm_col, hwm) if hwm is not None else source
        fresh = cleanse.dedup_first_wins(fresh, keys, order_by)
        result = merge.upsert_insert_only(target, fresh.select(*target.columns), keys)
    else:
        result = cleanse.dedup_first_wins(source, keys, order_by)
    staging = target_path.rstrip("/") + "__staging"
    result.write.mode("overwrite").parquet(staging)
    if exists:
        old = target_path.rstrip("/") + "__old"
        os.replace(target_path, old)
        os.replace(staging, target_path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.replace(staging, target_path)
    return spark.read.parquet(target_path)

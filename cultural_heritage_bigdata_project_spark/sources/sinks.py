"""Sink operators: raw landing, partitioned lake writes, JDBC serving.

Reference shapes re-expressed at scale (SURVEY.md §2.1):
- S7 per-record JSON landing — the reference collect()s every micro-
  batch to the driver and PUTs one S3 object per row
  (metadata_eu_to_raw.py:74-112), its clearest scale bug. Here:
  deterministic keyed dedup + a distributed partitioned write; the
  landing is idempotent because content is a pure function of input.
- S8 partitioned streaming/batch sink (partitionBy dt,
  kafka_annotations_to_minio_raw.py:35-42) — same pattern, minus the
  anti-scale coalesce(1) (configurable here).
- S9/S10 overwrite/append sinks — plain writer modes.
- S13 JDBC serving sink (curated_to_postgres.py:67-75) — thin wrapper,
  gated: no database/driver ships in this environment.
- S4 existence probe (DeltaTable.isDeltaTable branching,
  eu_raw_to_cleansed_merge.py:62) — filesystem/catalog check.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cleanse


def table_exists(spark: SparkSession, path: str) -> bool:
    """S4: create-vs-merge branching probe. Works for any file-based
    table (parquet dir with files)."""
    if not os.path.isdir(path):
        return False
    return any(f.endswith(".parquet") for f in os.listdir(path))


def keyed_json_landing(
    df: DataFrame,
    key: str,
    path: str,
    order_by: Sequence[Column | str],
    n_buckets: int = 64,
) -> None:
    """S7 replacement: idempotent keyed raw landing, distributed.

    One row per key (deterministic first-wins), written as JSON
    partitioned by a stable key-hash bucket — executors write in
    parallel, no driver collect, and re-running lands byte-identical
    content (overwrite of a pure function of the input).
    """
    deduped = cleanse.dedup_first_wins(df, [key], order_by)
    (
        deduped.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .json(path)
    )


def partitioned_parquet_landing(
    df: DataFrame, path: str, partition_cols: Sequence[str], coalesce: int | None = None
) -> None:
    """S8: partitioned columnar landing. ``coalesce`` mirrors the
    reference's small-file mitigation but stays configurable — at scale
    leave it None and let AQE size output files."""
    out = df.coalesce(coalesce) if coalesce else df
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def jdbc_sink_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 10_000,
    isolation_level: str = "READ_COMMITTED",
) -> dict[str, str]:
    """The exact writer options ``jdbc_serving_sink`` applies — a pure
    function so the S13 plumbing is unit-testable without a database
    (reference: curated_to_postgres.py:67-75). ``batchsize`` batches
    executor-side inserts; ``isolation_level`` keeps readers unblocked
    during the staging load. Validates eagerly: a malformed URL or
    non-positive batch size would otherwise surface only as an opaque
    driver-manager error at deployment."""
    if not url.startswith("jdbc:"):
        raise ValueError(f"JDBC url must start with 'jdbc:', got {url!r}")
    if not table or not table.strip():
        raise ValueError("JDBC dbtable must be non-empty")
    if batchsize < 1:
        raise ValueError(f"batchsize must be >= 1, got {batchsize}")
    opts = {
        "url": url,
        "dbtable": table,
        "batchsize": str(batchsize),
        "isolationLevel": isolation_level,
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts


def staging_swap_statements(table: str, staging: str | None = None) -> list[str]:
    """The transactional staging-swap DDL the serving database runs
    around a JDBC load (reference S14: curated_to_postgres.py:83-132 —
    load into a staging table, then an atomic rename swap so readers
    never see a partial table). Spark writes into ``staging`` between
    the prepare and swap phases; the list is unit-testable.

    PostgreSQL dialect, matching the reference's serving target:
    ``CREATE TABLE (LIKE ... INCLUDING ALL)`` and transactional DDL
    (BEGIN/COMMIT around ALTER) are PostgreSQL features — MySQL
    auto-commits DDL and Oracle spells the clone differently, so
    targeting another database means swapping this statement list,
    not just the JDBC URL (round-3 advice scoped the former
    "database-agnostic ANSI" claim).

    Order: [prepare staging] ... spark jdbc write ... [atomic swap +
    cleanup]. A crash before COMMIT leaves the serving table untouched
    (same recovery contract as operators/txn.py's CURRENT pointer).
    """
    st = staging or f"{table}_staging"
    old = f"{table}_old"
    return [
        f"DROP TABLE IF EXISTS {st}",
        f"CREATE TABLE {st} (LIKE {table} INCLUDING ALL)",
        # -- spark jdbc write lands here, into {st} --
        "BEGIN",
        f"DROP TABLE IF EXISTS {old}",
        f"ALTER TABLE {table} RENAME TO {old}",
        f"ALTER TABLE {st} RENAME TO {table}",
        "COMMIT",
        f"DROP TABLE IF EXISTS {old}",
    ]


def staging_swap_rollback_statements(
    table: str, staging: str | None = None
) -> list[str]:
    """Crash-recovery DDL for an ABORTED staging load (reference
    failure path: curated_to_postgres.py:108-125 — on any error the
    job rolls back and drops the staging table so the next run starts
    clean). Run when the Spark JDBC write (or the swap transaction)
    fails: the in-flight transaction is rolled back and the staging
    generation discarded. Invariants the tests pin: the SERVING table
    is never named (a recovery that touches it could destroy the last
    good generation), and the statements are idempotent (IF EXISTS) so
    a recovery crash can itself be re-run."""
    st = staging or f"{table}_staging"
    return [
        "ROLLBACK",  # no-op outside a transaction; PostgreSQL warns only
        f"DROP TABLE IF EXISTS {st}",
    ]


def jdbc_serving_sink(
    df: DataFrame, url: str, table: str, mode: str = "overwrite", **options
) -> None:
    """S13: JDBC serving-table write (staging-swap commit is the
    caller's job, as in the reference's S14). GATED: this environment
    ships no JDBC driver or database; deployment supplies both.

    The option dict comes from ``jdbc_sink_options`` (the contract the
    unit tests pin), with caller ``**options`` layered on top."""
    opts = jdbc_sink_options(url, table)
    opts.update(options)
    try:
        df.write.format("jdbc").mode(mode).options(**opts).save()
    except Exception as e:  # pragma: no cover - exercised via unit test
        raise RuntimeError(
            "JDBC sink unavailable: no database/driver in this environment "
            "(reference serving sink: curated_to_postgres.py:67-75). "
            f"Underlying error: {e}"
        ) from e

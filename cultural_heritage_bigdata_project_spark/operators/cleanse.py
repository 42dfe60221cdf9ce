"""Cleansing operators: the raw→cleansed stage of the reference.

Reference semantics (SURVEY.md §2.2):
- P3 not-null key filter (eu_raw_to_cleansed_merge.py:40-42)
- P4 empty-string→NULL normalization over a field list
  (eu_raw_to_cleansed_merge.py:45-54)
- A5 key dedup, first-wins (eu_raw_to_cleansed_merge.py:43)
- P5 high-water-mark incremental predicate
  (join_eu_ugc_qdrant_merge.py:173-174)

All are single-pass narrow projections/filters except dedup, which
shuffles once on the dedup key. At 100 TB the dedup shuffle is the
only cost; everything else is pipelined into the scan and pushed down
by Catalyst (filters reach the parquet reader).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def filter_not_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Drop rows where any required column is NULL (P3)."""
    out = df
    for c in cols:
        out = out.filter(F.col(c).isNotNull())
    return out


def empty_string_to_null(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Normalize '' to NULL across the given string columns (P4).

    The reference loops ``withColumn(when(col==\"\", None))`` over 13
    fields; we emit the same projection in one select so the optimizer
    sees a single projection node.
    """
    colset = set(cols)
    exprs: list[Column] = []
    for c in df.columns:
        if c in colset:
            exprs.append(F.nullif(F.col(c), F.lit("")).alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)


def dedup_first_wins(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """Deterministic keep-first dedup (A5, made order-stable).

    ``dropDuplicates`` keeps an arbitrary partition-order-dependent
    row; for oracle-checkable semantics we lower it to a ranking
    window with an explicit tiebreak (SURVEY.md §4.2.4). One shuffle
    on ``keys``; at scale this is the same exchange dropDuplicates
    would do, so determinism is free.
    """
    w = W.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def high_water_mark_filter(df: DataFrame, col: str, last_value) -> DataFrame:
    """Incremental predicate: rows strictly newer than the mark (P5).

    On parquet this pushes to the scan (min/max row-group skipping);
    it is the batch analog of a streaming checkpoint offset.
    """
    return df.filter(F.col(col) > F.lit(last_value))


def null_or_newer_filter(df: DataFrame, col: str, last_value) -> DataFrame:
    """P7: keep rows with NULL mark (never processed) or newer mark."""
    c = F.col(col)
    return df.filter(c.isNull() | (c > F.lit(last_value)))


def uniqueness_audit(df: DataFrame, key: str) -> DataFrame:
    """A2 audit: total vs distinct key count in one aggregate pass."""
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct(key).alias("distinct_keys"),
    )

"""Join operators: the full family plus the reference's special shapes.

The reference only ever equi-joins on ``guid`` (SURVEY.md §2.3) and
hand-lowers two joins in scale-hostile ways that we replace:

- P6/J5: ``isin(<driver list of every validated guid>)`` — a manual
  broadcast that breaks past driver memory. Here: ``left_semi`` join
  (broadcast when small, shuffle otherwise — AQE decides).
- U1/J3: dict-lookup Python UDFs closed over a driver dict — every row
  crosses the JVM→Python boundary. Here: broadcast map join +
  ``coalesce`` (no Python in the hot path).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_join(df: DataFrame, keys_df: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J5/P6 replacement: EXISTS against a key relation, never a driver list."""
    return df.join(keys_df, on=on, how="left_semi")


def anti_join(df: DataFrame, keys_df: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """NOT EXISTS against a key relation."""
    return df.join(keys_df, on=on, how="left_anti")


def nullsafe_equi_join(
    left: DataFrame, right: DataFrame, keys: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join on null-safe key equality (S12/J4 merge condition shape).

    The reference's curated MERGE matches on ``guid`` plus null-safe
    ``timestamp``/``user_id`` (join_eu_ugc_qdrant_merge.py:387-401).
    ``<=>`` keeps the join an equi-join, so Catalyst still plans a
    hash/sort-merge join rather than a nested loop.
    """
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(right[k])
        cond = c if cond is None else (cond & c)
    return left.join(right, on=cond, how=how)


def broadcast_map_join(
    df: DataFrame,
    mapping: DataFrame,
    key: str,
    value_col: str,
    out_col: str,
    mapping_key: str | None = None,
    default_col: str | None = None,
) -> DataFrame:
    """U1 replacement: remap ``key`` through a small mapping relation.

    ``out_col = mapping[value_col]`` when the key is present, else the
    original value of ``default_col`` (or NULL). The mapping side is
    explicitly broadcast: at 100 TB the fact side never shuffles for
    this enrichment.
    """
    mk = mapping_key or key
    m = mapping.select(F.col(mk).alias("__mk"), F.col(value_col).alias("__mv"))
    joined = df.join(F.broadcast(m), df[key] == F.col("__mk"), "left")
    fallback = F.col(default_col) if default_col else F.lit(None)
    return joined.withColumn(out_col, F.coalesce(F.col("__mv"), fallback)).drop(
        "__mk", "__mv"
    )

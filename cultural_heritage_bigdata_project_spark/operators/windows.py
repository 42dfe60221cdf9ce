"""Window / sort / top-k operators (SURVEY.md §2.5).

The reference's serving layer needs distinct-on (A8/W5), ordered
keyset pagination (W1), seeded-random pagination (W2) and top-k (W4).
Ranking windows shuffle once on the partition key; global top-k plans
as TakeOrderedAndProject (no full sort at scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def distinct_on(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """A8/W5: pick one row per key, first under an explicit order
    (Postgres ``DISTINCT ON``; app.py:146)."""
    w = W.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_k_per_group(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str], k: int
) -> DataFrame:
    """Top-k rows per group via ranking window."""
    w = W.partitionBy(*[F.col(c) for c in keys]).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def keyset_page(df: DataFrame, key: str, last_key, page_size: int) -> DataFrame:
    """W1: ordered keyset pagination (extracting_embeddings.py:126-133).

    Plans as Filter + TakeOrderedAndProject: the filter pushes to the
    scan and only ``page_size`` rows ever reach the driver — the
    scale-correct cursor, unlike OFFSET pagination.
    """
    out = df
    if last_key is not None:
        out = out.filter(F.col(key) > F.lit(last_key))
    return out.orderBy(F.col(key).asc()).limit(page_size)


def seeded_random_page(df: DataFrame, seed: int, page: int, page_size: int) -> DataFrame:
    """W2: stable-under-seed random ordering with OFFSET-style paging
    (app.py:119-149). Spec is "stable given a fixed seed", not a value
    match with Postgres ``setseed`` (SURVEY.md §7 hard-list #4)."""
    w = W.orderBy(F.col("__r"), *[F.col(c) for c in df.columns])
    return (
        df.withColumn("__r", F.rand(seed))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") > page * page_size) & (F.col("__rn") <= (page + 1) * page_size)
        )
        .drop("__r", "__rn")
    )

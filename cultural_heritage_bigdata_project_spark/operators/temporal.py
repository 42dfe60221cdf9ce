"""Temporal join/window operators beyond the reference floor: as-of
join, range join, sessionization.

The reference has no theta/range/as-of joins (SURVEY.md §2.3 note) but
the engine ships the full family. Spark lacks native as-of/range
joins, so these are compositions that keep the plan shuffle-bounded
(pyspark guide 'Common OLAP patterns'):

- as-of: union-tag both sides + one ordered window per key — a single
  shuffle on the key, no join explosion.
- range join: bucketize the range key and equi-join on (key, bucket)
  pairs — turns an inequality join (nested loop) into two hash joins.
- sessionization: lag + conditional cumsum per key (batch analog of
  streaming ``session_window``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, the latest right row with ts ≤ left ts, per
    key (merge_asof semantics, backward direction, allow-equal).

    Implemented as union-tag + ``last(..., ignorenulls)`` over an
    ordered window: one shuffle on ``key``, linear in rows — never the
    O(n·m) nested-loop a naive inequality join would plan.

    ``right_tiebreak`` (a column of ``right_cols``) makes the result
    deterministic when several right rows share a timestamp: the
    greatest tiebreak wins. Without it, equal-ts right rows are
    partition-order dependent.
    """
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts → allow-equal match
    order = [F.col("__ts"), F.col("__is_left")]
    if right_tiebreak is not None:
        order.append(F.col(f"__r.{right_tiebreak}").asc_nulls_first())
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.withColumn(
        "__asof", F.last("__r", ignorenulls=True).over(w)
    ).filter(F.col("__is_left") == 1)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__asof.{c}").alias(f"asof_{c}") for c in right_cols]
    return matched.select(*out_cols)


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts_us_col: str,
    id_col: str,
    max_delta_us: int,
) -> DataFrame:
    """All ordered pairs (a, b) with the same key and
    0 < b.ts − a.ts ≤ max_delta_us.

    Scale shape: bucketize ts by the window width; a pair within the
    window is always in the same or adjacent bucket, so an equi-join on
    (key, bucket) ∪ (key, bucket+1) (via a 2-element explode) finds
    every candidate with hash joins only, then the exact predicate
    filters. No inequality join, no per-key cross join.
    """
    base = df.select(
        F.col(key).alias("__k"),
        F.col(id_col).alias("__id"),
        F.col(ts_us_col).alias("__t"),
        F.floor(F.col(ts_us_col) / max_delta_us).alias("__b"),
    )
    a = base.select(
        "__k",
        F.col("__id").alias("a_id"),
        F.col("__t").alias("__ta"),
        F.explode(F.array(F.col("__b"), F.col("__b") + 1)).alias("__jb"),
    )
    b = base.select(
        "__k",
        F.col("__id").alias("b_id"),
        F.col("__t").alias("__tb"),
        F.col("__b").alias("__jb"),
    )
    return (
        a.join(b, on=["__k", "__jb"])
        .filter(
            (F.col("__tb") > F.col("__ta"))
            & (F.col("__tb") <= F.col("__ta") + max_delta_us)
        )
        .select(
            F.col("__k").alias(key),
            "a_id",
            "b_id",
            (F.col("__tb") - F.col("__ta")).alias("delta_us"),
        )
        .distinct()
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_us_col: str,
    gap_us: int,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap to
    the previous event exceeds ``gap_us`` (batch analog of streaming
    ``session_window``; 'Sessionization' pattern in the PySpark guide).

    One shuffle on the key; session_id = cumulative count of
    gap-breaks, deterministic given a unique ordering.
    """
    w = W.partitionBy(key).orderBy(F.col(ts_us_col))
    gap_break = (
        F.col(ts_us_col) - F.lag(ts_us_col).over(w) > gap_us
    ).cast("int")
    cum = W.partitionBy(key).orderBy(F.col(ts_us_col)).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return df.withColumn(
        "session_id", F.sum(F.coalesce(gap_break, F.lit(0))).over(cum)
    )

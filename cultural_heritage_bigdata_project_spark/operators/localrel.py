"""Single-slice local relations for bounded driver-side row sets.

`SparkSession.createDataFrame(list_of_rows)` parallelizes the rows into
``defaultParallelism`` slices, so a ≤fetch_k-row pinned shortlist (a
grouped page, a fused hybrid page, a query batch) becomes a 32-task
stage on ``local[32]`` in which every task pays a Python-worker
round-trip to unpickle its (usually empty) slice — measured ~0.2 s of
per-ACTION overhead at sf0.1 for a 40-row frame, multiplied by every
downstream job that re-evaluates the frame (optimization guide §4.1:
the Python boundary is per-task, so the lever is fewer tasks).

`local_df` builds the same DataFrame from a 1-slice RDD: identical
rows, schema, and semantics (same pickle serialization path, same
verification), one Python task per evaluation instead of one per core.
On a cluster the data is a driver-local literal either way — slicing a
bounded page across executors buys nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """A DataFrame over a BOUNDED driver-side row list (callers pin
    page-/shortlist-sized sets only), materialized as ONE slice."""
    rows = list(rows)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema
    )

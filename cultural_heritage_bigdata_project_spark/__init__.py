"""PySpark-native analytics engine with the query and data-processing
capabilities of the cultural-heritage-bigdata reference pipeline.

Built Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
Structured Streaming for unbounded inputs, Pandas UDFs only where the
built-in operators genuinely cannot express the semantics.

Layout
------
- ``session``    : tuned SparkSession factory
- ``sources``    : table loaders / raw landing / sink helpers
- ``functions``  : column-level helpers (null normalization, vectors, text)
- ``operators``  : composable dataflow operators (cleanse, dedup, joins,
                   merge emulation, windows, similarity, text analysis)
- ``plans``      : the named-query catalog (queries + DuckDB oracle SQL)
- ``streaming``  : Structured Streaming pipelines (windowed aggs, stream
                   dedup, foreachBatch upsert)
"""

__version__ = "0.1.0"

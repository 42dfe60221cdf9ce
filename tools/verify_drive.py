"""Fresh-process drive of the driver contract (the verify recipe):
vanilla SparkSession, entry smoke, queries/oracles surface, and oracle
spot-checks on a handful of entries. Run from the repo root:
  python tools/verify_drive.py [q1 q2 ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

DEFAULT = ["pricing_summary", "training_corpus_pipeline", "hybrid_rrf_search"]


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as mod
    from tests import parity

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    df = mod.entry(spark)
    n = df.count()
    assert n > 0, "entry returned zero rows"
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert set(os_) <= set(qs)
    print(f"entry rows: {n}; queries: {len(qs)}; oracles: {len(os_)}")
    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    from cultural_heritage_bigdata_project_spark.plans.catalog import CATALOG

    for name in (sys.argv[1:] or DEFAULT):
        if name in qs:
            spdf = qs[name](spark, sf).toPandas()
            sql = os_[name]
        else:  # per-operator member folded into a digest slot
            q = CATALOG[name]
            spdf = q.fn(spark, sf).toPandas()
            sql = q.oracle
        if sql is None:
            print(f"{name} rows-only {len(spdf)} rows")
            continue
        opdf = con.execute(sql).df()
        parity.compare(spdf, opdf, name=name)
        print(f"{name} OK {len(spdf)} rows")
    print("VERIFY_DRIVE_OK")


if __name__ == "__main__":
    main()

"""Scale-operator behavior: compaction, incremental cycles, approx
accuracy."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import scale
from cultural_heritage_bigdata_project_spark.plans.catalog import CATALOG, catalog_queries
from cultural_heritage_bigdata_project_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_compact_table(spark, tmp_path):
    """Compaction reduces file count and preserves content exactly."""
    p = str(tmp_path / "frag")
    o = load_table(spark, SF_DIR, "orders")
    o.repartition(40).write.parquet(p)
    before = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert before >= 30
    n = scale.compact_table(spark, p, target_files=4)
    assert n <= 4
    back = spark.read.parquet(p)
    assert back.count() == o.count()
    assert back.exceptAll(o).count() == 0


def test_incremental_cycle_matches_full(spark, tmp_path):
    """Two HWM cycles over an arriving stream of rows == one full load
    (the reference's scheduler-loop semantics, SURVEY.md §2.8 T5)."""
    p = str(tmp_path / "target")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    first_half = o.filter(F.col("o_orderdate") < "1998-01-01")
    scale.incremental_cycle(
        spark, first_half, p, "o_orderdate", ["o_orderkey"], [F.col("o_totalprice")]
    )
    final = scale.incremental_cycle(
        spark, o, p, "o_orderdate", ["o_orderkey"], [F.col("o_totalprice")]
    )
    assert final.count() == o.count()
    assert final.exceptAll(o).count() == 0


def test_incremental_cycle_idempotent(spark, tmp_path):
    p = str(tmp_path / "target")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    scale.incremental_cycle(spark, o, p, "o_orderdate", ["o_orderkey"], ["o_orderdate"])
    again = scale.incremental_cycle(
        spark, o, p, "o_orderdate", ["o_orderkey"], ["o_orderdate"]
    )
    assert again.count() == o.count()


def test_approx_stats_accuracy(spark):
    catalog_queries()
    rows = CATALOG["approx_stats"].fn(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert {r.l_returnflag for r in rows} == set(exact)
    for r in rows:
        # the query itself carries the within-5% sketch checks as flags
        assert r.n_orders_exact == exact[r.l_returnflag]
        assert r.approx_orders_ok, r
        assert r.approx_median_ok, r

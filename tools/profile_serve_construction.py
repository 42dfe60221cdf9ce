#!/usr/bin/env python
"""Decompose a serving query's wall time into CONSTRUCTION (driver-side
plan building, py4j round trips) vs EXECUTION (Spark jobs), per repeat
(optimization round 13, guide §7.3 — driver time IS the serving
bottleneck at fixture scale).

For each named query: run the query fn (construction) and time it,
then time the noop-sink action (execution), three repeats. Also counts
py4j COMMANDS issued during construction by wrapping the gateway
client's send_command (a direct proxy for driver<->JVM round trips).

Usage:
  PYTHONPATH=. python tools/profile_serve_construction.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cultural_heritage_bigdata_project_spark.plans.catalog import (
        CATALOG,
        catalog_queries,
    )
    from cultural_heritage_bigdata_project_spark.session import get_spark

    spark = get_spark(app_name="profile_serve_construction")
    catalog_queries()
    spark.range(100_000_000).selectExpr("sum(id)").collect()

    # count py4j commands by wrapping the gateway client
    client = spark.sparkContext._gateway._gateway_client
    counter = {"n": 0}
    orig = client.send_command

    def counted(*a, **k):
        counter["n"] += 1
        return orig(*a, **k)

    client.send_command = counted

    for name in names:
        fn = CATALOG[name].fn
        rows = []
        for rep in range(3):
            c0 = counter["n"]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            c1 = counter["n"]
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            rows.append(
                {
                    "construct_sec": round(t1 - t0, 3),
                    "action_sec": round(t2 - t1, 3),
                    "construct_py4j": c1 - c0,
                }
            )
        print(json.dumps({"query": name, "repeats": rows}), flush=True)


if __name__ == "__main__":
    main()

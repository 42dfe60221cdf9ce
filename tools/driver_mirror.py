#!/usr/bin/env python
"""Local mirror of the round driver's correctness gate.

Runs every public catalog entry (the driver contract's ``queries()``)
against its DuckDB oracle at the driver's scale factor and prints one
line per entry plus a summary — the pre-flight check before a round
ends.

Run: PYTHONPATH=. python tools/driver_mirror.py [sf_dir]
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from cultural_heritage_bigdata_project_spark.plans.catalog import catalog_entries
    from cultural_heritage_bigdata_project_spark.session import get_spark
    from tests import parity

    spark = get_spark(app_name="driver_mirror", shuffle_partitions=32)
    duck = parity.duckdb_con(sf)
    fails: list[str] = []
    t0 = time.time()
    for name, q in catalog_entries().items():
        t1 = time.time()
        try:
            spdf = q.fn(spark, sf).toPandas()
            if q.oracle is None:
                print(f"{name}: rows-only {len(spdf)} ({time.time()-t1:.1f}s)")
                continue
            opdf = duck.execute(q.oracle).df()
            parity.compare(spdf, opdf, name=name)
            print(f"{name}: OK {len(spdf)} rows ({time.time()-t1:.1f}s)")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"{name}: FAIL {str(e)[:300]}")
    n = len(catalog_entries())
    print(f"--- {n - len(fails)}/{n} green in {time.time()-t0:.0f}s; failures: {fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Two-point scale sweep over the ENTIRE query catalog (round-4
verdict #5): run every registered per-operator query at the base
fixture and at the 5x-amplified directory (tools/amplify_docs.py
--full), publish per-query medians and the amp/base ratio, and flag
queries whose ratio exceeds the linear-ish bar.

Usage:
  PYTHONPATH=. python tools/scale_sweep.py [BASE_DIR AMP_DIR [REPEATS [NAME...]]]

Trailing NAME args restrict the sweep to those queries (incremental
re-measure after adding queries); with names given, results MERGE into
an existing $SPARK_GRAFT_SWEEP_OUT file instead of replacing it.

Writes JSON to $SPARK_GRAFT_SWEEP_OUT (default /tmp/scale_sweep.json)
and prints one line per query. Interpreting ratios: a 5x input with a
flat ratio means fixed scheduling overhead dominates (healthy at this
size); ratio <= ~2 means sublinear per-row cost; ratio > 2 on a
>=0.5s-base query is worth a plan audit (superlinear stage, missing
pushdown, or a collect hiding somewhere).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from cultural_heritage_bigdata_project_spark.plans.catalog import (
    CATALOG,
    catalog_queries,
)
from cultural_heritage_bigdata_project_spark.session import get_spark


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amp = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1_x5"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    only = set(sys.argv[4:])
    spark = get_spark(app_name="scale_sweep")
    catalog_queries()
    unknown = only - set(CATALOG)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")
    spark.range(100_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in sorted(only or CATALOG):
        row: dict = {}
        for tag, d in [("base", base), ("amp", amp)]:
            samples: list[float] = []
            for _ in range(reps):
                t0 = time.perf_counter()
                try:
                    CATALOG[name].fn(spark, d).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as e:  # noqa: BLE001 - sweep must finish
                    row[f"{tag}_err"] = f"{type(e).__name__}: {e}"[:200]
                    samples = []
                    break
                samples.append(round(time.perf_counter() - t0, 3))
            if samples:
                row[tag] = round(statistics.median(samples), 3)
        if row.get("base") and row.get("amp"):
            row["ratio"] = round(row["amp"] / row["base"], 2)
        out[name] = row
        print(name, row, flush=True)

    dest = os.environ.get("SPARK_GRAFT_SWEEP_OUT", "/tmp/scale_sweep.json")
    if only and os.path.exists(dest):
        with open(dest, encoding="utf-8") as f:
            out = {**json.load(f), **out}
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    flagged = sorted(
        n
        for n, r in out.items()
        if r.get("ratio", 0) > 2.0 and r.get("base", 0) >= 0.5
    )
    print(f"\nwrote {dest}; flagged (ratio>2, base>=0.5s): {flagged}")


if __name__ == "__main__":
    main()

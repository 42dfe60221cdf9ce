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
and prints one line per query. Verdicts are COMPUTED, never
hand-written (round-8 VERDICT item 4 — the r8 artifact asserted
"sublinear" over a 6.03 ratio at 5x): per query the sweep records the
output ROW COUNTS at both points and derives

- ratio            amp_time / base_time
- rows_ratio       amp_rows / base_rows (output growth)
- per_output_ratio ratio / rows_ratio — normalizes operators whose
                   OUTPUT grows with duplication (dedup-removal lists,
                   duplicate-span pairs: a duplication-heavy amplified
                   corpus legitimately makes them emit more rows)
- sublinear        ratio < amplification (time grew slower than input)
- superlinear_flag sublinear is false AND per_output_ratio also
                   exceeds the amplification — genuinely superlinear
                   work per row of input+output, the thing that needs
                   a plan audit

$SPARK_GRAFT_SWEEP_AMP (default 5) names the amplification factor.
Interpreting ratios at this size: a flat ratio means fixed scheduling
overhead dominates (healthy); ratio <= ~2 is sublinear per-row cost.
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

    amp_factor = float(os.environ.get("SPARK_GRAFT_SWEEP_AMP", "5"))
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
                # output size at this point (untimed): the normalizer
                # for operators whose output grows with duplication
                try:
                    row[f"{tag}_rows"] = CATALOG[name].fn(spark, d).count()
                except Exception as e:  # noqa: BLE001 - sweep must finish
                    row[f"{tag}_rows_err"] = f"{type(e).__name__}: {e}"[:200]
        if row.get("base") and row.get("amp"):
            row["ratio"] = round(row["amp"] / row["base"], 2)
            # COMPUTED verdicts (round-8 VERDICT item 4)
            row["sublinear"] = row["ratio"] < amp_factor
            if row.get("base_rows") and row.get("amp_rows"):
                rows_ratio = row["amp_rows"] / row["base_rows"]
                row["rows_ratio"] = round(rows_ratio, 2)
                if rows_ratio > 1:
                    row["per_output_ratio"] = round(
                        row["ratio"] / rows_ratio, 2
                    )
            row["superlinear_flag"] = not row["sublinear"] and (
                row.get("per_output_ratio", row["ratio"]) >= amp_factor
            )
        out[name] = row
        print(name, row, flush=True)

    dest = os.environ.get("SPARK_GRAFT_SWEEP_OUT", "/tmp/scale_sweep.json")
    if only and os.path.exists(dest):
        with open(dest, encoding="utf-8") as f:
            prior = json.load(f)
            prior.pop("_summary", None)
            out = {**prior, **out}
    superlinear = sorted(
        n for n, r in out.items() if r.get("superlinear_flag")
    )
    watch = sorted(
        n
        for n, r in out.items()
        if not r.get("sublinear", True) and not r.get("superlinear_flag")
    )
    out["_summary"] = {
        "amplification": amp_factor,
        "queries": len([n for n in out if not n.startswith("_")]),
        "sublinear": len(
            [n for n, r in out.items() if r.get("sublinear") is True]
        ),
        # time grew faster than input but within output growth: the
        # operator's ANSWER got bigger (duplication-heavy amp corpus),
        # not its per-row cost
        "output_bound_watch": watch,
        "superlinear": superlinear,
        "_note": "all fields computed by tools/scale_sweep.py; "
        "sublinear = time_ratio < amplification, per_output_ratio "
        "divides out output-row growth",
    }
    with open(dest, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\nwrote {dest}; superlinear: {superlinear}; watch: {watch}")


if __name__ == "__main__":
    main()

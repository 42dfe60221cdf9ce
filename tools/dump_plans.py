"""Dump `.explain("formatted")` of named bench queries to plans/<round>/
WITHOUT running measured actions (construction may still run the bounded
collects a serving query performs while building its page).

Usage: PYTHONPATH=. python tools/dump_plans.py --round r13 --suffix before q1 q2 ...
"""
from __future__ import annotations

import argparse
import contextlib
import io
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--round", default="r13", dest="round_dir")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from cultural_heritage_bigdata_project_spark.plans.catalog import (
        CATALOG,
        catalog_queries,
    )
    from cultural_heritage_bigdata_project_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    catalog_queries()
    import bench

    qs = {name: q.fn for name, q in CATALOG.items()}
    qs.update(bench.BENCH_EXTRA)
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.round_dir)
    os.makedirs(plans_dir, exist_ok=True)
    for name in args.queries:
        fn = qs[name]
        df = fn(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(plans_dir, f"{name}_{args.suffix}.txt")
        with open(out, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {out} ({len(buf.getvalue().splitlines())} lines)")


if __name__ == "__main__":
    main()

"""Per-query job-level profiler (optimization round 12, guide §1).

For each named bench query: run it twice through the noop sink (first
run warms fixtures/codegen, second is measured), label every run with
setJobDescription, then pull the per-job wall times and per-stage
metrics (input bytes/records, shuffle read/write, task count) from the
Spark UI REST API. This decomposes a query's wall time into its
constituent Spark JOBS — the quickest way to see whether a 2s query is
one slow stage or twelve 150ms scheduling-bound jobs — without
eyeballing the UI.

Also writes `plans/r12/<query>_before.txt` (or `_after.txt` with
--suffix after) holding `.explain("formatted")` for the judge.

Usage:
  PYTHONPATH=. python tools/profile_queries.py [--suffix before] [--sf DIR] q1 q2 ...
  PYTHONPATH=. python tools/profile_queries.py --all     # every bench query
Prints one JSON line per query:
  {"query": name, "wall_sec": t, "n_jobs": n,
   "jobs": [{"desc":..., "sec":..., "stages":[{...}]}]}
"""

from __future__ import annotations

import argparse
import json
import os
import time
import urllib.request


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("--round", default="r12", dest="round_dir",
                    help="plans/<round> output directory (default r12)")
    ap.add_argument("--reps", type=int, default=1,
                    help="measured reps after the warm run (min over reps)")
    args = ap.parse_args()

    from cultural_heritage_bigdata_project_spark.plans.catalog import (
        CATALOG,
        catalog_queries,
    )
    from cultural_heritage_bigdata_project_spark.session import get_spark

    spark = get_spark(
        app_name="profile_queries",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    catalog_queries()
    import bench

    qs = {name: q.fn for name, q in CATALOG.items()}
    qs.update(bench.BENCH_EXTRA)
    names = bench.BENCH_QUERIES if args.all else args.queries
    base = "http://localhost:4099"

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.round_dir)
    os.makedirs(plans_dir, exist_ok=True)

    # warmup (same as bench.py)
    spark.range(100_000_000).selectExpr("sum(id)").collect()

    app_id = spark.sparkContext.applicationId
    results = []
    for name in names:
        if name not in qs:
            print(json.dumps({"query": name, "error": "unknown"}))
            continue
        fn = qs[name]
        # warm run (fixtures, codegen)
        df = fn(spark, args.sf)
        df.write.format("noop").mode("overwrite").save()
        if not args.no_plans:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(
                    plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        best = None
        for rep in range(max(1, args.reps)):
            jobs_before = {j["jobId"] for j in _api(base, f"applications/{app_id}/jobs")}
            spark.sparkContext.setJobDescription(f"profile:{name}:{rep}")
            t0 = time.perf_counter()
            df2 = fn(spark, args.sf)
            df2.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            jobs = [j for j in _api(base, f"applications/{app_id}/jobs")
                    if j["jobId"] not in jobs_before]
            if best is None or wall < best[0]:
                best = (wall, jobs)
        wall, jobs = best
        job_rows = []
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            st = j.get("submissionTime"), j.get("completionTime")
            dur = None
            if all(st):
                from datetime import datetime

                def _p(s):
                    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")
                dur = ( _p(st[1]) - _p(st[0])).total_seconds()
            stages = []
            for sid in j.get("stageIds", []):
                try:
                    sinfo = _api(base, f"applications/{app_id}/stages/{sid}")
                    for att in sinfo:
                        if att.get("status") == "SKIPPED":
                            continue
                        stages.append({
                            "stage": sid,
                            "tasks": att.get("numCompleteTasks"),
                            "input_mb": round(att.get("inputBytes", 0) / 1e6, 2),
                            "in_rec": att.get("inputRecords", 0),
                            "sh_read_mb": round(att.get("shuffleReadBytes", 0) / 1e6, 2),
                            "sh_write_mb": round(att.get("shuffleWriteBytes", 0) / 1e6, 2),
                            "ms": (att.get("executorRunTime", 0)),
                        })
                except Exception:
                    pass
            job_rows.append({
                "job": j["jobId"],
                "sec": round(dur, 3) if dur is not None else None,
                "desc": (j.get("description") or j.get("name", ""))[:90],
                "stages": stages,
            })
        rec = {
            "query": name,
            "wall_sec": round(wall, 3),
            "n_jobs": len(jobs),
            "jobs": job_rows,
        }
        results.append(rec)
        print(json.dumps(rec))
    total = sum(r["wall_sec"] for r in results)
    print(json.dumps({"_total_wall_sec": round(total, 3), "n": len(results)}))


if __name__ == "__main__":
    main()

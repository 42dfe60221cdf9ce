"""Batch-hybrid amortization curve (round-12 verdict item 2).

The round-11 finding: at the bench fixture's |Q|=2 the batch hybrid
measured ~1.1-1.2x the cost of running the two single-query hybrids
SEQUENTIALLY — i.e. the fixed two-index-read cost had not yet amortized,
while the docstring's "two index reads total, regardless of |Q|" read
more favorably than the arithmetic supported. This script produces the
evidence: wall time of `hybrid_rrf_search_all` at |Q| in {1, 2, 8, 32}
over the SAME persisted sf0.1 indexes the benchmark serves, against the
measured single-query unit cost — per-query batch time must FALL with
|Q| as the index reads amortize, or the claim stays corrected.

Usage:  PYTHONPATH=. python tools/hybrid_batch_curve.py [sf_dir]
Prints one JSON line:
  {"single_sec": s, "batch": {"1": t1, "2": t2, "8": t8, "32": t32},
   "per_query": {...}, "amortization_32_vs_single": r}
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from cultural_heritage_bigdata_project_spark.operators import similarity
from cultural_heritage_bigdata_project_spark.plans.queries_text import (
    _text_index_root,
)
from cultural_heritage_bigdata_project_spark.plans.queries_vector import (
    _ann_index_root,
    _query_list,
)
from cultural_heritage_bigdata_project_spark.session import get_spark

TERM_POOL = [
    ["merge", "spark", "window"],
    ["vector", "filter", "scan"],
    ["shuffle", "broadcast", "join"],
    ["stream", "batch", "state"],
    ["index", "probe", "list"],
    ["token", "corpus", "hash"],
    ["schema", "column", "cast"],
    ["commit", "version", "feed"],
]


def _queries(spark, sf_dir, n):
    rows = [
        (f"q{i:02d}", TERM_POOL[i % len(TERM_POOL)],
         _query_list(spark, sf_dir, i % 40))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "q_id string, terms array<string>, embedding array<double>"
    )


def _median(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="hybrid_batch_curve")
    t_root = _text_index_root(spark, sf_dir)
    a_root = _ann_index_root(spark, sf_dir)

    def run_batch(n):
        q = _queries(spark, sf_dir, n)
        return lambda: similarity.hybrid_rrf_search_all(
            spark, t_root, a_root, q, k=10, top_n=50,
            n_probe=4, shortlist=200,
        ).collect()

    def run_single():
        return similarity.hybrid_rrf_search_indexed(
            spark, t_root, a_root, TERM_POOL[0],
            _query_list(spark, sf_dir, 0), k=10, top_n=50,
            n_probe=4, shortlist=200,
        ).collect()

    # warm the fixtures + JVM before timing
    run_batch(1)()
    run_single()

    single = _median(run_single)
    batch = {}
    for n in (1, 2, 8, 32):
        batch[str(n)] = round(_median(run_batch(n)), 3)
    per_query = {k: round(v / int(k), 3) for k, v in batch.items()}
    out = {
        "single_sec": round(single, 3),
        "batch": batch,
        "per_query": per_query,
        "amortization_32_vs_single": round(
            per_query["32"] / single, 3
        ) if single else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

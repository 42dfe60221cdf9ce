"""text_grouped_search fixed-cost probe (round-12 verdict item 5).

Round-11 profile: the 3.15s grouped lexical page carried ~1.5s of a
PLAIN doclen component read — per-file scheduling overhead across the
bench fixture's 48+ small multi-generation files — with the claim "at
production file sizes that fixed cost amortizes" left as an assertion.
This script turns it into a number: measure the grouped page and its
label-lookup / doclen components on the multi-generation fixture, run
ONE `text_index_compact` (folding the generations back into per-bucket
base segments — the periodic maintenance a production deployment runs
anyway), and re-measure. Results must be IDENTICAL pre/post (compaction
is a rewrite); only the fixed file-count cost may move.

Usage:  PYTHONPATH=. python tools/text_grouped_compaction_probe.py [sf_dir]
Prints one JSON line with pre/post medians per component.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import text_index, txn
from cultural_heritage_bigdata_project_spark.plans.queries_text import (
    _text_index_root,
)
from cultural_heritage_bigdata_project_spark.session import get_spark

TERMS = ["merge", "spark", "window"]


def _median(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _measure(spark, root):
    grouped = lambda: text_index.text_index_search_grouped(  # noqa: E731
        spark, root, TERMS, None, "lang", k_groups=3, group_size=2,
        fetch_k=15,
    ).collect()
    page_ids = [
        r["doc_id"]
        for r in text_index.text_index_search(
            spark, root, TERMS, top_k=15
        ).collect()
    ]
    lookup = lambda: text_index.text_index_retrieve_payload(  # noqa: E731
        spark, root, page_ids, payload_out=["lang"]
    ).collect()
    doclen_plain = lambda: txn.read_version(  # noqa: E731
        spark, root, subdir="doclen"
    ).agg(F.count(F.lit(1))).collect()
    rows = grouped()
    return {
        "grouped_sec": round(_median(grouped), 3),
        "label_lookup_sec": round(_median(lookup), 3),
        "doclen_plain_read_sec": round(_median(doclen_plain), 3),
    }, rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="text_grouped_compaction_probe")
    root = _text_index_root(spark, sf_dir)
    desc0 = text_index.text_index_describe(root)
    pre, rows_pre = _measure(spark, root)
    text_index.text_index_compact(spark, root)
    desc1 = text_index.text_index_describe(root)
    post, rows_post = _measure(spark, root)
    assert sorted(map(tuple, rows_pre)) == sorted(map(tuple, rows_post)), (
        "compaction changed the grouped page"
    )
    print(json.dumps({
        "pre": pre,
        "post": post,
        "generations_pre": {
            "delta": desc0["n_delta_segments"],
            "dl_delta": desc0["n_dl_delta_segments"],
            "payload_delta": desc0["n_payload_delta_segments"],
        },
        "generations_post": {
            "delta": desc1["n_delta_segments"],
            "dl_delta": desc1["n_dl_delta_segments"],
            "payload_delta": desc1["n_payload_delta_segments"],
        },
    }))


if __name__ == "__main__":
    main()

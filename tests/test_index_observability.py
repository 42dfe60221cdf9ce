"""Collection-info (describe) APIs for both persisted indexes — the
Qdrant get-collection analog — and the shared search-groups tail
(`windows.group_top_k`) serving the LEXICAL modality. Metadata-only:
describe must never launch a scan, so its fields come from the
manifest the commits already maintain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import (
    ann_index,
    text,
    text_index,
)
from cultural_heritage_bigdata_project_spark.sources.tables import load_table

from .conftest import SF_DIR


def test_ann_describe_tracks_lifecycle(spark, tmp_path):
    root = str(tmp_path / "idx")
    base = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") != 0)
    ann_index.build_ann_index(spark, base, root, n_lists=16, m=8, n_codes=16)
    d0 = ann_index.ann_index_describe(spark, root, with_count=True)
    assert (d0["n_lists"], d0["m"], d0["n_codes"]) == (16, 8, 16)
    assert d0["n_delta_segments"] == 0 and d0["pruned_serving"]
    assert d0["n_points"] == base.count()
    assert 0 < d0["n_list_segments"] <= 16  # only non-empty lists persist

    upd = base.filter(F.col("vec_id") % 7 == 0).withColumn(
        "embedding", F.reverse(F.col("embedding"))
    )
    ann_index.ann_index_upsert(spark, upd, root)
    d1 = ann_index.ann_index_describe(spark, root)
    assert d1["n_delta_segments"] == 1  # the compaction-pressure signal
    assert d1["epoch"] > d0["epoch"]
    assert "n_points" not in d1  # the scan field is opt-in

    ann_index.ann_index_compact(spark, root)
    d2 = ann_index.ann_index_describe(spark, root, with_count=True)
    assert d2["n_delta_segments"] == 0 and d2["pruned_serving"]
    assert d2["n_points"] == d0["n_points"]


def test_text_describe_is_metadata_only_and_exact(spark, tmp_path, monkeypatch):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    root = str(tmp_path / "tix")
    text_index.build_text_index(spark, docs, root, n_buckets=16)

    # no Spark job may run: describe reads the manifest, nothing else
    from cultural_heritage_bigdata_project_spark.operators import txn

    def boom(*a, **k):
        raise AssertionError("describe must not read segments")

    monkeypatch.setattr(txn, "_read_segment_union", boom)
    d0 = text_index.text_index_describe(root)
    monkeypatch.undo()

    n = docs.count()
    assert d0["n_docs"] == n and d0["n_buckets"] == 16
    assert d0["avgdl"] == d0["sum_dl"] / n
    assert d0["n_delta_segments"] == 0 and d0["pruned_serving"]

    text_index.text_index_delete(spark, [0, 1], root)
    d1 = text_index.text_index_describe(root)
    assert d1["n_docs"] == n - 2  # exact stats corrected at the commit
    assert d1["n_dl_delta_segments"] == 1
    assert d1["epoch"] > d0["epoch"]


def test_grouped_bm25_matches_manual_grouping(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    root = str(tmp_path / "tix")
    text_index.build_text_index(spark, docs, root)
    terms = ["merge", "spark", "window"]
    groups = docs.select("doc_id", (F.col("doc_id") % 5).alias("grp"))

    got = [
        tuple(r)
        for r in text_index.text_index_search_grouped(
            spark, root, terms, groups, "grp",
            k_groups=3, group_size=2, fetch_k=20,
        ).collect()
    ]

    flat = text.bm25_search(docs, terms, top_k=20).collect()
    per: dict[int, list] = {}
    for r in sorted(flat, key=lambda r: (-r["bm25"], r["doc_id"])):
        per.setdefault(r["doc_id"] % 5, []).append(r)
    best = sorted(
        ((v[0]["bm25"], v[0]["doc_id"], g) for g, v in per.items()),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    want = []
    for rank, (_, _, g) in enumerate(best, start=1):
        for i, r in enumerate(per[g][:2], start=1):
            want.append((g, rank, i, r["doc_id"], r["bm25"]))
    assert got == want


def test_bucket_stats_find_the_hot_term_bucket(spark, tmp_path):
    """A term that explodes in document frequency after corpus growth
    must surface as its md5 bucket leading the skew stats — the signal
    to rebuild with it stoplisted."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    hot = spark.range(3000).select(
        (F.col("id") + 100_000).alias("doc_id"),
        F.concat(F.lit("hotterm filler"), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    root = str(tmp_path / "tix")
    text_index.build_text_index(spark, docs.unionByName(hot), root, n_buckets=16)

    st = text_index.text_index_bucket_stats(root)
    assert st["n_buckets"] == 16 and st["n_base_buckets"] <= 16
    assert st["skew_ratio"] > 1.5  # the injected hot term shows
    assert st["hottest_buckets"][0] == text_index._bucket_py("hotterm", 16)
    # footer counts are exact: they sum to the full posting row count
    total = sum(st["bucket_rows"].values())
    assert total == st["total_base_rows"] > 0
    assert st["delta_rows"] == 0

    # upserts land in the delta tail, visible without a scan
    text_index.text_index_upsert(
        spark,
        docs.filter(F.col("doc_id") < 5).withColumn(
            "text", F.concat(F.col("text"), F.lit(" newword"))
        ),
        root,
    )
    st2 = text_index.text_index_bucket_stats(root)
    assert st2["delta_rows"] > 0
    assert st2["bucket_rows"] == st["bucket_rows"]  # base untouched

    # the prescribed fix flattens the layout: rebuild with the hot
    # term stoplisted
    text_index.build_text_index(
        spark, docs.unionByName(hot), root, n_buckets=16,
        stop_terms=["hotterm"],
    )
    st3 = text_index.text_index_bucket_stats(root)
    assert st3["skew_ratio"] < st["skew_ratio"]
    assert "hotterm" in st3["stop_terms"]


def test_text_payload_filtered_serving(spark, tmp_path):
    """Payload-on-doc for the lexical index: facet columns stored in
    the doclen component, filtered at serve time from a doclen-only
    read — the reference dashboard's filter-by-provider flow with no
    join to the corpus."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    root = str(tmp_path / "tix")
    text_index.build_text_index(
        spark, docs, root, payload_cols=["lang", "source"]
    )
    assert text_index.text_index_describe(root)["payload_cols"] == [
        "lang",
        "source",
    ]
    terms = ["merge", "spark", "window"]

    got = [
        tuple(r)
        for r in text_index.text_index_search(
            spark, root, terms, top_k=10, payload_filter="lang = 'en'"
        ).collect()
    ]
    want = [
        tuple(r)
        for r in text_index.text_index_search(
            spark, root, terms, top_k=10,
            allowed_ids=docs.filter(F.col("lang") == "en").select("doc_id"),
        ).collect()
    ]
    assert got == want and len(got) > 0

    # composition: payload_filter AND allowed_ids intersect
    evens = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    both = [
        r["doc_id"]
        for r in text_index.text_index_search(
            spark, root, terms, top_k=50,
            allowed_ids=evens, payload_filter="lang = 'en'",
        ).collect()
    ]
    lang = {r["doc_id"]: r["lang"] for r in docs.collect()}
    assert all(d % 2 == 0 and lang[d] == "en" for d in both)

    # enforcement + payload update via upsert + tombstone interplay
    with pytest.raises(ValueError, match="lang"):
        text_index.text_index_upsert(
            spark, docs.select("doc_id", "text").limit(1), root
        )
    moved = docs.filter(F.col("doc_id") == both[0]).withColumn(
        "lang", F.lit("xx")
    )
    text_index.text_index_upsert(spark, moved, root)
    after = [
        r["doc_id"]
        for r in text_index.text_index_search(
            spark, root, terms, top_k=50, payload_filter="lang = 'xx'"
        ).collect()
    ]
    assert after == [both[0]]
    text_index.text_index_delete(spark, [both[0]], root)
    gone = text_index.text_index_search(
        spark, root, terms, top_k=50, payload_filter="lang = 'xx'"
    ).collect()
    assert gone == []

    # grouped by a STORED payload column == grouped by an explicit map
    g_stored = text_index.text_index_search_grouped(
        spark, root, terms, groups=None, group_col="source",
        k_groups=3, group_size=2, fetch_k=20,
    ).collect()
    g_explicit = text_index.text_index_search_grouped(
        spark, root, terms, groups=docs.select("doc_id", "source"),
        group_col="source", k_groups=3, group_size=2, fetch_k=20,
    ).collect()
    assert [tuple(r) for r in g_stored] == [tuple(r) for r in g_explicit]


def test_batch_bm25_payload_filter_matches_single(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang"
    )
    root = str(tmp_path / "tix")
    text_index.build_text_index(spark, docs, root, payload_cols=["lang"])
    qs = spark.createDataFrame(
        [(1, ["merge", "spark"]), (2, ["window"])],
        "q_id int, terms array<string>",
    )
    got = text_index.text_index_search_all(
        spark, root, qs, top_k=5, payload_filter="lang = 'en'"
    ).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["q_id"], []).append(
            (r["doc_id"], r["bm25"], r["n_terms_hit"])
        )
    for qid, terms in [(1, ["merge", "spark"]), (2, ["window"])]:
        want = [
            (r["doc_id"], r["bm25"], r["n_terms_hit"])
            for r in text_index.text_index_search(
                spark, root, terms, top_k=5, payload_filter="lang = 'en'"
            ).collect()
        ]
        assert by_q.get(qid, []) == want and want

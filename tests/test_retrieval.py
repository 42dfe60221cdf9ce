"""Hybrid RRF retrieval (operators/similarity.hybrid_rrf_search) and
exact-substring dedup removal (operators/text.remove_duplicate_spans).

Reference analog: the reference serves lexical filters and Qdrant kNN
as SEPARATE surfaces (streamlit/app/app.py:208-264 vs 331-349) and
dedups by first-seen order (deduplicate_from_qdrant.py:183-186); the
engine fuses the retrievers deterministically and removes duplicated
spans with an order-independent canonical rule. DuckDB value parity is
pinned by the hybrid_rrf_search / substring_dedup_clean catalog
oracles; these tests pin the SEMANTICS."""

from __future__ import annotations

from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import similarity, text
from cultural_heritage_bigdata_project_spark.sources.tables import load_table

from .conftest import SF_DIR

TERMS = ["merge", "spark", "window"]


def _qvec(spark):
    row = (
        load_table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return F.array(*[F.lit(float(x)) for x in row[0]]).cast("array<double>")


def test_rrf_scores_consistent_with_branch_ranks(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings")
    qv = _qvec(spark)
    out = similarity.hybrid_rrf_search(
        docs, emb, TERMS, qv, k=10, top_n=50
    ).collect()
    assert len(out) == 10

    lex_ids = [
        r["doc_id"]
        for r in text.bm25_search(docs, TERMS, top_k=50).collect()
    ]
    sem_ids = [
        r["vec_id"]
        for r in similarity.knn_brute_force(emb, qv, k=50).collect()
    ]
    lex_rank = {d: i + 1 for i, d in enumerate(lex_ids)}
    sem_rank = {d: i + 1 for i, d in enumerate(sem_ids)}
    for r in out:
        did = r["doc_id"]
        # every result came from at least one branch's top-50
        assert did in lex_rank or did in sem_rank
        assert r["lex_rank"] == lex_rank.get(did, 0)
        assert r["sem_rank"] == sem_rank.get(did, 0)
        want = (1.0 / (60.0 + r["lex_rank"]) if r["lex_rank"] else 0.0) + (
            1.0 / (60.0 + r["sem_rank"]) if r["sem_rank"] else 0.0
        )
        assert r["rrf_score"] == want
    # fused order is monotone in the score with id tiebreak
    scores = [(-r["rrf_score"], r["doc_id"]) for r in out]
    assert scores == sorted(scores)


def test_rrf_both_branch_hit_outranks_single_branch(spark):
    """A candidate in BOTH top lists at moderate rank beats one that is
    rank-1 in a single list — the diversification property RRF exists
    for (1/61 < 1/(60+r1) + 1/(60+r2) whenever r1,r2 <= 59)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings")
    out = similarity.hybrid_rrf_search(
        docs, emb, TERMS, _qvec(spark), k=10, top_n=50
    ).collect()
    both = [r for r in out if r["lex_rank"] and r["sem_rank"]]
    single = [r for r in out if not (r["lex_rank"] and r["sem_rank"])]
    if both and single:
        assert max(r["rrf_score"] for r in both) > max(
            r["rrf_score"] for r in single
        )


def test_remove_duplicate_spans_canonical_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h unique tail one"),
            (2, "prefix two a b c d e f g h and more"),
            (3, "totally different words here nothing shared at all"),
            (4, "a b c d e f g h"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text.remove_duplicate_spans(docs, n=8, min_count=2).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # every doc present, changed or not
    # canonical (min doc, pos) occurrence survives untouched
    assert out[1]["n_removed_tokens"] == 0
    assert out[1]["clean_text"] == "a b c d e f g h unique tail one"
    # later occurrences lose exactly the span's tokens
    assert out[2]["n_removed_tokens"] == 8
    assert out[2]["clean_text"] == "prefix two and more"
    # untouched doc
    assert out[3]["n_removed_tokens"] == 0
    # a doc that is entirely the duplicated span empties out
    assert out[4]["n_removed_tokens"] == 8
    assert out[4]["clean_text"] == ""


def test_remove_duplicate_spans_token_conservation(spark):
    """kept + removed == total tokens for every fixture doc, and the
    cleaned text's token count equals the kept count."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    out = text.remove_duplicate_spans(docs, n=8, min_count=2)
    bad = out.filter(
        F.size(F.split("clean_text", " +"))
        - F.when(F.col("clean_text") == "", 1).otherwise(0)
        != F.col("n_tokens") - F.col("n_removed_tokens")
    ).count()
    assert bad == 0
    # the fixture corpus actually contains duplicated 8-gram spans
    assert out.filter(F.col("n_removed_tokens") > 0).count() > 0


def test_remove_duplicate_spans_overlapping_spans_union(spark):
    """Overlapping duplicated spans remove the UNION of covered
    positions, not double-count: a 9-token repeat contains two
    overlapping 8-gram spans; the non-canonical copy loses 9 tokens."""
    nine = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    docs = spark.createDataFrame(
        [(1, nine + " alpha"), (2, "beta " + nine)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text.remove_duplicate_spans(docs, n=8, min_count=2).collect()
    }
    assert out[1]["n_removed_tokens"] == 0
    assert out[2]["n_removed_tokens"] == 9
    assert out[2]["clean_text"] == "beta"


def test_mmr_rerank_matches_reference_greedy(spark):
    """Referee test (numpy reimplementation, like the BPE trainer): the
    operator's selection equals an independent greedy over the same
    round-6 similarities, the first pick is the plain cosine argmax,
    and diversification provably changed the order vs plain top-k."""
    import numpy as np

    emb = load_table(spark, SF_DIR, "embeddings")
    q_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in q_row[0]]
    base = emb.filter(F.col("vec_id") != 0)
    out = similarity.mmr_rerank(base, q, k=10, lambda_=0.5, top_n=50).collect()
    assert [r["mmr_rank"] for r in out] == list(range(1, 11))

    # independent reference: collect the same shortlist and re-run greedy
    short = similarity.knn_brute_force(base, _qvec(spark), k=50).collect()
    ids = [r["vec_id"] for r in short]
    rel = {r["vec_id"]: r["cosine_sim"] for r in short}
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in base.filter(F.col("vec_id").isin(ids)).collect()
    }
    for v in vecs:
        vecs[v] = vecs[v] / np.sqrt((vecs[v] ** 2).sum())
    chosen = []
    pool = sorted(ids)
    for _ in range(10):
        best, best_s = None, None
        for i in pool:
            pen = max(
                (round(float(vecs[i] @ vecs[j]), 6) for j in chosen),
                default=0.0,
            )
            s = 0.5 * rel[i] - 0.5 * pen
            if best_s is None or s > best_s or (s == best_s and i < best):
                best, best_s = i, s
        chosen.append(best)
        pool.remove(best)
    assert [r["vec_id"] for r in out] == chosen
    # first pick is the relevance argmax (ties by id)
    top1 = short[0]["vec_id"]
    assert out[0]["vec_id"] == top1 and out[0]["cosine_sim"] == rel[top1]
    # low lambda diversifies: selection differs from the plain top-10
    plain = [r["vec_id"] for r in short[:10]]
    assert [r["vec_id"] for r in out] != plain


def test_mmr_rerank_lambda_one_is_plain_topk(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in q_row[0]]
    base = emb.filter(F.col("vec_id") != 0)
    out = [
        r["vec_id"]
        for r in similarity.mmr_rerank(base, q, k=10, lambda_=1.0).collect()
    ]
    plain = [
        r["vec_id"]
        for r in similarity.knn_brute_force(base, _qvec(spark), k=10).collect()
    ]
    assert out == plain


def test_mmr_rerank_empty_candidates(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in q_row[0]]
    empty = emb.filter(F.col("vec_id") < 0)
    out = similarity.mmr_rerank(empty, q, k=10)
    assert out.count() == 0
    assert out.columns == ["mmr_rank", "vec_id", "cosine_sim", "mmr_score"]


def test_hybrid_indexed_matches_scan_hybrid(spark, tmp_path):
    """The fully-index-served hybrid (persisted text index + persisted
    ANN index, zero corpus scans) equals the scan-based hybrid when the
    ANN probe is exhaustive (all lists, covering shortlist) — the
    lexical branch is bit-equal by construction, so any divergence
    could only come from the semantic branch's recall knobs."""
    from cultural_heritage_bigdata_project_spark.operators import (
        ann_index,
        text_index,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings")
    troot = str(tmp_path / "tix")
    aroot = str(tmp_path / "ann")
    text_index.build_text_index(spark, docs, troot)
    ann_index.build_ann_index(spark, emb, aroot, n_lists=8)
    q_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in q_row[0]]

    got = similarity.hybrid_rrf_search_indexed(
        spark, troot, aroot, TERMS, q,
        k=10, top_n=50, n_probe=8, shortlist=1000,
    ).collect()
    want = similarity.hybrid_rrf_search(
        docs, emb, TERMS, _qvec(spark), k=10, top_n=50
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_hybrid_indexed_serves_post_upsert_state(spark, tmp_path):
    """Both indexes absorb incremental updates; the hybrid serve
    reflects the merged state without any rebuild."""
    from cultural_heritage_bigdata_project_spark.operators import (
        ann_index,
        text_index,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings")
    troot = str(tmp_path / "tix")
    aroot = str(tmp_path / "ann")
    text_index.build_text_index(spark, docs.filter(F.col("doc_id") % 3 != 0), troot)
    ann_index.build_ann_index(
        spark, emb.filter(F.col("vec_id") % 3 != 0), aroot, n_lists=8
    )
    text_index.text_index_upsert(
        spark, docs.filter(F.col("doc_id") % 3 == 0), troot
    )
    ann_index.ann_index_upsert(
        spark, emb.filter(F.col("vec_id") % 3 == 0), aroot
    )
    q_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in q_row[0]]
    got = similarity.hybrid_rrf_search_indexed(
        spark, troot, aroot, TERMS, q,
        k=10, top_n=50, n_probe=8, shortlist=1000,
    ).collect()
    want = similarity.hybrid_rrf_search(
        docs, emb, TERMS, _qvec(spark), k=10, top_n=50
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_batch_hybrid_matches_per_query_indexed(spark, tmp_path):
    """hybrid_rrf_search_all: one pass over each persisted index serves
    every query; per-query rows equal hybrid_rrf_search_indexed run
    query-by-query (exhaustive probe so the semantic branch is exact)."""
    from cultural_heritage_bigdata_project_spark.operators import (
        ann_index,
        text_index,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings")
    troot = str(tmp_path / "tix")
    aroot = str(tmp_path / "ann")
    text_index.build_text_index(spark, docs, troot)
    ann_index.build_ann_index(spark, emb, aroot, n_lists=8)
    qrows = emb.filter(F.col("vec_id") < 3).collect()
    queries = spark.createDataFrame(
        [
            (0, ["merge", "spark", "window"], list(qrows[0]["embedding"])),
            (1, ["join", "table"], list(qrows[1]["embedding"])),
            (2, ["spark"], list(qrows[2]["embedding"])),
        ],
        "q_id long, terms array<string>, embedding array<float>",
    )
    out = similarity.hybrid_rrf_search_all(
        spark, troot, aroot, queries,
        k=5, top_n=50, n_probe=8, shortlist=1000,
    )
    by_q: dict = {}
    for r in out.collect():
        by_q.setdefault(r["q_id"], []).append(
            (r["doc_id"], r["lex_rank"], r["sem_rank"], r["rrf_score"])
        )
    assert set(by_q) == {0, 1, 2}
    for q in queries.collect():
        want = [
            (r["doc_id"], r["lex_rank"], r["sem_rank"], r["rrf_score"])
            for r in similarity.hybrid_rrf_search_indexed(
                spark, troot, aroot, list(q["terms"]),
                [float(x) for x in q["embedding"]],
                k=5, top_n=50, n_probe=8, shortlist=1000,
            ).collect()
        ]
        assert by_q[q["q_id"]] == want, q["q_id"]


def test_filtered_hybrid_equals_filtering_each_branch(spark, tmp_path):
    """allowed_ids on the hybrid paths (round-8 VERDICT item 3 — the
    reference's filter-THEN-recommend dashboard flow): the filter
    applies to BOTH branches BEFORE ranking, so (a) the index-served
    filtered hybrid equals the scan-based filtered hybrid, (b) it
    equals fusing each independently-filtered branch, and (c) every
    result satisfies the filter while k still fills from the filtered
    universe."""
    from cultural_heritage_bigdata_project_spark.operators import (
        ann_index,
        text_index,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings")
    troot = str(tmp_path / "tix")
    aroot = str(tmp_path / "ann")
    text_index.build_text_index(spark, docs, troot)
    ann_index.build_ann_index(spark, emb, aroot, n_lists=8)
    allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    q_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in q_row[0]]

    got = similarity.hybrid_rrf_search_indexed(
        spark, troot, aroot, TERMS, q,
        k=10, top_n=50, n_probe=8, shortlist=1000, allowed_ids=allowed,
    ).collect()
    want = similarity.hybrid_rrf_search(
        docs, emb, TERMS, _qvec(spark), k=10, top_n=50, allowed_ids=allowed
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got and all(r["doc_id"] % 3 == 0 for r in got)
    assert len(got) == 10  # k fills from the filtered universe

    # (b) fusing each independently-filtered branch gives the same rows
    lex = text_index.text_index_search(
        spark, troot, TERMS, top_k=50, allowed_ids=allowed
    )
    sem = ann_index.ann_index_top_k(
        spark, aroot, q, k=50, n_probe=8, shortlist=1000,
        allowed_ids=allowed.select(F.col("doc_id").alias("vec_id")),
        codec="bq",
    )
    fused = similarity._rrf_fuse(lex, sem, "doc_id", "vec_id", 60, 10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in fused]

    # batch path agrees with the single-query path under the filter
    queries = spark.createDataFrame(
        [(0, TERMS, [float(x) for x in q_row[0]])],
        "q_id long, terms array<string>, embedding array<float>",
    )
    out = similarity.hybrid_rrf_search_all(
        spark, troot, aroot, queries,
        k=10, top_n=50, n_probe=8, shortlist=1000, allowed_ids=allowed,
    ).collect()
    got_b = [(r["doc_id"], r["lex_rank"], r["sem_rank"], r["rrf_score"]) for r in out]
    want_b = [
        (r["doc_id"], r["lex_rank"], r["sem_rank"], r["rrf_score"])
        for r in similarity.hybrid_rrf_search_indexed(
            spark, troot, aroot, TERMS, q,
            k=10, top_n=50, n_probe=8, shortlist=1000, allowed_ids=allowed,
        ).collect()
    ]
    assert got_b == want_b


def test_mmr_indexed_matches_scan_mmr(spark, tmp_path):
    """mmr_rerank_indexed serves the diversified top-k from the
    persisted ANN index (zero corpus scans); with every list probed its
    shortlist is exact, so the greedy selection equals mmr_rerank over
    the full vector table — and the allowed_ids filter applies before
    the shortlist."""
    from cultural_heritage_bigdata_project_spark.operators import ann_index

    emb = load_table(spark, SF_DIR, "embeddings")
    aroot = str(tmp_path / "ann")
    ann_index.build_ann_index(spark, emb, aroot, n_lists=8)
    q_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in q_row[0]]

    got = ann_index.mmr_rerank_indexed(
        spark, aroot, q, k=5, top_n=20, n_probe=8
    ).collect()
    want = similarity.mmr_rerank(emb, q, k=5, top_n=20).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    allowed = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id")
    got_f = ann_index.mmr_rerank_indexed(
        spark, aroot, q, k=5, top_n=20, n_probe=8, allowed_ids=allowed
    ).collect()
    want_f = similarity.mmr_rerank(
        emb.join(allowed, "vec_id", "leftsemi"), q, k=5, top_n=20
    ).collect()
    assert [tuple(r) for r in got_f] == [tuple(r) for r in want_f]
    assert got_f and all(r["vec_id"] % 2 == 1 for r in got_f)


def test_hybrid_grouped_diversifies_the_fused_page(spark, tmp_path):
    """hybrid_grouped_search_indexed (round 10): the fused page
    diversified by a group key — equals recomputing the windows by
    hand over the flat fused top-fetch_k, for both an explicit group
    frame and the ANN index's stored payload (groups=None), and the
    two modes agree with each other."""
    from cultural_heritage_bigdata_project_spark.operators import (
        ann_index,
        text_index,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_DIR, "embeddings").withColumnRenamed(
        "label", "provider"
    )
    troot = str(tmp_path / "tix")
    aroot = str(tmp_path / "ann")
    text_index.build_text_index(spark, docs, troot)
    ann_index.build_ann_index(
        spark, emb, aroot, n_lists=8, payload_cols=["provider"]
    )
    q_row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    q = [float(x) for x in q_row[0]]

    kwargs = dict(
        k_groups=3, group_size=2, fetch_k=25, top_n=50,
        n_probe=8, shortlist=1000,
    )
    got_explicit = similarity.hybrid_grouped_search_indexed(
        spark, troot, aroot, TERMS, q,
        groups=emb.select(F.col("vec_id").alias("doc_id"), "provider"),
        group_col="provider", **kwargs,
    ).collect()
    got_stored = similarity.hybrid_grouped_search_indexed(
        spark, troot, aroot, TERMS, q,
        groups=None, group_col="provider", **kwargs,
    ).collect()
    assert [tuple(r) for r in got_stored] == [tuple(r) for r in got_explicit]

    # recompute by hand from the flat fused page
    flat = similarity.hybrid_rrf_search_indexed(
        spark, troot, aroot, TERMS, q,
        k=25, top_n=50, n_probe=8, shortlist=1000,
    ).collect()
    prov = {r["vec_id"]: r["provider"] for r in emb.collect()}
    per = {}
    for r in sorted(flat, key=lambda r: (-r["rrf_score"], r["doc_id"])):
        per.setdefault(prov[r["doc_id"]], []).append(r)
    best = sorted(
        ((v[0]["rrf_score"], v[0]["doc_id"], g) for g, v in per.items()),
        key=lambda t: (-t[0], t[1]),
    )[:3]
    want = []
    for rank, (_, _, g) in enumerate(best, start=1):
        for i, r in enumerate(per[g][:2], start=1):
            want.append((g, rank, i, r["doc_id"], r["rrf_score"]))
    assert [tuple(r) for r in got_explicit] == want

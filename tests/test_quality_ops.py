"""Operator-invariant gate for the round-2 quality/corpus additions:
SemDeDup cluster pruning, C4/Gopher rule filter, per-domain caps, BM25
retrieval (operators/similarity.py, text.py, corpus.py). The catalog
parity tests pin these against DuckDB; here we pin the *semantics*
against independent Python recomputation and hand-checkable fixtures.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import corpus, similarity, text
from cultural_heritage_bigdata_project_spark.sources.tables import load_table

from .conftest import SF_DIR


def _semdedup_reference(rows, n_lists, tau):
    """Driver-side replay of semdedup_prune's contract: md5-sample
    centroids, squared-L2 nearest-centroid (ties -> lowest list),
    in-cluster smaller-id sweep at round(cos, 6) >= tau."""
    ids = [r[0] for r in rows]
    vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    cents = np.stack([vecs[i] for i in order[:n_lists]])
    clusters: dict[int, list[int]] = {}
    for i in ids:
        d = ((cents - vecs[i][None, :]) ** 2).sum(axis=1)
        clusters.setdefault(int(np.argmin(d)), []).append(i)
    kept = set()
    for members in clusters.values():
        members.sort()
        mat = np.stack([vecs[i] for i in members])
        nrm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = np.round(nrm @ nrm.T, 6)
        for a in range(len(members)):
            if not any(sims[a, b] >= tau for b in range(a)):
                kept.add(members[a])
    return kept


def test_semdedup_matches_reference_replay(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    got = {
        r.vec_id
        for r in similarity.semdedup_prune(emb, threshold=0.42, n_lists=16)
        .select("vec_id")
        .collect()
    }
    rows = [(r.vec_id, list(r.embedding)) for r in emb.select("vec_id", "embedding").collect()]
    want = _semdedup_reference(rows, n_lists=16, tau=0.42)
    assert got == want
    assert len(got) < len(rows)  # fixtures contain semantic near-dups


def test_semdedup_max_cluster_cap(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    capped = similarity.semdedup_prune(
        emb, threshold=2.0, n_lists=8, max_cluster=1
    )
    # tau=2.0 never drops by similarity, so cap=1 keeps exactly the
    # smallest id of each non-empty cluster
    assert capped.count() <= 8


def test_quality_rule_filter_flags(spark):
    df = spark.createDataFrame(
        [
            # 24 words, stopword 'the', mean len in range
            (1, " ".join(f"the w{i:02d}ord" for i in range(12))),
            (2, "tiny doc"),  # fails word count floor
            (3, " ".join(["dup"] * 30)),  # fails distinct ratio + stopwords
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in text.quality_rule_filter(df).collect()}
    assert out[1].keep and out[1].words_ok and out[1].stop_ok
    assert not out[2].words_ok and not out[2].keep
    assert not out[3].distinct_ok and not out[3].stop_ok and not out[3].keep
    for r in out.values():
        assert r.keep == (
            r.words_ok and r.word_len_ok and r.stop_ok and r.distinct_ok
        )


def test_domain_cap_invariants(spark):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    capped = corpus.domain_cap(docs, cap=7, domain_col="source", seed=3)
    per = {r.source: r.n for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per and all(n <= 7 for n in per.values())
    # deterministic under repartition
    a = {(r.doc_id, r.source) for r in capped.collect()}
    b = {
        (r.doc_id, r.source)
        for r in corpus.domain_cap(
            docs.repartition(13), cap=7, domain_col="source", seed=3
        ).collect()
    }
    assert a == b
    # a different seed selects a different sample
    c = {
        (r.doc_id, r.source)
        for r in corpus.domain_cap(docs, cap=7, domain_col="source", seed=4).collect()
    }
    assert a != c


def test_bm25_hand_checked(spark):
    df = spark.createDataFrame(
        [
            (1, "spark makes query plans"),
            (2, "spark spark spark all day"),
            (3, "nothing relevant here at all"),
            (4, "plans and more plans"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in text.bm25_search(df, ["spark", "plans"], top_k=10).collect()}
    assert 3 not in out  # no query term -> no row
    assert out[1].n_terms_hit == 2 and out[2].n_terms_hit == 1
    # hand-computed: N=4, avgdl=(4+5+5+4)/4=4.5; df(spark)=2, df(plans)=2
    def score(tf, dl, dfreq, n=4, avgdl=4.5, k1=1.2, b=0.75):
        idf = (n - dfreq + 0.5) / (dfreq + 0.5)
        return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))

    want1 = round(score(1, 4, 2) + score(1, 4, 2), 6)
    got1 = round(out[1].bm25, 6)
    assert abs(got1 - want1) < 2e-6, (got1, want1)
    # rank: doc1 (two terms) above doc4 (one term, tf=2)
    assert out[1].bm25 > out[4].bm25


def test_chunk_documents_coverage(spark):
    df = spark.createDataFrame(
        [(1, "a" * 48), (2, "b" * 553), (3, "xyz")], "doc_id int, text string"
    )
    out = text.chunk_documents(df, size=120, stride=80)
    rows = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text) for r in out.collect()
    )
    by_doc: dict[int, list] = {}
    for d, i, t in rows:
        by_doc.setdefault(d, []).append((i, t))
    texts = {1: "a" * 48, 2: "b" * 553, 3: "xyz"}
    for d, chunks in by_doc.items():
        n = len(texts[d])
        # chunk count: one start per stride step while start <= n
        assert len(chunks) == (n - 1) // 80 + 1
        # indices contiguous from 0; reassembling strided prefixes
        # reconstructs the document exactly
        assert [i for i, _ in chunks] == list(range(len(chunks)))
        rebuilt = "".join(t[:80] for _, t in chunks[:-1]) + chunks[-1][1]
        assert rebuilt == texts[d]
        # overlap: every non-final chunk is full size (n >= size case)
        for _, t in chunks[:-1]:
            assert len(t) == 120
    # short doc -> a single chunk equal to the text
    assert by_doc[3] == [(0, "xyz")]


def test_key_skew_profile_planted_skew(spark):
    from cultural_heritage_bigdata_project_spark.operators import scale

    rows = [(1,)] * 900 + [(k,) for k in range(2, 102)]
    df = spark.createDataFrame(rows, "k long")
    (r,) = scale.key_skew_profile(df, "k", top_n=10).collect()
    assert r.n_keys == 101 and r.n_rows == 1000 and r.max_key_rows == 900
    assert abs(r.skew_ratio - 900 / (1000 / 101)) < 1e-9
    # top-10 = hot key + 9 singletons
    assert abs(r.top_share - 909 / 1000) < 1e-12


def test_duplicate_spans_planted_verbatim_reuse(spark):
    """Two docs sharing one verbatim 10-token boilerplate block (but
    different otherwise) must pair with exactly 10-8+1=3 shared 8-token
    spans; unrelated docs must not pair."""
    from cultural_heritage_bigdata_project_spark.operators import text as t

    block = "the terms of service grant no warranty of any kind"  # 10 tokens
    rows = [
        (0, f"alpha beta gamma {block} delta epsilon"),
        (1, f"one two three four five six {block} seven"),
        (2, "completely unrelated text with no shared spans at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.a_id, r.b_id): r.n_shared_spans
        for r in t.duplicate_spans(df, n=8, min_spans=3).collect()
    }
    assert got == {(0, 1): 3}, got


def test_nfc_normalize_combining_characters(spark):
    """NFC must compose decomposed characters (e + U+0301 -> é), flag
    the change, and agree with DuckDB's native nfc_normalize — on real
    combining marks, not just the fixture's ASCII."""
    import duckdb
    import pandas as pd

    from cultural_heritage_bigdata_project_spark.operators import text as t

    decomposed = "café naïve"   # e+COMBINING ACUTE, i+COMBINING DIAERESIS
    composed = "café naïve"
    rows = [(0, decomposed), (1, composed), (2, "plain ascii"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text_nfc, r.changed) for r in t.nfc_normalize(df).collect()}
    assert got[0] == (composed, True)
    assert got[1] == (composed, False)
    assert got[2] == ("plain ascii", False)
    # SQL three-valued semantics: NULL text -> NULL changed, matching
    # the oracle's nfc_normalize(text) <> text (round-3 advice; was
    # False, a latent cross-engine hash divergence)
    assert got[3] == (None, None)
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": [decomposed, composed, "plain ascii", None]}))
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT doc_id, nfc_normalize(text), nfc_normalize(text) <> text FROM d"
        ).fetchall()
    }
    for k, v in oracle.items():
        assert got[k] == v, (k, got[k], v)


def test_ccnet_buckets_tercile_invariants(spark):
    """Per language: bucket sizes within one of n/3, and every head
    score >= every middle score >= every tail score."""
    from cultural_heritage_bigdata_project_spark.operators import text as t
    from cultural_heritage_bigdata_project_spark.sources.tables import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    out = t.ccnet_perplexity_buckets(docs).collect()
    assert len(out) == docs.count()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, {}).setdefault(r.bucket, []).append(r.avg_logprob)
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        n = sum(len(v) for v in buckets.values())
        for b, v in buckets.items():
            # terciles: each bucket within ~a third (ties can spill)
            assert abs(len(v) - n / 3) <= max(3, 0.15 * n), (lang, b, len(v), n)
        if {"head", "middle", "tail"} <= set(buckets):
            assert min(buckets["head"]) >= max(buckets["middle"])
            assert min(buckets["middle"]) >= max(buckets["tail"])
    # deterministic across layouts
    out16 = t.ccnet_perplexity_buckets(docs.repartition(16)).collect()
    assert {(r.doc_id, r.bucket) for r in out} == {
        (r.doc_id, r.bucket) for r in out16
    }


def test_train_charlm_profile_closes_the_loop(spark):
    """Train a profile in-engine, score with it, and match a pure-
    Python referee that re-derives both the profile and the scores."""
    import math

    from cultural_heritage_bigdata_project_spark.operators import text as t
    from cultural_heritage_bigdata_project_spark.sources.tables import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "text")
    clean = docs.filter(F.col("lang") == "en")
    prof_df = t.train_charlm_profile(clean)
    prof, norm = t.trained_profile(prof_df)

    # referee: recount trigrams in plain Python
    ref_counts: dict = {}
    for r in clean.select("text").collect():
        s = " " + r.text.lower() + " "
        for i in range(max(len(s) - 2, 0)):
            tg = s[i : i + 3]
            ref_counts[tg] = ref_counts.get(tg, 0) + 1
    assert prof == {
        tg: int(round(math.log(c + 1) * 1_000_000_000))
        for tg, c in ref_counts.items()
    }
    assert norm == int(
        round(
            math.log(sum(ref_counts.values()) + len(ref_counts) + 1)
            * 1_000_000_000
        )
    )

    # scoring with the trained profile replays the same integer/IEEE
    # pipeline as the static-profile path
    sample = docs.limit(50)
    got = {
        r.doc_id: (r.n_trigrams, r.avg_logprob)
        for r in t.charlm_quality(sample, profile=prof, norm_nano=norm).collect()
    }
    for r in sample.select("doc_id", "text").collect():
        s = " " + r.text.lower() + " "
        n = max(len(s) - 2, 0)
        sn = sum(prof.get(s[i : i + 3], 0) for i in range(n))
        expect = round((sn / max(n, 1) - norm) / 1e9, 6)
        assert got[r.doc_id] == (n, expect), r.doc_id

    with pytest.raises(ValueError, match="both profile and norm_nano"):
        t.charlm_quality(sample, profile=prof)


def _bpe_referee(word_counts: dict, n_merges: int, min_pair_count: int = 2):
    """Pure-Python BPE (Sennrich et al. 2016 alg. 1) with the same
    deterministic tiebreak: count desc, then (left, right) asc."""
    segs = {w: list(w) + ["</w>"] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for w, syms in segs.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (l, r), n = best
        merges.append((l, r, n))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges


def test_bpe_train_matches_referee(spark):
    from cultural_heritage_bigdata_project_spark.operators import text as t
    from cultural_heritage_bigdata_project_spark.sources.tables import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("text").limit(200)
    wc_df = t.bpe_word_counts(docs)
    wc = {r.word: r.cnt for r in wc_df.collect()}
    assert len(wc) > 20
    got = t.bpe_train_merges(wc_df, n_merges=12)
    assert got == _bpe_referee(wc, 12)
    # layout-independence
    got16 = t.bpe_train_merges(wc_df.repartition(16), n_merges=12)
    assert got16 == got
    # batched learning is EXACT at depth (where merges interact and the
    # per-round batch rules — disjointness, count bound, alias probe —
    # all get exercised) and must beat one-round-per-merge
    stats: dict = {}
    got40 = t.bpe_train_merges(wc_df, n_merges=40, stats=stats)
    assert got40 == _bpe_referee(wc, 40)
    assert 0 < stats["rounds"] < 40, stats
    # a tiny batch_k degrades to near-sequential but stays exact
    got_k2 = t.bpe_train_merges(wc_df, n_merges=15, batch_k=2)
    assert got_k2 == _bpe_referee(wc, 15)
    # the incremental pair-count path (auto-picked for >=50k-word
    # vocabs; forced here) must learn the IDENTICAL merge list — its
    # maintained counts table is by construction a from-scratch
    # recount, and this pins it at interacting depth
    inc_stats: dict = {}
    got_inc = t.bpe_train_merges(
        wc_df, n_merges=12, incremental=True, stats=inc_stats
    )
    assert got_inc == got
    assert inc_stats["mode"] == "incremental"
    assert stats["mode"] == "recount"


def test_bpe_batch_exact_on_adversarial_vocab(spark):
    """Hand-built vocab where naive batching diverges: overlapping
    top pairs, an aliasing merge ('ab' re-created next to c while
    'ab c' pairs pre-exist), and count ties — every trap must resolve
    to the sequential answer."""
    from cultural_heritage_bigdata_project_spark.operators import text as t

    words = {
        # 'ab' token will be created by merging a+b; the literal word
        # 'ab' also exists, so the merged string aliases a vocab symbol
        "abcabc": 30,
        "ab": 25,
        "abc": 20,
        "bc": 18,
        "xyxy": 17,
        "xy": 16,
        "aabb": 9,
        "yy": 9,
        "zqzq": 8,
    }
    wc_df = spark.createDataFrame(list(words.items()), "word string, cnt long")
    for n, k in [(6, 64), (10, 64), (10, 3), (14, 8)]:
        got = t.bpe_train_merges(wc_df, n_merges=n, batch_k=k, min_pair_count=2)
        assert got == _bpe_referee(words, n), (n, k, got)
    # incremental counts must survive the same traps (aliasing both
    # destroys and re-creates pairs mid-batch — the hardest case for
    # delta maintenance)
    got_inc = t.bpe_train_merges(
        wc_df, n_merges=10, batch_k=3, min_pair_count=2, incremental=True
    )
    assert got_inc == _bpe_referee(words, 10)


def test_bpe_segment_hand_checked(spark):
    from cultural_heritage_bigdata_project_spark.operators import text as t

    # classic example: low/lower family
    rows = [(0, "low low low lower lowest")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wc = t.bpe_word_counts(df)
    merges = t.bpe_train_merges(wc, n_merges=4, min_pair_count=2)
    # 'l o' appears in every word (5 occurrences) and wins round 1
    assert merges[0][:2] == ("l", "o") and merges[0][2] == 5
    out = {r.doc_id: r for r in t.bpe_segment(df, merges).collect()}
    toks = out[0].bpe_tokens
    assert out[0].n_bpe_tokens == len(toks)
    # reconstruction: stripping the end-of-word markers re-yields text
    rejoined = "".join(toks).replace("</w>", " ").strip()
    assert rejoined == "low low low lower lowest"
    # NULL text propagates
    df2 = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = t.bpe_segment(df2, merges).collect()[0]
    assert r.bpe_tokens is None and r.n_bpe_tokens is None


def test_bpe_batch_exact_on_random_vocabs(spark):
    """Hypothesis referee sweep: batched merge learning must equal
    sequential BPE on arbitrary small vocabularies (tight alphabets
    maximize pair overlap and aliasing, the regimes the batch rules
    must detect)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        words=st.dictionaries(
            st.text(alphabet="ab", min_size=1, max_size=5),
            st.integers(1, 20),
            min_size=1,
            max_size=10,
        ),
        batch_k=st.sampled_from([2, 8, 64]),
    )
    def check(words, batch_k):
        from cultural_heritage_bigdata_project_spark.operators import text as t

        wc_df = spark.createDataFrame(
            list(words.items()), "word string, cnt long"
        )
        got = t.bpe_train_merges(wc_df, n_merges=8, batch_k=batch_k)
        assert got == _bpe_referee(words, 8), (words, batch_k)

    check()


def test_bpe_token_histogram_referee(spark):
    """Algorithm-equivalence referee for the tokenizer-apply gate: the
    greedy lowest-rank-repeat encoder must agree with the rank-order
    global-replace chain (the DuckDB oracle's algorithm) on EVERY
    distinct word of the real corpus — the property that makes the
    SQL oracle a valid derivation of the encoder's output."""
    from cultural_heritage_bigdata_project_spark.operators import text as t
    from cultural_heritage_bigdata_project_spark.plans.queries_text import (
        _BPE_APPLY_MERGES,
    )
    from cultural_heritage_bigdata_project_spark.sources.tables import load_table

    from .conftest import SF_DIR_ORACLE

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("text")
    words = [
        r.word
        for r in t.bpe_word_counts(docs)
        .filter(F.col("word").rlike("^[a-z]+$"))
        .collect()
    ]
    assert len(words) > 20
    seg = t._make_seg_word(_BPE_APPLY_MERGES)
    ranks = dict.fromkeys((l, r) for l, r in _BPE_APPLY_MERGES)
    extra = [
        "the", "thend", "withering", "tof", "tother", "ingot", "and",
        "sand", "tanding", "another", "toned", "feathered", "softening",
        "intothe", "onion", "tether", "anding", "theing", "eding",
        "ofto", "erer", "thethe", "inin", "anand", "sing", "things",
    ]
    for w in words + extra:
        # rank-order single pass: each merge applied globally, leftmost
        # first — the replace-chain semantics
        syms = list(w) + ["</w>"]
        for left, right in _BPE_APPLY_MERGES:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        greedy = seg(w)
        assert syms == greedy, (w, syms, greedy)
        # fixpoint: no mergeable adjacent pair survives either way
        assert not any(
            (greedy[i], greedy[i + 1]) in ranks for i in range(len(greedy) - 1)
        ), (w, greedy)


def test_bpe_token_histogram_hand_checked(spark):
    from cultural_heritage_bigdata_project_spark.operators import text as t
    from cultural_heritage_bigdata_project_spark.plans.queries_text import (
        _BPE_APPLY_MERGES,
    )

    # 'the' -> the</w>; 'thing' -> th ing</w>; 'Mixed-case' filtered out
    rows = [(0, "the thing the"), (1, "Zebra42 the dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.token: r.occurrences
        for r in t.bpe_token_histogram(df, _BPE_APPLY_MERGES).collect()
    }
    assert got == {
        "the</w>": 3,
        "th": 1,
        "ing</w>": 1,
        "d": 1,
        "o": 1,
        "g": 1,
        "</w>": 1,
    }

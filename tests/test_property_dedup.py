"""Property-based checks (hypothesis) for the text-dedup family:
random token corpora validated against exhaustive in-Python referees.

- jaccard_pairs must equal the brute-force O(n²) pair set exactly
  (inverted-index candidate generation is an optimization, never a
  semantics change);
- minhash_lsh_pairs must be SOUND (every returned pair's exact Jaccard
  really is >= threshold) and a subset of the exact pair set — LSH may
  miss pairs (recall < 1 by design) but must never invent one;
- simhash_pairs must be COMPLETE for its contract: every pair within
  the Hamming radius is returned (pigeonhole chunk join), none outside.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import dedup

_pytest_spark = None  # filled by fixture


def _shingles(tokens: list[str], n: int = 3) -> set[str]:
    return {
        " ".join(tokens[i : i + n]) for i in range(max(len(tokens) - n + 1, 0))
    }


def _jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


VOCAB = ["red", "blue", "green", "fox", "dog", "run", "jump", "lazy"]

docs_st = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=3, max_size=10),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_st)
def test_jaccard_pairs_equal_brute_force(spark, docs):
    threshold = 0.4
    sh = [(_i, sorted(_shingles(t))) for _i, t in enumerate(docs)]
    sh = [(i, s) for i, s in sh if s]
    expect = {}
    for i in range(len(sh)):
        for j in range(i + 1, len(sh)):
            a_id, a = sh[i]
            b_id, b = sh[j]
            jac = round(_jaccard(set(a), set(b)), 6)
            if jac >= threshold:
                expect[(min(a_id, b_id), max(a_id, b_id))] = jac
    df = spark.createDataFrame(sh, "doc_id long, sh array<string>")
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.jaccard_pairs(df, "doc_id", "sh", threshold=0.4).collect()
    }
    assert got == expect, (got, expect)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_st)
def test_minhash_sound_and_subset_of_exact(spark, docs):
    threshold = 0.6
    sh = [(_i, sorted(_shingles(t))) for _i, t in enumerate(docs)]
    sh = [(i, s) for i, s in sh if s]
    shmap = {i: set(s) for i, s in sh}
    exact = {
        (a, b)
        for a in shmap
        for b in shmap
        if a < b and round(_jaccard(shmap[a], shmap[b]), 6) >= threshold
    }
    df = spark.createDataFrame(sh, "doc_id long, sh array<string>")
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in dedup.minhash_lsh_pairs(
            df, "doc_id", "sh", threshold=threshold
        ).collect()
    }
    assert set(got) <= exact, (set(got), exact)
    for (a, b), jac in got.items():
        assert jac >= threshold
        assert jac == round(_jaccard(shmap[a], shmap[b]), 6)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=docs_st)
def test_simhash_complete_within_radius(spark, docs):
    """Referee: compute every doc's 64-bit simhash in Python with the
    SAME xxhash64 token hashes Spark produces (pulled from one Spark
    projection, so the referee only re-implements the vote/pigeonhole
    logic), then check the pair set equals {hamming <= 3}."""
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, t array<string>")
    hashed = df.select(
        "doc_id", F.expr("transform(t, x -> xxhash64(x))").alias("h")
    ).collect()

    def simhash(hs):
        sig = 0
        for b in range(64):
            vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if vote >= 0:
                sig |= 1 << b
        return sig

    sigs = {r.doc_id: simhash([h & 0xFFFFFFFFFFFFFFFF for h in r.h]) for r in hashed}
    expect = {
        (a, b): bin(sigs[a] ^ sigs[b]).count("1")
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in dedup.simhash_pairs(df, "doc_id", "t", max_hamming=3).collect()
    }
    assert got == expect, (got, expect)

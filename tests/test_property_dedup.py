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


def test_minhash_xxh_codegen_signature_matches_legacy(spark):
    """The round-12 explode+groupBy xxh signature (64 partial-agg `min`
    columns) must equal the legacy interpreted-lambda formula
    sig_i = min_j(h1[j] + i*h2[j]) element-for-element, and the public
    pair output must be unchanged for corpora that include empty and
    NULL shingle arrays (legacy gave those all-NULL signatures whose
    candidate pairs a NULL/zero jaccard discarded; the rewrite drops
    them at the explode)."""
    rows = [
        (0, ["a b c", "b c d", "c d e"]),
        (1, ["a b c", "b c d", "c d e"]),
        (2, ["x y z"]),
        (3, []),  # empty shingle set: must never pair
        (4, None),  # NULL shingle array: must never pair
        (5, ["a b c", "b c d", "q r s"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, sh array<string>")
    legacy_sig = {
        r.doc_id: r.sig
        for r in df.filter(F.size("sh") > 0)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(0, 63), i -> array_min("
                "zip_with("
                "transform(sh, s -> xxhash64(42, s) & 2147483647),"
                "transform(sh, s -> xxhash64(43, s) & 2147483647),"
                "(h1, h2) -> h1 + i * h2)))"
            ).alias("sig"),
        )
        .collect()
    }
    exploded = df.select("doc_id", F.explode("sh").alias("__s"))
    hashed = exploded.select(
        "doc_id",
        F.expr("xxhash64(42, __s) & 2147483647").alias("__h1"),
        F.expr("xxhash64(43, __s) & 2147483647").alias("__h2"),
    )
    new_sig = {
        r.doc_id: r.sig
        for r in hashed.groupBy("doc_id")
        .agg(
            *[
                F.min(F.col("__h1") + F.lit(i) * F.col("__h2")).alias(f"__s{i}")
                for i in range(64)
            ]
        )
        .select(
            "doc_id",
            F.array(*[F.col(f"__s{i}") for i in range(64)]).alias("sig"),
        )
        .collect()
    }
    assert new_sig == legacy_sig
    pairs = {
        (r.a_id, r.b_id)
        for r in dedup.minhash_lsh_pairs(
            df, "doc_id", "sh", threshold=0.5, hash_family="xxhash64"
        ).collect()
    }
    assert pairs == {(0, 1)}, pairs


def test_simhash_codegen_signature_matches_legacy_and_edges(spark):
    """The round-12 explode+vote-sum simhash must equal the legacy
    `simhash_bits` interpreted aggregate bit-for-bit (including the
    two's-complement top bit), and the NULL/empty token-array edge
    docs must keep their legacy literal signatures: NULL array -> 0,
    empty array -> all-ones (vote 0 >= 0 sets every bit). So two NULL
    docs pair at hamming 0, two empty docs pair at hamming 0, and a
    NULL doc never pairs with an empty doc (hamming 64)."""
    rows = [
        (0, ["red", "fox", "jump"]),
        (1, ["red", "fox", "jump", "dog"]),
        (2, []),
        (3, []),
        (4, None),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, t array<string>")
    hashed = df.select(
        "doc_id", F.expr("transform(t, x -> xxhash64(x))").alias("__th")
    )
    legacy = {
        r.doc_id: r.sig
        for r in hashed.select(
            "doc_id", dedup.simhash_bits("__th", 64).alias("sig")
        ).collect()
    }
    assert legacy[2] == -1 and legacy[3] == -1  # all-ones, 64-bit
    assert legacy[4] == 0 and legacy[5] == 0
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in dedup.simhash_pairs(df, "doc_id", "t", max_hamming=3).collect()
    }
    expect = {
        (a, b): bin((legacy[a] ^ legacy[b]) & (2**64 - 1)).count("1")
        for a in legacy
        for b in legacy
        if a < b
        and bin((legacy[a] ^ legacy[b]) & (2**64 - 1)).count("1") <= 3
    }
    assert got == expect, (got, expect)
    assert (2, 3) in got and (4, 5) in got
    assert (2, 4) not in got and (2, 5) not in got


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

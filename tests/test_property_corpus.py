"""Property-based invariants for the corpus layout operators
(operators/corpus.py): budget monotonicity, shard partition laws,
upsampling volume — small random inputs, deterministic seeds."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import corpus

rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc_id
        st.integers(min_value=0, max_value=500),  # n_tokens
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: r[0],
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_st, b1=st.integers(0, 2_000), b2=st.integers(0, 2_000))
def test_token_budget_monotone_subset(spark, rows, b1, b2):
    """A larger budget selects a SUPERSET of a smaller one, and every
    selection is a prefix of the seeded hash order (cum <= budget)."""
    lo, hi = sorted((b1, b2))
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    sel_lo = {
        r.doc_id: r.cum_tokens
        for r in corpus.token_budget_select(df, budget=lo, seed=9).collect()
    }
    sel_hi = {
        r.doc_id: r.cum_tokens
        for r in corpus.token_budget_select(df, budget=hi, seed=9).collect()
    }
    assert set(sel_lo) <= set(sel_hi)
    for d, c in sel_lo.items():
        assert c == sel_hi[d]  # cum is budget-independent
        assert c <= lo
    assert all(c <= hi for c in sel_hi.values())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=rows_st,
    n_shards=st.integers(min_value=1, max_value=9),
    seed=st.integers(0, 5),
)
def test_shard_assign_partition_laws(spark, rows, n_shards, seed):
    """Sharding is a partition: every row appears once, shards are in
    range, and positions are dense 0..len-1 per shard."""
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = corpus.shard_assign(df, n_shards=n_shards, seed=seed).collect()
    assert sorted(r.doc_id for r in out) == sorted(r[0] for r in rows)
    per = {}
    for r in out:
        assert 0 <= r.shard < n_shards
        per.setdefault(r.shard, []).append(r.pos)
    for poss in per.values():
        assert sorted(poss) == list(range(len(poss)))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.sampled_from(["a", "b"]),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],
    ),
    wa=st.floats(0.0, 3.0),
)
def test_epoch_upsample_volume_law(spark, rows, wa):
    """Each doc of source s appears floor(w_s) or ceil(w_s) times, and
    total volume is within the deterministic-threshold bound."""
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.epoch_upsample(df, {"a": wa, "b": 1.0}, seed=2).collect()
    from collections import Counter

    per = Counter()
    for r in out:
        per[(r.doc_id, r.source)] += 1
    import math

    fl, ce = math.floor(wa), math.ceil(wa)
    n_a = 0
    for (d, s0), c in per.items():
        if s0 == "a":
            assert c in (fl, ce), (wa, c)
            n_a += 1
        else:
            assert c == 1
    a_docs = [r for r in rows if r[1] == "a"]
    # zero-epoch 'a' docs legitimately vanish when wa < 1
    if fl >= 1:
        assert n_a == len(a_docs)

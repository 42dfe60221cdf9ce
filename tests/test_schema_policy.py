"""Write-time schema evolution policy (round-6 VERDICT item 5 — the
Delta schema-enforcement / mergeSchema-evolution / type-widening
analog, operators/txn.py evolve_component_schema +
widen_component_type). Additive changes flow; type conflicts are
REJECTED at commit time, before any segment lands; widenings go
through an explicit full-history migration. Policy prose lives in
DEPLOYMENT.md §Schema evolution.

Reference analog: the reference evolves schemas by hand-editing its
cleanse jobs' select lists between runs (spark-apps/eu-to-cleansed/
cleansing_eu_to_cleansed.py) with nothing guarding the Delta tables the
jobs MERGE into; this layer makes the accept/reject line explicit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cultural_heritage_bigdata_project_spark.operators import txn
from cultural_heritage_bigdata_project_spark.streaming import pipelines as streaming


def _commit(spark, root, rows, schema, **kw):
    df = spark.createDataFrame(rows, schema)
    return streaming.batch_upsert_commit(
        spark, df, keys=["k"], order_desc=["seq"], target_dir=str(root), **kw
    )


def test_additive_column_accepted_and_recorded(spark, tmp_path):
    root = tmp_path / "t"
    _commit(spark, root, [(1, 1, "a")], "k long, seq long, v string")
    _commit(
        spark, root,
        [(2, 2, "b", 9.5)],
        "k long, seq long, v string, score double",
    )
    got = {r["k"]: (r["v"], r["score"]) for r in txn.read_version(spark, str(root)).collect()}
    assert got == {1: ("a", None), 2: ("b", 9.5)}  # old rows NULL-fill
    assert txn.component_logical_schema(str(root)) == [
        ["k", "bigint"], ["seq", "bigint"], ["v", "string"], ["score", "double"],
    ]


def test_omitted_column_accepted(spark, tmp_path):
    root = tmp_path / "t"
    _commit(spark, root, [(1, 1, "a")], "k long, seq long, v string")
    _commit(spark, root, [(2, 2)], "k long, seq long")  # v omitted
    got = {r["k"]: r["v"] for r in txn.read_version(spark, str(root)).collect()}
    assert got == {1: "a", 2: None}
    # schema keeps the historical column
    assert ["v", "string"] in txn.component_logical_schema(str(root))


def test_type_conflict_rejected_before_any_write(spark, tmp_path):
    root = tmp_path / "t"
    _commit(spark, root, [(1, 1, "a")], "k long, seq long, v string")
    before = txn.list_versions(str(root))
    with pytest.raises(txn.SchemaEvolutionError, match="type change.*'v'"):
        _commit(spark, root, [(2, 2, 7)], "k long, seq long, v int")
    assert txn.list_versions(str(root)) == before  # nothing committed
    # the readable table is untouched
    assert txn.read_version(spark, str(root)).count() == 1


def test_widenable_conflict_names_the_migration(spark, tmp_path):
    root = tmp_path / "t"
    _commit(spark, root, [(1, 1, 7)], "k long, seq long, n int")
    with pytest.raises(txn.SchemaEvolutionError, match="widen_component_type"):
        _commit(spark, root, [(2, 2, 7)], "k long, seq long, n bigint")


def test_missing_protected_column_rejected(spark, tmp_path):
    root = tmp_path / "t"
    _commit(spark, root, [(1, 1, "a")], "k long, seq long, v string")
    with pytest.raises(txn.SchemaEvolutionError, match="protected"):
        df = spark.createDataFrame([(2, "b")], "k long, v string")  # no seq
        streaming.batch_upsert_commit(
            spark, df, keys=["k"], order_desc=["seq"], target_dir=str(root)
        )


def test_streaming_sink_enforces_policy(spark, tmp_path):
    """The foreachBatch sink path rejects a type-conflicting stream
    batch the same way (the error surfaces through the query)."""
    root = tmp_path / "t"
    src = tmp_path / "src"
    _commit(spark, root, [(1, 1, "a")], "k long, seq long, v string")
    df = spark.createDataFrame([(2, 2, 7)], "k long, seq long, v int")
    df.coalesce(1).write.parquet(str(src / "f0"))
    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        (txn.SchemaEvolutionError, StreamingQueryException),
        match="type change",
    ):
        streaming.foreach_batch_upsert_run(
            spark, stream, keys=["k"], order_desc=["seq"],
            target_dir=str(root), reset=False,
        )
    assert txn.read_version(spark, str(root)).count() == 1


def test_replication_rejects_conflicting_replica(spark, tmp_path):
    """A replica whose existing table disagrees on a column's type must
    reject the replicated batch, not poison its own reads."""
    src, dst = tmp_path / "src", tmp_path / "dst"
    cursor = str(tmp_path / "cur.json")
    _commit(spark, src, [(1, 1, 7)], "k long, seq long, n int")
    # replica independently created with n bigint
    _commit(spark, dst, [(9, 0, 5)], "k long, seq long, n bigint")
    with pytest.raises(txn.SchemaEvolutionError, match="type change"):
        streaming.replicate_changes(spark, str(src), str(dst), cursor)


def test_widen_component_type_migration(spark, tmp_path):
    root = tmp_path / "t"
    _commit(spark, root, [(1, 1, 7), (2, 1, 8)], "k long, seq long, n int")
    _commit(spark, root, [(2, 2, 9)], "k long, seq long, n int")
    txn.widen_component_type(spark, str(root), "n", "bigint")
    assert ["n", "bigint"] in txn.component_logical_schema(str(root))
    got = {r["k"]: r["n"] for r in txn.read_version(spark, str(root)).collect()}
    assert got == {1: 7, 2: 9}  # history intact, latest-per-key preserved
    # bigint batches now commit directly
    _commit(spark, root, [(3, 3, 2**40)], "k long, seq long, n bigint")
    got = {r["k"]: r["n"] for r in txn.read_version(spark, str(root)).collect()}
    assert got == {1: 7, 2: 9, 3: 2**40}
    # and int batches are now the conflicting ones
    with pytest.raises(txn.SchemaEvolutionError):
        _commit(spark, root, [(4, 4, 1)], "k long, seq long, n int")


def test_widen_rejects_narrowing(spark, tmp_path):
    root = tmp_path / "t"
    _commit(spark, root, [(1, 1, 2**40)], "k long, seq long, n bigint")
    with pytest.raises(txn.SchemaEvolutionError, match="not a lossless"):
        txn.widen_component_type(spark, str(root), "n", "int")
    with pytest.raises(txn.SchemaEvolutionError, match="not a lossless"):
        txn.widen_component_type(spark, str(root), "n", "string")


def test_widen_validates_pre_policy_tables(spark, tmp_path):
    """A manifest with NO recorded schema (written before the policy
    existed) must not bypass the widening check: the column's ACTUAL
    stored type is read from the folded state and a narrowing cast is
    rejected before any rewrite lands (round-7 ADVICE, medium). A real
    widening on the same pre-policy table still flows — and records a
    schema on the way out."""
    import os

    root = tmp_path / "t"
    _commit(spark, root, [(1, 1, 2**40)], "k long, seq long, n bigint")
    # strip the recorded schema, emulating a pre-policy manifest
    cur = txn.current_version_dir(str(root))
    vname = os.path.basename(cur)
    components = txn.read_manifest(str(root), vname)
    components[""].pop("schema", None)
    txn.write_manifest(str(root), vname, components)
    assert txn.component_logical_schema(str(root)) is None
    before = {r["k"]: r["n"] for r in txn.read_version(spark, str(root)).collect()}
    with pytest.raises(txn.SchemaEvolutionError, match="not a lossless"):
        txn.widen_component_type(spark, str(root), "n", "int")
    with pytest.raises(txn.SchemaEvolutionError, match="not in component"):
        txn.widen_component_type(spark, str(root), "nope", "bigint")
    # nothing was rewritten by the rejected migration
    assert {r["k"]: r["n"] for r in txn.read_version(spark, str(root)).collect()} == before
    # a genuine widening on a pre-policy table still flows (int->bigint)
    root2 = tmp_path / "t2"
    _commit(spark, root2, [(1, 1, 7)], "k long, seq long, n int")
    cur2 = txn.current_version_dir(str(root2))
    v2 = os.path.basename(cur2)
    comps2 = txn.read_manifest(str(root2), v2)
    comps2[""].pop("schema", None)
    txn.write_manifest(str(root2), v2, comps2)
    txn.widen_component_type(spark, str(root2), "n", "bigint")
    assert ["n", "bigint"] in txn.component_logical_schema(str(root2))
    assert {r["k"]: r["n"] for r in txn.read_version(spark, str(root2)).collect()} == {1: 7}


def test_widen_rejects_bucketed_merge_key(spark, tmp_path):
    root = tmp_path / "t"
    df = spark.createDataFrame([(1, 1, "a")], "k int, seq long, v string")
    streaming.batch_upsert_commit(
        spark, df, keys=["k"], order_desc=["seq"], target_dir=str(root),
        n_buckets=4,
    )
    with pytest.raises(txn.SchemaEvolutionError, match="bucket"):
        txn.widen_component_type(spark, str(root), "k", "bigint")


def test_change_feed_sees_evolved_columns(spark, tmp_path):
    """A feed spanning an additive evolution delivers the union schema
    (pre-evolution epochs NULL-fill), so downstream consumers never
    crash on a mid-feed schema step. A fresh-cursor poll covers the
    full retention window including the pre-evolution epoch."""
    root = tmp_path / "t"
    _commit(spark, root, [(1, 1, "a")], "k long, seq long, v string",
            keep_last=8)
    _commit(spark, root, [(2, 2, "b", 1.5)],
            "k long, seq long, v string, score double", keep_last=8)
    feed = txn.change_feed(spark, str(root), 0, 1)  # from_version exclusive
    assert {r["k"]: (r["v"], r["score"]) for r in feed.collect()} == {
        2: ("b", 1.5)
    }
    poll, hi = txn.poll_changes(spark, str(root), str(tmp_path / "c.json"))
    assert {r["k"]: (r["v"], r["score"]) for r in poll.collect()} == {
        1: ("a", None),  # pre-evolution epoch NULL-fills the new column
        2: ("b", 1.5),
    }


# ---------------------------------------------------------------- property:
# random additive evolution sequences never break reads, and the read
# equals a driver-side replay of the same upserts with union schema.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_OPT_COLS = ["a", "b", "c"]  # optional payload columns, all bigint


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    batches=st.lists(
        st.tuples(
            st.lists(st.integers(0, 4), min_size=1, max_size=3, unique=True),
            st.sets(st.sampled_from(_OPT_COLS), max_size=3),
        ),
        min_size=1,
        max_size=3,
    )
)
def test_additive_evolution_replay(spark, tmp_path_factory, batches):
    root = str(tmp_path_factory.mktemp("evo") / "t")
    expected: dict = {}  # key -> {col: value}
    union_cols: list[str] = []
    for seq, (keys, cols) in enumerate(batches):
        cols = sorted(cols)
        for c in cols:
            if c not in union_cols:
                union_cols.append(c)
        schema = "k long, seq long" + "".join(f", {c} long" for c in cols)
        rows = [
            tuple([k, seq] + [100 * seq + 10 * _OPT_COLS.index(c) + k for c in cols])
            for k in keys
        ]
        df = spark.createDataFrame(rows, schema)
        streaming.batch_upsert_commit(
            spark, df, keys=["k"], order_desc=["seq"], target_dir=root
        )
        for r in rows:
            k = r[0]
            expected[k] = {c: r[2 + i] for i, c in enumerate(cols)}
            expected[k]["seq"] = seq
    got = {
        r["k"]: {c: r[c] for c in ["seq"] + union_cols}
        for r in txn.read_version(spark, root).collect()
    }
    want = {
        k: {c: v.get(c) for c in ["seq"] + union_cols}
        for k, v in expected.items()
    }
    assert got == want
    # the recorded logical schema is exactly protected + union columns
    rec = [n for n, _ in txn.component_logical_schema(root)]
    assert rec == ["k", "seq"] + union_cols

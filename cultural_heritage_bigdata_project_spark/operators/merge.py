"""Upsert / MERGE emulation without Delta (SURVEY.md §4.2.3).

The runtime has no delta-spark, so the reference's two MERGE shapes
are re-expressed as pure DataFrame algebra with identical semantics:

- S11 insert-only upsert (``whenNotMatchedInsertAll`` —
  eu_raw_to_cleansed_merge.py:62-69): target ∪ (source ⟕anti target).
- S12 full upsert on null-safe multi-key (``whenMatchedUpdateAll``/
  ``whenNotMatchedInsertAll`` — join_eu_ugc_qdrant_merge.py:387-401):
  matched rows take the source row, unmatched target rows survive,
  unmatched source rows insert.

Like Delta, S12 raises if the source has duplicate rows per match key
(the reference avoids this by deduping first at
join_eu_ugc_qdrant_merge.py:351); callers dedup with
``cleanse.dedup_first_wins`` before merging.

Scale note: both shapes are one shuffle on the merge keys (the same
exchange Delta's join-based MERGE performs); at 100 TB the win Delta
adds is file-level pruning of untouched files — on a real deployment
back this API with Delta/Iceberg ``MERGE INTO``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert_insert_only(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """S11: insert source rows whose key is absent from target.

    Key matching is null-safe (consistent with ``upsert_full``): a
    NULL-key source row matches a NULL-key target row. (A name-based
    anti-join would use plain equality and re-insert NULL-key rows on
    every run — caught by the hypothesis property suite.)
    """
    t, s = target.alias("__mt"), source.alias("__ms")
    cond = None
    for k in keys:
        c = F.col(f"__mt.{k}").eqNullSafe(F.col(f"__ms.{k}"))
        cond = c if cond is None else (cond & c)
    new_rows = s.join(t, on=cond, how="left_anti")
    return target.unionByName(new_rows.select(*target.columns))


def _assert_unique_keys(df: DataFrame, keys: Sequence[str]) -> None:
    dup = (
        df.groupBy(*[F.col(k) for k in keys])
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            f"merge source has duplicate rows for keys {list(keys)}; "
            "dedup the source first (reference dedups at "
            "join_eu_ugc_qdrant_merge.py:351)"
        )


def upsert_full(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    check_unique_source: bool = True,
) -> DataFrame:
    """S12: null-safe multi-key full upsert (update-all + insert-all).

    Implemented as target ⟕anti(nullsafe) source ∪ source: every
    matched key takes the complete source row, unmatched target rows
    are kept, unmatched source rows are inserted. Null-safe equality
    mirrors Delta's ``<=>`` merge condition.
    """
    if check_unique_source:
        _assert_unique_keys(source, keys)
    # Alias both sides: target and source often share lineage (e.g. two
    # filters of the same table) and unaliased self-join refs are
    # ambiguous.
    t, s = target.alias("__mt"), source.alias("__ms")
    cond = None
    for k in keys:
        c = F.col(f"__mt.{k}").eqNullSafe(F.col(f"__ms.{k}"))
        cond = c if cond is None else (cond & c)
    kept_target = t.join(s, on=cond, how="left_anti")
    return kept_target.unionByName(source.select(*target.columns))


def upsert_full_with_delete(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    delete_col: str,
    check_unique_source: bool = True,
) -> DataFrame:
    """Full MERGE with a delete clause (Delta's ``WHEN MATCHED [AND
    cond] THEN DELETE`` beside update-all/insert-all): source rows
    whose ``delete_col`` is true remove their matched target key;
    other source rows upsert as in ``upsert_full``. A delete for an
    absent key is a no-op (MERGE semantics). The delete flag column is
    not part of the output schema.

    Same single null-safe key exchange as ``upsert_full`` — the delete
    clause adds no extra shuffle, only a filter on each side of it.
    """
    if check_unique_source:
        _assert_unique_keys(source, keys)
    flag = F.coalesce(F.col(delete_col), F.lit(False))
    upserts = source.filter(~flag).drop(delete_col)
    t = target.alias("__mt")
    s = source.alias("__ms")
    cond = None
    for k in keys:
        c = F.col(f"__mt.{k}").eqNullSafe(F.col(f"__ms.{k}"))
        cond = c if cond is None else (cond & c)
    # target rows not matched by ANY source row (upsert or delete) stay
    kept_target = t.join(s, on=cond, how="left_anti")
    return kept_target.unionByName(upserts.select(*target.columns))


def upsert_full_conditional(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    update_when,
    check_unique_source: bool = True,
) -> DataFrame:
    """S12 variant: ``whenMatchedUpdate(condition)`` + insert-all.

    Matched keys take the source row only when ``update_when`` (a
    Column over aliases ``__mt``/``__ms``) holds — e.g.
    ``F.struct("__ms.ts", "__ms.event_id") > F.struct("__mt.ts",
    "__mt.event_id")`` for last-write-wins upserts whose result is
    independent of micro-batch arrival order (used by the streaming
    foreachBatch sink). One full-outer shuffle on the keys.
    """
    if check_unique_source:
        _assert_unique_keys(source, keys)
    cols = target.columns
    t = target.withColumn("__t_present", F.lit(1)).alias("__mt")
    s = source.select(*cols).withColumn("__s_present", F.lit(1)).alias("__ms")
    cond = None
    for k in keys:
        c = F.col(f"__mt.{k}").eqNullSafe(F.col(f"__ms.{k}"))
        cond = c if cond is None else (cond & c)
    j = t.join(s, on=cond, how="full_outer")
    take_source = F.col("__mt.__t_present").isNull() | (
        F.col("__ms.__s_present").isNotNull() & update_when
    )
    out = [
        F.when(take_source, F.col(f"__ms.{c}")).otherwise(F.col(f"__mt.{c}")).alias(c)
        for c in cols
    ]
    return j.select(*out)


def scd2_delta(
    current: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    change_cols: Sequence[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
    check_unique_source: bool = True,
    check_order: bool = False,
    check_ts: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The incremental core of the SCD Type 2 merge: apply a source
    snapshot against the CURRENT generation only and return
    ``(new_current, newly_closed)`` — the two deltas a history-bounded
    sink materializes separately (closed rows are immutable once
    written, so a streaming sink appends them instead of rewriting the
    accumulated history every epoch; see
    ``streaming.foreach_batch_scd2_run``).

    ``current`` must hold only open rows (``is_current`` true) with
    the full SCD column set. Semantics, guards, and the one-shuffle
    plan are those of ``scd2_apply``, which is this function plus the
    history pass-through union.

    ``check_ts=True`` (default) raises when the source carries a NULL
    ``ts_col`` for a row that would change or insert a key: a NULL
    close timestamp writes ``valid_to = NULL`` on the closed row —
    indistinguishable from an open interval under the
    valid_to-IS-NULL convention — and ``valid_from = NULL`` on the new
    one, silently corrupting interval semantics. Unchanged/absent keys
    tolerate NULL ts (nothing is written for them). Set False only
    when upstream guarantees non-NULL snapshot timestamps and the
    extra ``limit(1)`` assertion probe matters.
    """
    if not change_cols:
        raise ValueError("scd2_apply needs at least one change column")
    out_cols = [*keys, *change_cols, valid_from, valid_to, is_current]
    if check_unique_source:
        _assert_unique_keys(source, keys)
    cur = current.withColumn("__t_present", F.lit(1)).alias("__mt")
    src = source.withColumn("__s_present", F.lit(1)).alias("__ms")

    cond = None
    for k in keys:
        c = F.col(f"__mt.{k}").eqNullSafe(F.col(f"__ms.{k}"))
        cond = c if cond is None else (cond & c)
    j = cur.join(src, on=cond, how="full_outer")
    matched = F.col("__mt.__t_present").isNotNull() & F.col(
        "__ms.__s_present"
    ).isNotNull()
    differs = None
    for c in change_cols:
        d = ~F.col(f"__mt.{c}").eqNullSafe(F.col(f"__ms.{c}"))
        differs = d if differs is None else (differs | d)
    # rows the merge would write: changed keys + brand-new keys
    writes = (matched & differs) | F.col("__mt.__t_present").isNull()

    violation = None
    if check_ts:
        violation = writes & F.col(f"__ms.{ts_col}").isNull()
    if check_order:
        stale = matched & differs & (
            F.col(f"__ms.{ts_col}") < F.col(f"__mt.{valid_from}")
        )
        violation = stale if violation is None else (violation | stale)
    if violation is not None:
        bad = (
            j.filter(violation)
            .select(
                F.col(f"__ms.{ts_col}").alias("__ts"),
                *[F.col(f"__ms.{k}") for k in keys],
            )
            .limit(1)
            .collect()
        )
        if bad:
            key_vals = tuple(bad[0][1:])
            if bad[0]["__ts"] is None:
                raise ValueError(
                    f"NULL source {ts_col!r} for changed/new key {key_vals} — "
                    "a NULL close/open timestamp corrupts SCD2 interval "
                    "semantics (valid_to=NULL reads as an open interval); "
                    "supply snapshot timestamps or pass check_ts=False"
                )
            raise ValueError(
                f"out-of-order snapshot: source ts predates valid_from for "
                f"key {key_vals} — apply snapshots in ts order"
            )

    # surviving current rows (unchanged, or key not in source)
    kept = j.filter(
        F.col("__mt.__t_present").isNotNull() & ~(matched & differs)
    ).select(*[F.col(f"__mt.{c}").alias(c) for c in out_cols])
    # new current versions: changed keys + brand-new keys
    fresh = j.filter(writes).select(
        *[F.col(f"__ms.{c}").alias(c) for c in [*keys, *change_cols]],
        F.col(f"__ms.{ts_col}").alias(valid_from),
        F.lit(None).cast(current.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(is_current),
    )
    # closed-out versions of changed rows (immutable once emitted)
    closed = j.filter(matched & differs).select(
        *[F.col(f"__mt.{c}").alias(c) for c in [*keys, *change_cols, valid_from]],
        F.col(f"__ms.{ts_col}").alias(valid_to),
        F.lit(False).alias(is_current),
    )
    return kept.unionByName(fresh), closed


def scd2_apply(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    change_cols: Sequence[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
    check_unique_source: bool = True,
    check_order: bool = False,
    check_ts: bool = True,
) -> DataFrame:
    """SCD Type 2 merge: history-tracking upsert (the warehouse pattern
    Delta expresses as a two-action MERGE; Kimball slowly-changing
    dimension type 2). The target carries full version history
    (``valid_from``/``valid_to``/``is_current``); applying a source
    snapshot:

    - key absent from target          → insert new current version
    - current row, change_cols differ → close it (valid_to = source
      ts, is_current = false) AND insert the new current version
    - current row, identical          → unchanged
    - historical rows (is_current false OR NULL) and keys absent from
      the source → untouched (SCD2 never deletes history; a NULL
      is_current is treated as history, not dropped)

    Change detection is null-safe per column; row presence on each
    join side is tracked with explicit marker columns (a NULL
    ``ts_col`` in the source cannot masquerade as absence). Every
    target column must be a key, a change column, or an SCD
    bookkeeping column — anything else raises instead of silently
    vanishing from the output.

    PRECONDITION: snapshots must be applied in non-decreasing ts
    order. A late snapshot older than a row's ``valid_from`` would
    write an inverted interval and promote stale data;
    ``check_order=True`` runs an assertion job that raises in that
    case (an extra aggregate over the changed rows — enable it in
    backfills and tests, skip it on hot paths with trusted ordering).
    A NULL source ts on a changed/new key raises by default
    (``check_ts`` — see ``scd2_delta``).

    The source must be unique per key (``check_unique_source=False``
    skips the assertion job when the caller already deduped, as with
    ``upsert_full_conditional``). Plan: one shuffle on the keys for
    the current-rows join; history passes through without joining —
    at 100 TB the join side is only the CURRENT generation, not the
    full history (and the streaming sink doesn't even rewrite it —
    ``scd2_delta`` exposes the closed rows for append-only storage).
    """
    if not change_cols:
        raise ValueError("scd2_apply needs at least one change column")
    out_cols = [*keys, *change_cols, valid_from, valid_to, is_current]
    extra = [c for c in target.columns if c not in out_cols]
    if extra:
        raise ValueError(
            f"target columns {extra} are neither keys, change_cols, nor "
            "SCD bookkeeping columns; scd2_apply would silently drop "
            "them — add them to change_cols or project them away first"
        )
    cur = target.filter(F.col(is_current)).select(*out_cols)
    # NULL is_current rows route to history (pass-through), never drop
    hist = target.filter(
        ~F.coalesce(F.col(is_current), F.lit(False))
    ).select(*out_cols)
    new_current, closed = scd2_delta(
        cur,
        source,
        keys,
        change_cols,
        ts_col=ts_col,
        valid_from=valid_from,
        valid_to=valid_to,
        is_current=is_current,
        check_unique_source=check_unique_source,
        check_order=check_order,
        check_ts=check_ts,
    )
    return hist.unionByName(new_current).unionByName(closed)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    status_col: str = "change",
) -> DataFrame:
    """CDC-style table diff: classify every key as ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` between two snapshots —
    the audit companion of the versioned-commit layout (what changed
    between ``read_version(N-1)`` and ``read_version(N)``?) and the
    change feed Delta's CDF exposes.

    Output: key columns + ``change`` + every non-key column twice
    (``old_<c>``, ``new_<c>``; NULL on the absent side). ``changed``
    means any non-key column differs under null-safe comparison.

    One full-outer null-safe join on the keys — the same single
    exchange MERGE itself costs; at 100 TB run it on two versions
    pruned to the partitions of interest first.
    """
    val_cols = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema mismatch: {sorted(old.columns)} vs {sorted(new.columns)}"
        )
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in val_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in val_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    diff_any = None
    for c in val_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        diff_any = d if diff_any is None else diff_any | d
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(diff_any if diff_any is not None else F.lit(False), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in keys
        ],
        status.alias(status_col),
        *[F.col(f"old_{c}") for c in val_cols],
        *[F.col(f"new_{c}") for c in val_cols],
    )


def _nullsafe_outer_combine(
    left: DataFrame, right: DataFrame, on: Sequence[str]
) -> DataFrame:
    """Full-outer join on NULL-SAFE equality of ``on`` with the join
    columns coalesced back to single columns. ``join(on=list)`` uses
    plain ``=``: a NULL grouping value then never matches its own
    counterpart and the output carries two unmerged rows with split
    aggregates (round-5 ADVICE). ``<=>`` keeps this an equi-join, so
    Catalyst still plans a hash join. Non-join column names must be
    disjoint between the two sides (true at both call sites)."""
    renamed = right
    for c in on:
        renamed = renamed.withColumnRenamed(c, f"__r_{c}")
    cond = None
    for c in on:
        eq = left[c].eqNullSafe(renamed[f"__r_{c}"])
        cond = eq if cond is None else (cond & eq)
    joined = left.join(renamed, on=cond, how="full_outer")
    return joined.select(
        *[F.coalesce(left[c], renamed[f"__r_{c}"]).alias(c) for c in on],
        *[left[c] for c in left.columns if c not in on],
        *[renamed[c] for c in renamed.columns if not c.startswith("__r_")],
    )


def incremental_agg_maintain(
    agg_state: DataFrame | None,
    feed: DataFrame,
    old_snapshot: DataFrame | None,
    keys: Sequence[str],
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n_rows",
    delete_col: str | None = None,
    order_desc: Sequence[str] | None = None,
) -> DataFrame:
    """Incremental materialized-view maintenance (IVM) for sum/count
    aggregates over a last-write-wins table: apply an O(changes)
    change feed (``txn.change_feed``) to a persisted aggregate WITHOUT
    re-scanning the base table — the downstream consumer pattern that
    makes a change feed worth writing. At 100 TB, re-aggregating a
    table to refresh a dashboard costs a full scan per refresh; this
    costs O(changes) + O(|groups|).

    Semantics: ``feed`` holds the upserted rows (possibly several per
    key across epochs); ``old_snapshot`` is the table AS OF the feed's
    start (None for a cold start). Each changed key's POST-FEED table
    row is resolved with the SAME ordering the table itself uses
    (``txn.reconstruct_latest``: max ``order_desc``, ties to the
    earliest epoch) — pass the sink's ``order_desc`` so a late-arriving
    feed row with an older order key loses to the snapshot's incumbent
    here exactly as it does in the table (round-5 ADVICE: resolving by
    ``__sg_seq desc`` alone silently diverged on late arrivals). When
    ``order_desc`` is omitted, resolution falls back to last-epoch-wins
    (``__sg_seq desc``), which is exact ONLY if the order key is
    monotone in the commit epoch (no late arrivals). For every changed
    key the old row's contribution is retracted and the resolved row's
    added; new keys add a count of 1. ``agg_state`` (group_cols +
    sum_cols + count) is merged with the per-group net delta via one
    null-safe full-outer combine (NULL grouping values form one group,
    as in SQL GROUP BY). Exact for sums/counts (any retractable
    aggregate).

    Known limit: ``old_snapshot`` is the tombstone-FILTERED read, so a
    late feed row older than a still-physical tombstone is treated as
    an insert here while the table keeps the key deleted — with
    ``order_desc`` monotone per key across epochs (the upsert sink's
    contract for deletes) the case cannot arise.

    Shapes: the retract lookup is a semi-join of the old snapshot
    against the changed keys — O(changes) probe rows; with the base
    range-clustered on the key it prunes to the files holding changed
    keys. The incumbent-vs-feed resolution adds only O(changes) rows to
    the window. The final combine touches only groups present in state
    or delta.
    """
    seq = "__sg_seq"
    from . import cleanse

    has_seq = seq in feed.columns
    if order_desc:
        order = [F.col(c).desc() for c in order_desc] + (
            [F.col(seq).asc()] if has_seq else []
        )
    else:
        order = [F.col(seq).desc()] if has_seq else []
    changed_keys = feed.select(*keys).distinct()
    old_rows = (
        old_snapshot.join(changed_keys, on=list(keys), how="leftsemi")
        if old_snapshot is not None
        else None
    )
    pool = feed
    if order_desc and old_rows is not None:
        # snapshot incumbents compete under the table's ordering; they
        # predate every feed epoch, so they carry the minimal seq (an
        # order-key tie resolves to the incumbent, as in the table)
        incumbent = old_rows
        if has_seq:
            incumbent = incumbent.withColumn(
                seq, F.lit(-(1 << 62)).cast("long")
            )
        pool = incumbent.unionByName(feed, allowMissingColumns=True)
    final_rows = (
        cleanse.dedup_first_wins(pool, list(keys), order) if order else pool
    ).drop(seq)
    # tombstones (``delete_col`` true, see the upsert sink): the key's
    # old contribution retracts like any change, but nothing is added
    if delete_col is not None and delete_col in final_rows.columns:
        final_rows = final_rows.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        )
    contrib_new = final_rows.groupBy(*group_cols).agg(
        *[F.sum(F.col(c).cast("double")).alias(f"__n_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("__n_cnt"),
    )
    if old_rows is not None:
        contrib_old = old_rows.groupBy(*group_cols).agg(
            *[F.sum(F.col(c).cast("double")).alias(f"__o_{c}") for c in sum_cols],
            F.count(F.lit(1)).alias("__o_cnt"),
        )
    else:
        contrib_old = None
    delta = (
        contrib_new
        if contrib_old is None
        else _nullsafe_outer_combine(contrib_new, contrib_old, list(group_cols))
    )
    zero = F.lit(0.0)
    net_cols = [
        (
            F.coalesce(F.col(f"__n_{c}"), zero)
            - (F.coalesce(F.col(f"__o_{c}"), zero) if contrib_old is not None else zero)
        ).alias(f"__d_{c}")
        for c in sum_cols
    ]
    net_cnt = (
        F.coalesce(F.col("__n_cnt"), F.lit(0))
        - (
            F.coalesce(F.col("__o_cnt"), F.lit(0))
            if contrib_old is not None
            else F.lit(0)
        )
    ).alias("__d_cnt")
    delta = delta.select(*group_cols, *net_cols, net_cnt)
    if agg_state is None:
        return delta.select(
            *group_cols,
            *[F.col(f"__d_{c}").alias(c) for c in sum_cols],
            F.col("__d_cnt").cast("long").alias(count_col),
        ).filter(F.col(count_col) > 0)
    merged = _nullsafe_outer_combine(agg_state, delta, list(group_cols))
    out = merged.select(
        *group_cols,
        *[
            (
                F.coalesce(F.col(c), F.lit(0.0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0.0))
            ).alias(c)
            for c in sum_cols
        ],
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col("__d_cnt"), F.lit(0))
        ).cast("long").alias(count_col),
    )
    # groups whose every row vanished (possible under general deletes;
    # here only via retract-to-zero) drop out of the view
    return out.filter(F.col(count_col) > 0)

"""Payload-only mutation overlay shared by the two persisted indexes
(`ann_index.ann_index_set_payload`, `text_index.text_index_set_payload`)
— the Qdrant ``set_payload`` analog: update a point's payload WITHOUT
re-sending the vector / re-tokenizing the text (the reference's
re-labeling flow, ``status=pending→validated``, does this with a full
point upsert because its client loop already holds the vectors —
deduplicate_from_qdrant.py:188-210; a real serving user re-labels
without re-embedding).

Why an overlay and not a row in the main delta tail: both indexes fold
latest-per-key, so a payload-only row winning the fold would null out
the codes / doclen columns it does not carry. Instead each
``set_payload`` commit writes one O(batch) segment of
``(id, epoch, <set columns>, __set_<col> flags)`` referenced ONLY from
the index metadata (``payload_deltas``) and the component's
change-feed record — never the read list — and every payload-consuming
read merges it:

- `overlay_fold` reduces all overlay segments to one row per id with,
  per payload column, the latest EXPLICITLY SET value and the epoch
  that set it (column-subset updates: a column absent from a batch is
  untouched, Qdrant's key-merge semantics; a column set to NULL is a
  real null).
- `overlay_merge` left-joins the (broadcast, O(payload changes since
  compaction)) fold onto index rows and takes the overlay value only
  when its set-epoch is NEWER than the row's own epoch — so a later
  full upsert of the point resets its payload, and a delete →
  re-upsert resurrection ignores pre-delete labels.

Compaction bakes the merged values into the rewritten rows and clears
``payload_deltas``, restoring payload-predicate parquet pushdown (the
merged column is a computed expression until then). At 100 TB the
overlay is the same cost class as the delta tail every probe already
reads: tiny, bounded by compaction cadence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEQ = "__sg_seq"


def set_flag_col(p: str) -> str:
    return f"__set_{p}"


def overlay_fold(
    rows: DataFrame, payload_cols: list[str], id_col: str
) -> tuple[DataFrame | None, list[str]]:
    """One row per id over the unioned overlay segments: per payload
    column, ``__pl_<col>`` (latest set value) and ``__pls_<col>`` (the
    epoch that set it, null = never set). Columns no overlay segment
    ever set (absent even after mergeSchema) are skipped — returns the
    effective column list alongside the fold."""
    eff = [p for p in payload_cols if set_flag_col(p) in rows.columns]
    if not eff:
        return None, []
    aggs = []
    for p in eff:
        setter = F.when(F.col(set_flag_col(p)), F.col(_SEQ))
        aggs.append(F.max_by(F.col(p), setter).alias(f"__pl_{p}"))
        aggs.append(F.max(setter).alias(f"__pls_{p}"))
    return rows.groupBy(id_col).agg(*aggs), eff


def overlay_merge(
    df: DataFrame,
    overlay: DataFrame | None,
    eff_cols: list[str],
    id_col: str,
    epoch_col: str,
) -> DataFrame:
    """Apply a fold from `overlay_fold` to index rows: per column, the
    overlay value wins iff its set-epoch is strictly newer than the
    row's ``epoch_col`` (build/upsert epoch riding every stored row).
    No overlay (None) returns ``df`` untouched — the zero-delta plan,
    and its parquet pushdown, is byte-identical to before this feature
    existed."""
    if overlay is None:
        return df
    out = df.join(F.broadcast(overlay), on=id_col, how="left")
    for p in eff_cols:
        newer = F.col(f"__pls_{p}") > F.coalesce(
            F.col(epoch_col), F.lit(-1).cast("long")
        )
        out = out.withColumn(
            p, F.when(newer, F.col(f"__pl_{p}")).otherwise(F.col(p))
        )
    return out.drop(
        *[f"__pl_{p}" for p in eff_cols], *[f"__pls_{p}" for p in eff_cols]
    )


def validate_update_cols(
    updates: DataFrame, payload_cols: list[str], id_col: str, root: str
) -> list[str]:
    """The sanity gate both set_payload entry points share: the index
    must store payload columns, the batch must set at least one, and
    every set column must be a stored one (a typo'd column would
    otherwise commit an overlay no filter ever reads)."""
    if not payload_cols:
        raise ValueError(
            f"index at {root!r} stores no payload columns; build it with "
            "payload_cols to enable set_payload"
        )
    if id_col not in updates.columns:
        raise ValueError(f"updates must carry the id column {id_col!r}")
    upd = [c for c in updates.columns if c != id_col]
    unknown = [c for c in upd if c not in payload_cols]
    if unknown:
        raise ValueError(
            f"unknown payload columns {unknown}; index at {root!r} "
            f"stores {payload_cols}"
        )
    if not upd:
        raise ValueError("updates must set at least one payload column")
    return upd

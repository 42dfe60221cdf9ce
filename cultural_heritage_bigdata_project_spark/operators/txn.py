"""Crash-safe table commits for file-backed sinks.

Round-1 staging swaps had a crash window: between
``os.replace(data, old)`` and ``os.replace(staging, data)`` the table
does not exist, and a streaming checkpoint that already recorded the
batch as committed would resume from only-new files — silent data
loss. A leftover ``*_old``/staging directory from a crash also broke
the next swap.

Two remedies, both POSIX-rename-atomic:

- **Versioned publish** (`publish_version` / `current_version_dir`):
  data lives in ``data_v{N}`` directories under a table root; the
  committed version is whatever the ``CURRENT`` pointer file names.
  Publishing = write the new directory, then atomically rename a tmp
  pointer over ``CURRENT``. There is no moment where the table is
  missing; a crash leaves at worst an unreferenced directory, removed
  by `cleanup_unpublished` on the next run. This is the single-node
  analog of a Delta/Iceberg commit log (one pointer instead of a log),
  and maps to `_delta_log`/metastore pointer swaps on a cluster
  (ref eu_raw_to_cleansed_merge.py:62-69 staging-table transaction).

- **Swap recovery** (`recover_swap`): for plain-path tables whose
  contract is "this directory IS the parquet table", the in-place
  swap keeps a ``*__old`` backup; `recover_swap` runs before any swap
  and restores the backup if a previous crash left the target missing,
  then clears stale backup/staging dirs so the swap cannot collide.
"""

from __future__ import annotations

import json
import os
import shutil

CURRENT = "CURRENT"
MANIFEST = "MANIFEST.json"
SEGMENTS_DIR = "segments"


def _read_pointer(root: str) -> list[str]:
    """The committed-version manifest: first line = current version
    directory name, subsequent lines = RETAINED older versions (newest
    first). A round-2-era single-line file reads as a one-entry
    manifest — fully backward compatible."""
    ptr = os.path.join(root, CURRENT)
    try:
        with open(ptr, encoding="utf-8") as f:
            return [ln.strip() for ln in f if ln.strip()]
    except FileNotFoundError:
        return []


def current_version_dir(root: str) -> str | None:
    """The committed data directory, or None if nothing published."""
    names = _read_pointer(root)
    if not names:
        return None
    path = os.path.join(root, names[0])
    return path if os.path.isdir(path) else None


def list_versions(root: str) -> list[str]:
    """Committed + retained version directory names, newest first —
    the time-travel surface (Delta's DESCRIBE HISTORY analog for this
    pointer-file layout)."""
    return [
        n for n in _read_pointer(root) if os.path.isdir(os.path.join(root, n))
    ]


def version_dir(root: str, version: str | int) -> str:
    """Resolve a retained version to its directory path. ``version``
    is a directory name (``data_v7``) or an integer suffix (``7``).
    Raises KeyError for versions not retained (vacuumed or never
    committed) — time travel only reaches what retention kept."""
    name = f"data_v{version}" if isinstance(version, int) else version
    if name not in list_versions(root):
        raise KeyError(
            f"version {name!r} is not retained under {root!r}; "
            f"available: {list_versions(root)} (raise keep_last at publish "
            "time to retain more history)"
        )
    return os.path.join(root, name)


def segment_path(root: str, name: str) -> str:
    """An immutable segment directory under the shared segment store.
    Segments are written once and then only ever referenced by version
    manifests — the file-layout move that bounds streaming-sink write
    amplification to O(batch), not O(table) (Delta/Iceberg data files
    play the same role under their commit logs)."""
    return os.path.join(root, SEGMENTS_DIR, name)


def _has_parquet(path: str) -> bool:
    """True if the directory holds at least one parquet part file.
    Spark writes no part file for an empty DataFrame, and reading such
    a directory fails schema inference — writers use this to drop
    empty segments from manifests instead of publishing unreadable
    references."""
    try:
        return any(f.endswith(".parquet") for f in os.listdir(path))
    except FileNotFoundError:
        return False


def write_manifest(root: str, dirname: str, components: dict) -> None:
    """Write a version's component manifest (fsync'd; the version is
    not visible until ``publish_version`` repoints CURRENT, so no
    atomicity is needed here).

    ``components`` maps a component name ('' for the default table) to
    ``{"base": <subdir of the version dir or None>,
       "segments": [<names under root/segments>],
       "reconstruct": <None or a latest-by-key spec>}``.
    """
    path = os.path.join(root, dirname, MANIFEST)
    with open(path, "w", encoding="utf-8") as f:
        json.dump({"components": components}, f)
        f.flush()
        os.fsync(f.fileno())


def read_manifest(root: str, dirname: str) -> dict | None:
    """The component manifest of a version directory, or None for a
    plain (pre-manifest) parquet version."""
    try:
        with open(os.path.join(root, dirname, MANIFEST), encoding="utf-8") as f:
            return json.load(f)["components"]
    except FileNotFoundError:
        return None


def reconstruct_latest(df, spec: dict, keep_seq: bool = False):
    """Merge-on-read reconstruction for delta-segmented upsert tables:
    latest row per key across base+delta segments. The winning row is
    the one a strict left-fold of conditional upserts would keep — max
    ``order_desc`` key, ties broken toward the EARLIEST segment (the
    incumbent wins a tie, matching ``upsert_full_conditional``'s
    strict ``>``). NULL order keys sort last under ``desc`` and so
    never displace a non-NULL incumbent."""
    from pyspark.sql import functions as F

    from . import cleanse

    order = [F.col(c).desc() for c in spec["order_desc"]] + [
        F.col(spec["seq_col"]).asc()
    ]
    out = cleanse.dedup_first_wins(df, spec["keys"], order)
    return out if keep_seq else out.drop(spec["seq_col"])


def read_version(spark, root: str, version: str | int | None = None, subdir: str | None = None):
    """Time-travel read: the parquet contents of a retained version
    (default: current). ``subdir`` selects a component of a composite
    commit (e.g. the streaming corpus dedup publishes corpus/ fps/
    bands/ together).

    Manifest-bearing versions (the segmented streaming-sink layout)
    resolve to the union of the version's base component and its
    referenced immutable segments; a ``reconstruct`` spec additionally
    applies the latest-by-key merge-on-read collapse. Plain parquet
    version directories read as before."""
    if version is None:
        path = current_version_dir(root)
        if path is None:
            raise FileNotFoundError(f"nothing published under {root!r}")
    else:
        path = version_dir(root, version)
    components = read_manifest(root, os.path.basename(path))
    if components is None:
        if subdir is not None:
            path = os.path.join(path, subdir)
        return spark.read.parquet(path)
    name = subdir or ""
    if name not in components:
        raise KeyError(
            f"component {name!r} not in version manifest; available: "
            f"{sorted(components)}"
        )
    comp = components[name]
    paths = []
    if comp.get("base"):
        paths.append(os.path.join(path, comp["base"]))
    paths.extend(segment_path(root, s) for s in comp.get("segments", []))
    if not paths:
        raise FileNotFoundError(
            f"version {os.path.basename(path)!r} component {name!r} is empty"
        )
    df = spark.read.parquet(*paths)
    spec = comp.get("reconstruct")
    return reconstruct_latest(df, spec) if spec else df


def publish_version(root: str, dirname: str, keep_last: int = 1) -> str:
    """Atomically point ``CURRENT`` at ``root/dirname`` (which must be
    fully written), then garbage-collect unreferenced versions.

    ``keep_last`` is the retention knob: the manifest keeps the new
    version plus the ``keep_last - 1`` most recent predecessors, which
    stay readable via ``read_version`` (time travel). The default 1
    keeps only the new version — the original space-frugal behavior.
    Retention is part of the SAME atomic pointer write, so a crash
    can never orphan a retained version or retain an orphan.
    """
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    retained = [dirname] + [n for n in _read_pointer(root) if n != dirname]
    retained = retained[:keep_last]
    tmp = os.path.join(root, CURRENT + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(retained))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, CURRENT))
    cleanup_unpublished(root)
    return os.path.join(root, dirname)


def cleanup_unpublished(root: str) -> list[str]:
    """Remove data_v* directories not referenced by the pointer
    manifest (stale partial writes from crashed commits, or versions
    aged out of retention), then segment directories referenced by no
    retained version (orphans of a crash between segment write and
    publish, or segments whose last referencing version aged out).
    Returns removed names."""
    keep = set(_read_pointer(root))
    removed = []
    if not os.path.isdir(root):
        return removed
    for name in os.listdir(root):
        if name.startswith("data_v") and name not in keep:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            removed.append(name)
    seg_root = os.path.join(root, SEGMENTS_DIR)
    if os.path.isdir(seg_root):
        referenced: set[str] = set()
        for name in keep:
            components = read_manifest(root, name)
            for comp in (components or {}).values():
                referenced.update(comp.get("segments", []))
        for name in os.listdir(seg_root):
            if name not in referenced:
                shutil.rmtree(os.path.join(seg_root, name), ignore_errors=True)
                removed.append(os.path.join(SEGMENTS_DIR, name))
    stale_tmp = os.path.join(root, CURRENT + ".tmp")
    if os.path.exists(stale_tmp):
        os.remove(stale_tmp)
    return removed


def recover_swap(path: str, staging_suffixes: tuple[str, ...] = ("__staging",)) -> None:
    """Repair the aftermath of a crashed in-place staging swap on a
    plain-path table: restore the ``__old`` backup if the target
    vanished mid-swap, then clear stale backup/staging directories."""
    old = path.rstrip("/") + "__old"
    if not os.path.exists(path) and os.path.exists(old):
        os.replace(old, path)
    shutil.rmtree(old, ignore_errors=True)
    for suf in staging_suffixes:
        shutil.rmtree(path.rstrip("/") + suf, ignore_errors=True)

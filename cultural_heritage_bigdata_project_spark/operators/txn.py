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

import os
import shutil

CURRENT = "CURRENT"


def current_version_dir(root: str) -> str | None:
    """The committed data directory, or None if nothing published."""
    ptr = os.path.join(root, CURRENT)
    try:
        with open(ptr, encoding="utf-8") as f:
            name = f.read().strip()
    except FileNotFoundError:
        return None
    path = os.path.join(root, name)
    return path if os.path.isdir(path) else None


def publish_version(root: str, dirname: str) -> str:
    """Atomically point ``CURRENT`` at ``root/dirname`` (which must be
    fully written), then garbage-collect unreferenced versions."""
    tmp = os.path.join(root, CURRENT + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(dirname)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, CURRENT))
    cleanup_unpublished(root)
    return os.path.join(root, dirname)


def cleanup_unpublished(root: str) -> list[str]:
    """Remove data_v* directories not referenced by CURRENT (stale
    partial writes from crashed commits). Returns removed names."""
    cur = current_version_dir(root)
    cur_name = os.path.basename(cur) if cur else None
    removed = []
    if not os.path.isdir(root):
        return removed
    for name in os.listdir(root):
        if name.startswith("data_v") and name != cur_name:
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
            removed.append(name)
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

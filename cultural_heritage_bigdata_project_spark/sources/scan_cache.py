"""Splittable-layout scan cache for single-file fixture tables.

The driver fixtures ship each table as ONE parquet file with ONE row
group (the reference's lake has the same shape after a single-writer
COPY — reference: spark-apps/eu-to-raw/metadata_eu_to_raw.py writes
one object per batch). Spark parallelizes a scan by splitting files at
row-group boundaries, so a one-row-group file pins the ENTIRE first
stage — scan, filter, projection, regex, explode, partial aggregation
— to one core no matter how many executors the cluster has. At 100 TB
ingestion writes thousands of files and this never happens; on the
local fixtures it silently serializes every query's map stage.

This module converts such a table ONCE into the layout the engine
would ingest at scale — N parquet files with identical schema and
row order — and hands scans the converted directory. Properties:

- **Semantic no-op.** pyarrow slices the original table; schema
  (including INT64 TIMESTAMP(NANOS) events columns), values, and
  global row order are preserved file-by-file. Every query result,
  DuckDB oracle comparison, and plan gate is unchanged — only the
  number of input splits differs.
- **No new Exchange.** Parallelism comes from input splits, exactly
  as on a real cluster — the no-shuffle plan gates
  (tests/test_plans.py) hold; scan-shaped operators stay scan-shaped.
- **Keyed by content identity.** Cache key = absolute path + mtime +
  size + layout version, so a regenerated fixture invalidates itself.
- **Crash/race safe.** Built under a process-unique temp dir and
  published with an atomic rename; a concurrent builder loses the
  rename and discards its copy.
- **Opt-out.** ``SPARK_GRAFT_NO_SCAN_CACHE=1`` reads sources as-is
  (debugging / layout-sensitivity checks).

Small tables (< ``_MIN_ROWS_TO_SPLIT``) and already-multi-file
directories pass through untouched.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

_VERSION = "v1"
_MIN_ROWS_TO_SPLIT = 2048  # below this a single task is the right plan
_ROWS_PER_FILE_FLOOR = 256
_MAX_FILES = 32


def _cache_root() -> str:
    return os.path.join(tempfile.gettempdir(), "spark_graft_scan_cache")


def splittable_path(src: str) -> str:
    """Return a path whose scan parallelizes: ``src`` itself when it is
    already splittable (directory of files, many row groups, or small),
    else a cached N-file conversion of it."""
    if os.environ.get("SPARK_GRAFT_NO_SCAN_CACHE") == "1":
        return src
    if not os.path.isfile(src):
        return src  # directory fixture: file-count parallelism exists
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(src).metadata
    except Exception:
        return src
    rows = meta.num_rows
    if rows < _MIN_ROWS_TO_SPLIT or meta.num_row_groups >= _MAX_FILES:
        return src
    n_files = min(_MAX_FILES, max(2, rows // _ROWS_PER_FILE_FLOOR))
    st = os.stat(src)
    key = hashlib.sha256(
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}|{_VERSION}|{n_files}".encode()
    ).hexdigest()[:24]
    dest = os.path.join(_cache_root(), key)
    if os.path.isdir(dest) and os.path.exists(os.path.join(dest, "_OK")):
        return dest
    return _build(src, dest, n_files)


def _build(src: str, dest: str, n_files: int) -> str:
    import pyarrow.parquet as pq

    table = pq.read_table(src)
    rows = table.num_rows
    per = (rows + n_files - 1) // n_files
    tmp = f"{dest}.build.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    try:
        for i in range(n_files):
            chunk = table.slice(i * per, per)
            if chunk.num_rows == 0:
                break
            # store_schema + version 2.6 round-trips nanosecond
            # timestamps and nested types bit-exactly
            pq.write_table(
                chunk,
                os.path.join(tmp, f"part-{i:05d}.parquet"),
                version="2.6",
            )
        with open(os.path.join(tmp, "_OK"), "w") as f:
            f.write(_VERSION)
        os.makedirs(_cache_root(), exist_ok=True)
        try:
            os.rename(tmp, dest)
        except OSError:
            # a concurrent builder published first — use theirs
            shutil.rmtree(tmp, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return dest

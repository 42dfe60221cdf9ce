#!/usr/bin/env python
"""Amplify a documents fixture K-fold for scale benching (writes
OUTSIDE the read-only testdata tree). Replica k of a doc gets three
replica-unique filler tokens prepended so replicas are near- but not
exact duplicates — the workload shape MinHash-LSH exists for.

Usage: python tools/amplify_docs.py SRC_SF_DIR DEST_DIR [K]
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    src, dest = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT d.doc_id + t.k * (SELECT max(doc_id) + 1 FROM
           read_parquet('{src}/documents.parquet')) AS doc_id,
         CASE WHEN t.k = 0 THEN d.text
              ELSE 'u' || t.k || 'a' || d.doc_id || ' v' || t.k || 'b'
                   || d.doc_id || ' w' || t.k || 'c' || d.doc_id
                   || ' ' || d.text END AS text,
         d.lang, d.source, d.n_chars
  FROM read_parquet('{src}/documents.parquet') d,
       unnest(range({k})) AS t(k)
) TO '{dest}/documents.parquet' (FORMAT PARQUET)
"""
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{dest}/documents.parquet')"
    ).fetchone()[0]
    print(f"wrote {n} docs to {dest}/documents.parquet")


if __name__ == "__main__":
    main()

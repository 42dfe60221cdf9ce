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
    if "--full" in sys.argv:
        amplify_full(con, src, dest, k)


def amplify_full(con, src: str, dest: str, k: int) -> None:
    """Amplify the REST of the fixture into a complete sf directory so
    the whole catalog can run at a second scale point (round-4 verdict
    #5). FK consistency is preserved: replicated fact keys get a
    replica offset, dimension references stay in the original key
    space; dimensions themselves copy through unchanged (at 100 TB the
    dims are the small side — that is the point of broadcasting them).
    Embeddings replicate with offset ids and a deterministic first-
    component nudge so replicas are near- but not exact duplicates
    (mirroring the documents scheme)."""
    amps = {
        "orders": """
  SELECT o_orderkey + t.k * (SELECT max(o_orderkey) + 1 FROM {S}) AS o_orderkey,
         o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {S}, unnest(range({K})) AS t(k)""",
        "lineitem": """
  SELECT l_orderkey + t.k * (SELECT max(o_orderkey) + 1
           FROM read_parquet('{src}/orders.parquet')) AS l_orderkey,
         l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM {S}, unnest(range({K})) AS t(k)""",
        "events": """
  SELECT event_id + t.k * (SELECT max(event_id) + 1 FROM {S}) AS event_id,
         ts, user_id, event_type, value, props
  FROM {S}, unnest(range({K})) AS t(k)""",
        "embeddings": """
  SELECT vec_id + t.k * (SELECT max(vec_id) + 1 FROM {S}) AS vec_id,
         CASE WHEN t.k = 0 THEN embedding
              ELSE list_prepend(CAST(embedding[1] + 0.001 * t.k AS FLOAT),
                                embedding[2:]) END AS embedding,
         label
  FROM {S}, unnest(range({K})) AS t(k)""",
    }
    for table, body in amps.items():
        s = f"read_parquet('{src}/{table}.parquet')"
        sql = body.format(S=s, K=k, src=src)
        con.execute(f"COPY ({sql}) TO '{dest}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}/{table}.parquet')"
        ).fetchone()[0]
        print(f"wrote {n} rows to {dest}/{table}.parquet")
    for table in ["customer", "supplier", "part", "region", "nation"]:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{dest}/{table}.parquet' (FORMAT PARQUET)"
        )
    print("copied dimension tables unchanged")


if __name__ == "__main__":
    main()

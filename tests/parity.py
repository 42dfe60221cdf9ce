"""Local mirror of the driver's Spark-vs-DuckDB correctness gate.

Compares a catalog query's Spark result with its DuckDB oracle:
row count, schema (column names sorted), and order-insensitive values.
Stricter than the driver (exact value equality with a tiny float
tolerance knob) so any driver hash mismatch is caught here first.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return (
        df.sort_values(by=list(df.columns), na_position="first")
        .reset_index(drop=True)
    )


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "?") -> None:
    """Raise AssertionError with a readable diff on any mismatch."""
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    for c in spark_pdf.columns:
        st, ot = str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype)
        assert st == ot, f"{name}: dtype mismatch col={c}: spark={st} oracle={ot}"
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None and b is None:
                continue
            a_nan = isinstance(a, float) and math.isnan(a)
            b_nan = isinstance(b, float) and math.isnan(b)
            if (a is None or a_nan) and (b is None or b_nan):
                continue
            if isinstance(a, float) and isinstance(b, float):
                ok = a == b or math.isclose(a, b, rel_tol=1e-12, abs_tol=1e-12)
            else:
                ok = a == b
            assert ok, (
                f"{name}: value mismatch col={col} sorted-row={i}: "
                f"spark={a!r} oracle={b!r}"
            )

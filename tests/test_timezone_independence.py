"""Session-timezone independence of event-ts normalization, plus
empty-directory stream declaration (round-2 ADVICE items).

The engine's contract: ``events.ts`` always surfaces as TIMESTAMP_NTZ
carrying the UTC wall-clock, whatever the parquet generation (INT64
nanos-as-long or TIMESTAMP micros, NTZ or LTZ) and whatever the
caller's ``spark.sql.session.timeZone``. Without this, batch results
(and batch-stream equivalence) diverge from the UTC-fixed DuckDB
oracle under non-UTC sessions.
"""

from __future__ import annotations

import contextlib
import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cultural_heritage_bigdata_project_spark import streaming
from cultural_heritage_bigdata_project_spark.sources.tables import (
    _ts_to_ntz_utc,
    load_table,
)

from .conftest import SF_DIR


@contextlib.contextmanager
def session_tz(spark, tz: str):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_load_table_events_ts_is_session_tz_independent(spark):
    def min_max(tz):
        with session_tz(spark, tz):
            ev = load_table(spark, SF_DIR, "events")
            assert isinstance(ev.schema["ts"].dataType, T.TimestampNTZType)
            row = ev.agg(
                F.min("ts").cast("string").alias("lo"),
                F.max("ts").cast("string").alias("hi"),
            ).first()
            return row.lo, row.hi

    assert min_max("UTC") == min_max("America/New_York") == min_max("Asia/Tokyo")


def test_ntz_utc_normalization_of_ltz_column(spark):
    """Directly exercise the TIMESTAMP_LTZ branch (fixtures may read as
    NTZ under inferTimestampNTZ, which would skip it): a fixed UTC
    instant must render the UTC wall-clock whatever the session tz."""
    instant = dt.datetime(2024, 6, 1, 12, 0, 0, tzinfo=dt.timezone.utc)

    def rendered(tz):
        with session_tz(spark, tz):
            df = spark.createDataFrame(
                [(instant,)], T.StructType([T.StructField("ts", T.TimestampType())])
            )
            out = df.select(
                _ts_to_ntz_utc(spark, F.col("ts"), df.schema["ts"].dataType)
                .cast("string")
                .alias("s")
            )
            return out.first().s

    assert rendered("UTC") == "2024-06-01 12:00:00"
    assert rendered("America/New_York") == "2024-06-01 12:00:00"
    assert rendered("Asia/Tokyo") == "2024-06-01 12:00:00"


def test_events_stream_empty_dir_requires_ts_type(spark, tmp_path):
    """A landing directory with no files must REFUSE a declaration
    without an explicit ts_type: a guessed schema would fail the
    stream's first batch at runtime if the other ts generation arrives
    (round-3 advice — was a warn-and-guess). With ts_type pinned the
    declaration succeeds (next test)."""
    import pytest

    with pytest.raises(ValueError, match="ts_type"):
        streaming.events_stream(spark, str(tmp_path))


def test_events_stream_explicit_ts_type_skips_probe(spark, tmp_path):
    """Callers can pin the on-disk ts representation so declaration
    never depends on which files happen to exist yet."""
    from pyspark.sql import types as T

    s = streaming.events_stream(spark, str(tmp_path), ts_type=T.LongType())
    assert s.isStreaming
    assert isinstance(s.schema["ts"].dataType, T.TimestampNTZType)
    s2 = streaming.events_stream(
        spark, str(tmp_path), ts_type=T.TimestampNTZType()
    )
    assert isinstance(s2.schema["ts"].dataType, T.TimestampNTZType)

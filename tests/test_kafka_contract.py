"""Kafka builder contract (S1/S6): no broker or spark-sql-kafka package
exists in this environment, so the closable surface is the option
plumbing — the exact reader/writer option dicts the builders apply
(reference consumer contract: metadata_eu_to_raw.py:53-59; producer:
annotation_producer.py:144-158). A format-swap or option-typo bug
would otherwise surface only at deployment.
"""

from __future__ import annotations

import pytest
from pyspark.sql.streaming.readwriter import DataStreamWriter

from cultural_heritage_bigdata_project_spark import streaming

from .conftest import SF_DIR


def test_kafka_stream_options_contract():
    opts = streaming.kafka_stream_options("broker1:9092,broker2:9092", "events")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events",
        # a restarted consumer must not reprocess history by default
        "startingOffsets": "latest",
        # transient broker truncation must not kill the query
        "failOnDataLoss": "false",
    }


def test_kafka_stream_options_backfill_offsets():
    opts = streaming.kafka_stream_options(
        "b:9092", "events", starting_offsets="earliest"
    )
    assert opts["startingOffsets"] == "earliest"


def test_kafka_sink_options_contract(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    opts = streaming.kafka_sink_options("b:9092", "out-topic", ckpt)
    assert opts == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out-topic",
        # exactly-once-per-epoch replay depends on the checkpoint
        "checkpointLocation": ckpt,
    }


def test_kafka_sink_builds_writer_without_broker(spark, tmp_path):
    """The sink builder must be constructible (format/options applied,
    value cast in place) without a broker — only .start() needs one."""
    stream = streaming.events_stream(spark, f"{SF_DIR}/events.parquet")
    writer = streaming.kafka_sink(
        stream, "b:9092", "out-topic", str(tmp_path / "ckpt")
    )
    assert isinstance(writer, DataStreamWriter)


def test_kafka_stream_fails_only_at_load(spark):
    """Declaring the source fails at .load() (no kafka package here) —
    with the data-source-not-found error, NOT an option error; proves
    the builder reaches the load boundary with valid plumbing."""
    with pytest.raises(Exception) as exc:
        streaming.kafka_stream(spark, "b:9092", "events")
    msg = str(exc.value)
    assert "kafka" in msg.lower()
    assert "DATA_SOURCE" in msg or "Failed to find" in msg, msg

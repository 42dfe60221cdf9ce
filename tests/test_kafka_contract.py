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


# ---------------------------------------------------------------- round 7:
# negative paths + a broker-free end-to-end drive of the post-source
# pipeline over the exact Kafka wire schema (round-6 VERDICT item 6).


def test_kafka_stream_options_reject_bad_inputs():
    with pytest.raises(ValueError, match="brokers"):
        streaming.kafka_stream_options("", "events")
    with pytest.raises(ValueError, match="topic"):
        streaming.kafka_stream_options("b:9092", "  ")
    # the deployment-killing typo: 'earliest'/'latest'/JSON map only
    with pytest.raises(ValueError, match="startingOffsets"):
        streaming.kafka_stream_options("b:9092", "events", "earlyest")
    # explicit per-partition offsets stay accepted
    opts = streaming.kafka_stream_options(
        "b:9092", "events", '{"events":{"0":23}}'
    )
    assert opts["startingOffsets"] == '{"events":{"0":23}}'


def test_kafka_sink_options_reject_missing_checkpoint():
    with pytest.raises(ValueError, match="checkpointLocation"):
        streaming.kafka_sink_options("b:9092", "out", "")


def test_kafka_wire_parse_rejects_non_wire_input(spark):
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(ValueError, match="wire columns"):
        streaming.kafka_wire_parse(df, "a int")


def test_kafka_wire_parse_end_to_end_without_broker(spark, tmp_path):
    """Drive parse -> keyed landing over a STREAM carrying the exact
    Kafka wire schema (KAFKA_WIRE_SCHEMA), fed from files instead of a
    broker — everything downstream of the socket runs for real: binary
    value JSON decode with explicit schema, provenance columns, and the
    streaming write. Only `.format("kafka").load()` itself stays gated."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    payloads = [
        {"id": i, "title": f"t{i}", "score": i / 2}
        for i in range(6)
    ]
    wire_rows = [
        (
            str(p["id"]).encode(),
            _json.dumps(p).encode(),
            "events",
            i % 2,
            i,
        )
        for i, p in enumerate(payloads)
    ]
    src = spark.createDataFrame(
        wire_rows, "key binary, value binary, topic string, partition int, offset long"
    ).select(
        "*",
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    wire_dir = str(tmp_path / "wire")
    src.coalesce(1).write.parquet(wire_dir)

    stream = spark.readStream.schema(streaming.KAFKA_WIRE_SCHEMA).parquet(wire_dir)
    parsed = streaming.kafka_wire_parse(
        stream, "id long, title string, score double"
    )
    out = str(tmp_path / "landing")
    (
        parsed.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        r["id"]: (r["title"], r["score"], r["_topic"], r["_partition"], r["_offset"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        p["id"]: (p["title"], p["score"], "events", i % 2, i)
        for i, p in enumerate(payloads)
    }

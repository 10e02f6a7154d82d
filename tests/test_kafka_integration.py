"""S1/S2 Kafka integration — executable when the environment provides it,
an explicitly documented fence when it does not.

The reference's entire transport is Kafka (``CentralStation.java:58-59``,
``Rain-Detector/.../Main.java:31,48``). This sandbox ships neither the
``spark-sql-kafka-0-10`` connector jar nor a broker, so the wrappers in
``sources/kafka.py`` normally can't be driven end-to-end here; the parse
path downstream is proven source-agnostic instead
(test_pipeline_paths.test_kafka_and_file_parse_paths_are_identical).

This module closes the evidence gap the honest way: it probes for the
connector and a broker at collection time. On a machine that has both
(set ``KAFKA_BOOTSTRAP``, add the connector via ``--packages``), the e2e
runs for real — produce the reference wire shape to a topic, read it
back, parse, and hash-compare against the in-memory frame. Here, it
skips with the fence spelled out, so the skip marker in the test report
IS the documentation of what is fenced and why.
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

from weather_monitoring_spark.sources.kafka import (
    WEATHER_TOPIC,
    kafka_available,
)

#: Broker address the e2e uses when present. No default probe of a live
#: service beyond a TCP connect; nothing is produced unless both the
#: connector and the broker exist.
KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")


def _broker_reachable(bootstrap: str, timeout_s: float = 0.5) -> bool:
    host, _, port = bootstrap.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=timeout_s):
            return True
    except OSError:
        return False


def test_kafka_round_trip_or_documented_fence(spark, tmp_path):
    """E2E when possible; a named, single-reason skip when fenced."""
    if not kafka_available(spark):
        pytest.skip(
            "S1/S2 fence: spark-sql-kafka-0-10 connector not on the "
            "classpath in this container (add --packages "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "to run this e2e; the parse path itself is covered "
            "source-agnostically in test_pipeline_paths)"
        )
    if not _broker_reachable(KAFKA_BOOTSTRAP):
        pytest.skip(
            f"S1/S2 fence: no Kafka broker reachable at {KAFKA_BOOTSTRAP} "
            "(set KAFKA_BOOTSTRAP to run this e2e)"
        )

    from pyspark.sql import functions as F

    from weather_monitoring_spark.sources.generator import synthetic_wire_json_batch
    from weather_monitoring_spark.streaming.archive import parse_wire

    topic = f"{WEATHER_TOPIC}-test-{uuid.uuid4().hex[:8]}"
    # key = stationId string, the reference's producer contract
    # (WeatherStation.java:58-62)
    wire = synthetic_wire_json_batch(spark, 200, seed=29).select(
        F.get_json_object("value", "$.stationId").alias("key"),
        F.col("value").cast("string"),
    )

    # produce (batch write through the same sink format the stream uses)
    (
        wire.write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    # consume from the beginning and compare the parsed multiset
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(
            F.col("key").cast("string").alias("key"),
            F.col("value").cast("string").alias("value"),
        )
    )
    sent = parse_wire(wire).select("_parsed.stationId", "_parsed.sequenceNumber")
    got = parse_wire(back).select("_parsed.stationId", "_parsed.sequenceNumber")
    assert got.count() == 200
    assert sent.exceptAll(got).count() == 0
    assert got.exceptAll(sent).count() == 0

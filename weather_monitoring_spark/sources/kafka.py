"""S1/S2 — Kafka source/sink wrappers.

The reference's entire transport is two Kafka topics: ``weather-data``
(producers -> Central Station + Rain Detector, ``CentralStation.java:58-59``)
and ``raining-alerts`` (Rain Detector output, ``Rain-Detector/.../Main.java:48``).

These wrappers produce exactly the reference's wire shape: key = stationId
string (``WeatherStation.java:58-62``), value = camelCase JSON. They
require the ``spark-sql-kafka-0-10`` package on the classpath and a
broker, neither of which exists in this container — the plumbing is the
deliverable; the identical parse/normalize path is fully tested via the
file and rate sources (the DataFrame algebra downstream is source-agnostic
by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

WEATHER_TOPIC = "weather-data"  # CentralStation.java:30
ALERTS_TOPIC = "raining-alerts"  # Rain-Detector/.../Main.java:28


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath.

    The engine's transforms are source-agnostic, so callers fall back to
    the file/rate sources (tests do exactly that) when this is False —
    deployment adds ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``.
    """
    try:
        # py4j returns a JavaPackage stub (no exception) for classes that
        # are NOT on the classpath, so attribute access alone is a false
        # positive; Class.forName actually loads or throws.
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = WEATHER_TOPIC,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka -> DataFrame[key string, value string, ...]; pair with
    ``streaming.archive.parse_wire`` for the canonical path.

    ``maxOffsetsPerTrigger`` is the backpressure bound (the Kafka analogue
    of the reference's ``maxFilesPerTrigger=50``,
    ``SparkParquetStreamingToElasticsearch.java:82``)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    raw = reader.load()
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        "topic",
        "partition",
        "offset",
        F.col("timestamp").alias("kafka_timestamp"),
    )


def write_kafka_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str = "key",
    value_col: str = "value",
    trigger: dict | None = None,
) -> StreamingQuery:
    """DataFrame -> Kafka topic (S2). ``df`` must provide string key/value
    columns; use ``to_json(struct(...))`` upstream for structured rows."""
    trig = trigger or {"processingTime": "10 seconds"}
    return (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.col(value_col).cast("string").alias("value"),
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trig)
        .start()
    )

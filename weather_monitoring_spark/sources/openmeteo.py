"""S9 — the Open-Meteo HTTP adapter (the reference's one real-data
producer, ``Open-Meteo/src/main/java/org/example/WeatherDataFetcher.java``).

The reference polls ``api.open-meteo.com`` every 3 s for Cairo's current
weather, rounds the three measures to ints (``:45-47``), and publishes the
same wire JSON as the synthetic stations.

An HTTP poll is driver-side by nature (one request per interval — there
is nothing to distribute), so the Spark-side shape is: poller thread ->
rows appended to a rate-paced stream, or simply a batch call per
micro-batch via ``foreachBatch``. This module provides:

- ``parse_current_weather``: the response-JSON -> (humidity, temperature,
  wind_speed) transform with the reference's rounding (P13), pure and
  fully tested;
- ``fetch_current_weather``: the live HTTP call (urllib; no external
  deps), which this container cannot exercise (no network egress) — tests
  inject canned responses into the parser instead;
- ``wire_message``: assembly of the camelCase wire JSON with epoch-second
  timestamp precision (P12, ``OpenMeteoChannelAdapter.java:20``).
"""

from __future__ import annotations

import json
import time
import urllib.request

#: URL template (WeatherDataFetcher.java:19-26). Cairo: 30.0444, 31.2357
#: (docker-compose.yaml:186-187).
API_URL = (
    "https://api.open-meteo.com/v1/forecast"
    "?latitude={lat}&longitude={lon}"
    "&current=relative_humidity_2m,temperature_2m,wind_speed_10m"
)
CAIRO = (30.0444, 31.2357)
OPEN_METEO_STATION_ID = 11
POLL_INTERVAL_S = 3  # WeatherDataProducer.java:64


def parse_current_weather(payload: dict) -> dict[str, int]:
    """Extract + round the three measures (P13: Math.round equivalent —
    half away from zero, which Python's int(x+0.5) mimics for the
    non-negative measures involved)."""
    cur = payload["current"]

    def r(x: float) -> int:
        return int(x + 0.5) if x >= 0 else -int(-x + 0.5)

    return {
        "humidity": r(float(cur["relative_humidity_2m"])),
        "temperature": r(float(cur["temperature_2m"])),
        "wind_speed": r(float(cur["wind_speed_10m"])),
    }


def fetch_current_weather(lat: float = CAIRO[0], lon: float = CAIRO[1], timeout: float = 10.0) -> dict[str, int]:
    """Live HTTP poll (requires network egress — unavailable in this
    container; kept real for deployments)."""
    with urllib.request.urlopen(API_URL.format(lat=lat, lon=lon), timeout=timeout) as resp:
        return parse_current_weather(json.load(resp))


def wire_message(weather: dict[str, int], s_no: int, station_id: int = OPEN_METEO_STATION_ID) -> str:
    """camelCase wire JSON, epoch-second timestamp precision (P12)."""
    return json.dumps(
        {
            "stationId": station_id,
            "sequenceNumber": s_no,
            "batteryStatus": "high",
            "statusTimestamp": int(time.time()) * 1000,
            "weather": weather,
        }
    )

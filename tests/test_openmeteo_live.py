"""S9 live Open-Meteo integration — executable when network egress
exists, a documented fence otherwise (same pattern as the Kafka and ES
integration tests).

The parser and wire shape are fully covered offline in
test_pipeline_paths.test_openmeteo_parser_and_wire_shape; the only thing
this sandbox can't exercise is the actual HTTP fetch
(``sources/openmeteo.fetch_current_weather``). This test probes DNS+TCP
to the API host and, when reachable, runs the real fetch -> parse ->
wire -> canonical pipeline end-to-end.
"""

from __future__ import annotations

import json
import socket

import pytest

API_HOST = "api.open-meteo.com"


def _network_reachable(host: str = API_HOST, timeout_s: float = 2.0) -> bool:
    try:
        with socket.create_connection((host, 443), timeout=timeout_s):
            return True
    except OSError:
        return False


def test_live_fetch_or_documented_fence(spark):
    if not _network_reachable():
        pytest.skip(
            f"S9 fence: no network egress to {API_HOST} in this container "
            "(the parser + wire shape are covered offline in "
            "test_pipeline_paths; the fetch itself needs a deployment "
            "with egress)"
        )

    from weather_monitoring_spark.sources.openmeteo import (
        fetch_current_weather,
        wire_message,
    )
    from weather_monitoring_spark.streaming.archive import wire_to_canonical

    weather = fetch_current_weather()
    assert set(weather) == {"humidity", "temperature", "wind_speed"}
    assert all(isinstance(v, int) for v in weather.values())
    assert 0 <= weather["humidity"] <= 100

    msg = wire_message(weather, s_no=1)
    df = spark.createDataFrame([(msg,)], "value string")
    canonical, rejects = wire_to_canonical(df)
    assert canonical.count() == 1 and rejects.count() == 0
    row = canonical.first()
    assert row.weather_humidity == weather["humidity"]
    assert json.loads(msg)["stationId"] == row.station_id

from weather_monitoring_spark.streaming.archive import parse_wire, run_archive_stream
from weather_monitoring_spark.streaming.latest_view import LatestView
from weather_monitoring_spark.streaming.rain_alerts import rain_alerts

__all__ = ["LatestView", "parse_wire", "rain_alerts", "run_archive_stream"]

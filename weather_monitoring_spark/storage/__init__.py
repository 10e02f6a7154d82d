from weather_monitoring_spark.storage.bucketing import write_bucketed

__all__ = ["write_bucketed"]

from weather_monitoring_spark.functions.exact import davg, dsum, o_davg, o_dsum

__all__ = ["davg", "dsum", "o_davg", "o_dsum"]

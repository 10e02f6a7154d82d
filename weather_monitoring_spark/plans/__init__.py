from weather_monitoring_spark.plans.registry import REGISTRY, QuerySpec, all_queries, query

__all__ = ["REGISTRY", "QuerySpec", "all_queries", "query"]

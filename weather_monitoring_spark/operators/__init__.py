from weather_monitoring_spark.operators.core import (
    dedup_by_key,
    latest_per_key,
    normalize_wire,
    point_lookup,
    sequence_gaps,
    split_valid_rejects,
    top_k,
    with_partition_cols,
)

__all__ = [
    "dedup_by_key",
    "latest_per_key",
    "normalize_wire",
    "point_lookup",
    "sequence_gaps",
    "split_valid_rejects",
    "top_k",
    "with_partition_cols",
]

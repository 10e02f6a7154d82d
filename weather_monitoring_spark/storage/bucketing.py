"""Bucketed-table storage: co-located joins and aggregations without a
shuffle.

At 100 TB the recurring fact-to-fact join (e.g. readings x alerts on
station_id, or orders x lineitem on orderkey) dominates shuffle volume.
Writing both sides ``bucketBy(N, key)`` (+ ``sortBy`` for merge-ready
row groups) pins co-partitioning at rest: Spark's planner drops the
Exchange on both sides of a bucket-aligned join, so the join runs
map-side. The reference has no analogue (its only store is per-station
parquet files); this is the Spark-native answer to "keep the big join
cheap forever".

Bucketed tables require the table catalog (``saveAsTable``) — plain
``parquet(path)`` writes ignore bucket metadata.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    ``overwrite`` also clears a stale managed-table location: the
    metastore can be ephemeral (in-memory catalog) while the warehouse
    directory persists, and Spark refuses to recreate a managed table on
    top of an orphaned location (LOCATION_ALREADY_EXISTS).
    """
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def join_shuffle_exchanges(spark: SparkSession, left: str, right: str, on: str) -> int:
    """Diagnostic: number of shuffle Exchanges the join of two tables
    plans. Auto-broadcast is disabled during planning so the comparison
    isolates the bucketing effect (at dim-table sizes the planner would
    otherwise broadcast and skip bucketed scans entirely — which is the
    right call at that scale, but not what this probe measures).
    """
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            spark.table(left)
            .join(spark.table(right), on)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return plan.count("Exchange hashpartitioning")


def bucketed_join_is_shuffle_free(spark: SparkSession, left: str, right: str, on: str) -> bool:
    return join_shuffle_exchanges(spark, left, right, on) == 0

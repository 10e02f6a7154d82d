"""Batch parquet table loaders for the driver's testdata.

Replaces the reference's per-record Avro Parquet reader loop
(``ElasticSearch/src/main/java/org/example/ParquetToElasticsearch.java:176-215``)
with Spark's vectorized parquet scan — column pruning and predicate pushdown
reach the scan automatically when callers select/filter on the returned
DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Tables the driver materializes at /root/testdata/sf*/ (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Vectorized parquet scan of one testdata table.

    ``events.parquet`` carries a parquet TIMESTAMP(NANOS) column, which
    Spark's reader rejects outright (PARQUET_TYPE_ILLEGAL). We read nanos
    as long (``spark.sql.legacy.parquet.nanosAsLong``) and convert to a
    proper TimestampType with exact integer division — the driver's data is
    microsecond-aligned, so ``ns div 1000`` is lossless and matches what
    DuckDB presents for the same file.
    """
    # Defensive: the caller's session may not come from session.get_spark
    # (the driver harness builds its own). Timestamp-derived results
    # (to_date/hour/window/date_trunc) must render at UTC to match the
    # TZ-naive DuckDB oracle, so pin it at the loader boundary too.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

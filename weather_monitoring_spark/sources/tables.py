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
    if name == "events":
        # Scope the legacy conf to this one read: it is consumed when the
        # relation is planned (verified: collects after restore still
        # succeed), and leaving it set session-wide would make every later
        # parquet read silently present TIMESTAMP(NANOS) columns as bigint
        # instead of erroring.
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(path)
        finally:
            if prior is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
    else:
        df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_ntz(df)


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to session-local TimestampType.

    Parquet ``timestamp[us]`` without a zone annotation surfaces as
    TIMESTAMP_NTZ under Spark 4's reader. With the session tz pinned to UTC
    the cast is numerically a no-op, and it lets every downstream plan
    (``unix_micros``, ``F.window``, ``date_trunc``) treat all testdata
    timestamps uniformly as TimestampType — matching what DuckDB's oracle
    sees for the same file.
    """
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    # Top-level columns only by design: no testdata table nests
    # timestamps inside struct/array/map. Guard that assumption loudly —
    # a nested NTZ passing through un-cast would make unix_micros/window
    # plans diverge from the oracle silently.
    nested_ntz = [c for c, t in df.dtypes if t != "timestamp_ntz" and "timestamp_ntz" in t]
    if nested_ntz:
        raise NotImplementedError(
            f"TIMESTAMP_NTZ nested inside {nested_ntz}: _normalize_ntz only "
            "handles flat schemas; add a recursive cast before using this table"
        )
    if not ntz_cols:
        return df
    # The cast below resolves against the session timezone lazily (at
    # action time, not here) — it is only a numeric no-op under UTC, so
    # pin-and-check now rather than let a later tz mutation shift epochs.
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise AssertionError(
            f"NTZ normalization requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}); load tables via load_table, which pins it"
        )
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""S4/S6 — streaming parquet directory source.

The reference watches a directory two ways: a hand-rolled
``java.nio.WatchService`` loop with its own processed-file bookkeeping
(``ParquetToElasticsearch.java:87-174``) and Spark's file streaming source
(``SparkParquetStreamingToElasticsearch.java:78-85``). The Spark source
subsumes the watcher outright: file discovery, the processed-file log
(checkpointed), recursive lookup, and per-trigger admission control are
built in. This wrapper pins the reference's exact options: explicit
schema, no inference, <=50 files/trigger, ``*.parquet`` glob, recursive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAX_FILES_PER_TRIGGER = 50  # SparkParquetStreamingToElasticsearch.java:82


def read_parquet_stream(
    spark: SparkSession,
    directory: str,
    schema: T.StructType,
    max_files_per_trigger: int = MAX_FILES_PER_TRIGGER,
) -> DataFrame:
    """Stream newly-arriving parquet files under ``directory``.

    Schema is explicit and required — the reference disables streaming
    schema inference (``:47``) and so do we (inference re-lists the whole
    directory and can silently widen types mid-stream)."""
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .load(directory)
    )

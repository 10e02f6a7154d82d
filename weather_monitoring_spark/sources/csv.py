"""Batch CSV source with reject routing — the other interchange format
corpus metadata and tabular drops arrive in.

Same Spark-first shape as ``sources/jsonl.py``: the scan itself enforces
an explicit schema in PERMISSIVE mode with a corrupt-record column, then
one filter splits valid rows from rejects — malformed lines (wrong
column count, unparseable numerics) stay queryable instead of being
logged-and-dropped (T9 policy; the reference logs-and-drops at
``CentralStation.java:74-76``). An explicit schema is mandatory for the
same 100 TB reason: inference doubles the scan and makes types a
function of the data.

CSV-specific hygiene handled by scan options, not code: quoted fields
with embedded delimiters/newlines (``multiLine`` stays off — a 100 TB
input must stay line-splittable; quote embedded newlines are rejected,
which is the auditable outcome), a header row, and escaped quotes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

from weather_monitoring_spark.operators.core import split_valid_rejects
from weather_monitoring_spark.sources.jsonl import CORRUPT_COL, DOCUMENTS_SCHEMA


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    required: list[str] | None = None,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejects) from a CSV directory/file.

    A row is rejected when the line failed to parse against the schema
    (corrupt column non-null) or any ``required`` column is null — both
    checks are scan projections; ``rejects`` keeps the raw line."""
    base = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    ).add(CORRUPT_COL, StringType())
    df = (
        spark.read.schema(base)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("enforceSchema", "true")
        .csv(path)
    )
    ok = F.col(CORRUPT_COL).isNull()
    for c in required or []:
        ok = ok & F.col(c).isNotNull()
    valid, rejects = split_valid_rejects(df, ok)
    return valid.drop(CORRUPT_COL), rejects


def read_csv_documents(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """The documents-contract CSV loader: (valid, rejects) with
    doc_id/text required."""
    return read_csv(spark, path, DOCUMENTS_SCHEMA, required=["doc_id", "text"])

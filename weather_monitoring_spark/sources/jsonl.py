"""Batch JSONL source with reject routing — the input format most
document corpora arrive in (one JSON object per line, frequently with a
malformed tail from truncated uploads).

Spark-first shape: ``spark.read.json`` in PERMISSIVE mode with an
explicit schema and a corrupt-record column, then one filter split —
schema enforcement and parse errors are handled by the scan itself
(per-line, distributed, no Python), and bad lines stay queryable instead
of being logged-and-dropped (the same T9 policy as the streaming archive;
the reference logs-and-drops at ``CentralStation.java:74-76``).

An explicit schema is mandatory: schema inference reads the whole input
twice, which at 100 TB turns one pass into two; it also makes the loaded
frame's types a function of the data, which no downstream contract
should be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

from weather_monitoring_spark.operators.core import split_valid_rejects

CORRUPT_COL = "_corrupt_record"

#: The documents-table contract (TESTDATA.md) for corpus drops.
DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(valid, rejects) from a JSONL directory/file.

    A row is rejected when the line failed to parse (corrupt column
    non-null) or any ``required`` column is null — both checks are scan
    projections. ``rejects`` keeps the raw line for forensics."""
    base = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    ).add(CORRUPT_COL, StringType())
    df = (
        spark.read.schema(base)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    ok = F.col(CORRUPT_COL).isNull()
    for c in required or []:
        ok = ok & F.col(c).isNotNull()
    valid, rejects = split_valid_rejects(df, ok)
    return valid.drop(CORRUPT_COL), rejects


def read_jsonl_documents(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """The documents-contract JSONL loader: (valid, rejects) with
    doc_id/text required — the entry format for every corpus operator in
    ``operators/``."""
    return read_jsonl(
        spark, path, DOCUMENTS_SCHEMA, required=["doc_id", "text"]
    )

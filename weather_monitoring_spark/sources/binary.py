"""Binary-file asset source — the ingestion path for multimodal corpora
(image/audio/video files on disk or object storage) into the asset-table
contract that ``operators/multimodal.py`` consumes.

Spark-first shape: the built-in ``binaryFile`` format reads each file as
one row of (path, modificationTime, length, content BINARY) with the scan
distributed across executors — no driver-side file listing loops, no
Python I/O. Two scan-level controls matter at 100 TB:

- ``pathGlobFilter`` prunes by extension DURING listing (non-matching
  files are never opened);
- ``spark.sql.files.maxPartitionBytes`` governs how many files pack into
  a task — binary assets don't split mid-file, so partition balance
  comes from bin-packing whole files (size skew is then handled by the
  hash repartition inside the decode operators).

Media *kind* is derived from the file extension (the content-type
sniffing a real pipeline would do lives in the decode stage, behind the
Arrow boundary, where the payload bytes are already local). The asset id
is a deterministic content digest (md5 of path), NOT a
monotonically_increasing_id: ids must survive re-listing, re-partitioning
and incremental re-crawls.

Reference parity: the reference has no binary ingestion (file transport
is JSON wire messages); this extends the engine per the builder brief's
multimodal scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension -> asset kind; anything else is "other" (kept, filterable).
KIND_BY_EXT = {
    "jpg": "image",
    "jpeg": "image",
    "png": "image",
    "gif": "image",
    "wav": "audio",
    "mp3": "audio",
    "flac": "audio",
    "mp4": "video",
    "mkv": "video",
    "webm": "video",
}


def read_binary_assets(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Load a directory tree of media files as the asset-table contract:
    (asset_id, kind, payload, meta{source, n_bytes, content_type}).

    ``glob`` (e.g. ``*.png``) prunes at listing time via
    ``pathGlobFilter`` — excluded files are never read."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    kind_expr = F.lit(None).cast("string")
    # build CASE chain from the extension map (deterministic order)
    kind = None
    for e, k in sorted(KIND_BY_EXT.items()):
        cond = F.when(ext == e, k)
        kind = cond if kind is None else kind.when(ext == e, k)
    kind = (kind.otherwise("other") if kind is not None else kind_expr).alias("kind")
    return raw.select(
        F.expr(
            "CAST(conv(substring(md5(path), 1, 15), 16, 10) AS BIGINT)"
        ).alias("asset_id"),
        kind,
        F.col("content").alias("payload"),
        F.struct(
            F.col("path").alias("source"),
            F.col("length").cast("long").alias("n_bytes"),
            F.concat(F.lit("application/x-"), ext).alias("content_type"),
        ).alias("meta"),
    )

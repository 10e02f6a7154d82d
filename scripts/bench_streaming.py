#!/usr/bin/env python
"""Streaming ingest throughput bench (BASELINE.md target: >=10,000 msg/s
sustained generator -> canonical transform -> partitioned Snappy Parquet,
i.e. >=1000x the reference's ~10.33 msg/s design rate).

Usage: python scripts/bench_streaming.py [rows_per_second] [seconds]
Prints one JSON line {"metric": "streaming_ingest_rows_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rps = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0

    from pyspark.sql import functions as F

    from weather_monitoring_spark.session import get_spark
    from weather_monitoring_spark.sources.generator import synthetic_wire_stream
    from weather_monitoring_spark.streaming.archive import run_archive_stream

    spark = get_spark(app_name="wms-streaming-bench")
    tmp = tempfile.mkdtemp(prefix="wms_stream_bench_")
    try:
        # Wire JSON encode -> parse -> normalize -> partitioned parquet:
        # the full reference ingest path, not a shortcut.
        wire = synthetic_wire_stream(spark, rows_per_second=rps).select(
            F.to_json(F.struct("*")).alias("value")
        )
        queries = run_archive_stream(
            wire,
            f"{tmp}/archive",
            f"{tmp}/ckpt",
            trigger={"processingTime": "2 seconds"},
        )
        t0 = time.time()
        time.sleep(duration)
        for q in queries:
            q.stop()
        for q in queries:
            q.awaitTermination(60)
        elapsed = time.time() - t0

        rows = spark.read.parquet(f"{tmp}/archive").count()
        print(
            json.dumps(
                {
                    "metric": "streaming_ingest_rows_per_sec",
                    "value": round(rows / elapsed, 1),
                    "unit": "rows/sec",
                    "rows": rows,
                    "elapsed_sec": round(elapsed, 2),
                    "offered_rows_per_sec": rps,
                    "note": "generator->JSON->from_json->normalize->partitioned snappy parquet, checkpointed",
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

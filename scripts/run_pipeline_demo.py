#!/usr/bin/env python
"""Run the full weather-telemetry topology locally — the engine's
equivalent of the reference's docker-compose stack
(producers -> Kafka -> {rain detector, central station{BitCask, Parquet}}
-> indexer), as concurrent Structured Streaming queries over one source:

  synthetic generator (S10, 10 stations + the Open-Meteo station shape)
    -> wire JSON -> [archive+rejects] [latest view] [rain alerts]
       [continuous hourly rollup] [index sink] [live gap detector]

Usage: python scripts/run_pipeline_demo.py [seconds] [rows_per_second]
Everything runs in a temp dir and prints a summary at the end.
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
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    rps = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000

    from pyspark.sql import functions as F

    from weather_monitoring_spark.session import get_spark
    from weather_monitoring_spark.sources.generator import synthetic_wire_stream
    from weather_monitoring_spark.streaming.archive import run_archive_stream, wire_to_canonical
    from weather_monitoring_spark.streaming.continuous_agg import ContinuousRollup
    from weather_monitoring_spark.streaming.index_sink import attach_index_sink, fs_bulk_upsert
    from weather_monitoring_spark.streaming.latest_view import LatestView
    from weather_monitoring_spark.streaming.rain_alerts import rain_alerts
    from weather_monitoring_spark.streaming.stateful import live_gap_detector

    spark = get_spark(app_name="wms-demo")
    tmp = tempfile.mkdtemp(prefix="wms_demo_")
    trig = {"processingTime": "3 seconds"}
    queries = []
    try:
        wire = synthetic_wire_stream(spark, rows_per_second=rps).select(
            F.to_json(F.struct("*")).alias("value")
        )
        # 1+2. archive + rejects (the Central Station's parquet path)
        queries += run_archive_stream(
            wire, f"{tmp}/archive", f"{tmp}/ck_archive",
            rejects_dir=f"{tmp}/rejects", trigger=trig,
        )
        canonical, _ = wire_to_canonical(wire)
        # 3. latest-per-station serving view (BitCask)
        view = LatestView(spark, f"{tmp}/view")
        queries.append(view.attach(canonical, f"{tmp}/ck_view", trigger=trig))
        # 4. rain alerts (Rain Detector)
        queries.append(
            rain_alerts(canonical)
            .select(F.col("station_id").cast("string").alias("key"), F.col("alert").alias("value"))
            .writeStream.format("parquet")
            .option("path", f"{tmp}/alerts")
            .option("checkpointLocation", f"{tmp}/ck_alerts")
            .trigger(**trig)
            .start()
        )
        # 5. continuous hourly rollup (the Kibana surface, maintained live)
        rollup = ContinuousRollup(spark, f"{tmp}/rollup")
        queries.append(rollup.attach(canonical, f"{tmp}/ck_rollup", trigger=trig))
        # 6. index sink (Elasticsearch path, executor-side)
        queries.append(
            attach_index_sink(canonical, fs_bulk_upsert(f"{tmp}/index"), f"{tmp}/ck_index", trigger=trig)
        )
        # 7. live sequence-gap audit (custom stateful operator)
        queries.append(
            live_gap_detector(canonical)
            .writeStream.format("parquet")
            .option("path", f"{tmp}/gaps")
            .option("checkpointLocation", f"{tmp}/ck_gaps")
            .outputMode("append")
            .trigger(**trig)
            .start()
        )

        time.sleep(duration)
        for q in queries:
            q.stop()
        for q in queries:
            q.awaitTermination(60)

        # end-of-window maintenance: compact the closed partitions in
        # place (one file per (date, hour); reads bypass the sink log —
        # see streaming/archive.py)
        from weather_monitoring_spark.streaming.archive import (
            compact_archive,
            read_archive,
        )

        def _parquet_file_count(root: str) -> int:
            return sum(
                len([f for f in files if f.endswith(".parquet")])
                for _, _, files in os.walk(root)
            )

        files_before = _parquet_file_count(f"{tmp}/archive")
        compact_archive(spark, f"{tmp}/archive")
        archived = read_archive(spark, f"{tmp}/archive")
        summary = {
            "archived_rows": archived.count(),
            "archive_files_before_compaction": files_before,
            "archive_files_after_compaction": _parquet_file_count(f"{tmp}/archive"),
            "stations_in_view": view.get_all().count(),
            "alerts": spark.read.parquet(f"{tmp}/alerts").count(),
            "rollup_groups": rollup.read().count(),
            "indexed_docs": len(os.listdir(f"{tmp}/index")) if os.path.isdir(f"{tmp}/index") else 0,
            "gaps_detected": spark.read.parquet(f"{tmp}/gaps").count(),
            "elapsed_sec": duration,
        }
        sample = view.get(station_id=1).first()
        summary["station_1_latest_s_no"] = sample.s_no if sample else None
        print(json.dumps(summary))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-stage forensics for one query: runs it once (warm) with the UI on,
then dumps every stage's duration, task count, input/shuffle bytes and
the dominant operator names from the stage's details.

Usage: SPARK_UI=true python scripts/probe_r15_stages.py <query> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_UI", "true")

from weather_monitoring_spark.plans.registry import all_queries
from weather_monitoring_spark.session import get_spark


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name=f"wms-stages-{name}")
    spark.sparkContext.setLogLevel("ERROR")
    spec = all_queries()[name]
    # Warm pass (codegen, Arrow workers), then the measured pass.
    spec.spark(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    t_mark = time.time()
    t0 = time.perf_counter()
    spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0

    def get(path):
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    stages = get("/stages?status=complete")
    rows = []
    for s in stages:
        sub = s.get("submissionTime")
        if not sub:
            continue
        # e.g. 2026-08-17T11:00:00.123GMT
        ts = time.mktime(time.strptime(sub[:19], "%Y-%m-%dT%H:%M:%S"))
        if ts < t_mark - time.timezone - 2:
            continue
        rows.append(
            {
                "stage": s["stageId"],
                "dur_ms": s.get("executorRunTime"),
                "tasks": s.get("numCompleteTasks"),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "name": s.get("name", "")[:70],
            }
        )
    rows.sort(key=lambda r: r["stage"])
    print(json.dumps({"query": name, "wall_s": round(wall, 3), "n_stages": len(rows)}))
    for r in rows:
        print(
            f'  s{r["stage"]:>4} run={r["dur_ms"]:>7}ms tasks={r["tasks"]:>3} '
            f'in={r["input_mb"]:>6}MB sr={r["sh_read_mb"]:>6}MB '
            f'sw={r["sh_write_mb"]:>6}MB  {r["name"]}'
        )


if __name__ == "__main__":
    main()

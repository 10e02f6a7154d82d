#!/usr/bin/env python
"""Decompose a query's wall time: DataFrame build (analysis+checkpoint
compile), first noop execution, steady noop execution, and Spark job/stage
counts per phase. Usage:

    python scripts/probe_r15_qcost.py q50_dedup_survivors [more ...]

Prints one JSON line per query. Run on an otherwise idle host.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_monitoring_spark.plans.registry import all_queries
from weather_monitoring_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="wms-qcost")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    st = spark.sparkContext.statusTracker()
    # Warm the session (codegen caches, Arrow workers).
    warm = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in names:
        try:
            specs[name].spark(spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    for name in names:
        spec = specs[name]
        out: dict = {"query": name}
        jobs_before = len(st.getJobIdsForGroup(None))

        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        t1 = time.perf_counter()
        out["build_s"] = round(t1 - t0, 3)
        out["build_jobs"] = len(st.getJobIdsForGroup(None)) - jobs_before

        jb = len(st.getJobIdsForGroup(None))
        spark.sparkContext.setJobDescription(f"qcost:{name}:first")
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        out["exec1_s"] = round(t3 - t2, 3)
        out["exec1_jobs"] = len(st.getJobIdsForGroup(None)) - jb

        # Steady: rebuild the plan (fresh, as the bench does) and run again.
        jb = len(st.getJobIdsForGroup(None))
        spark.sparkContext.setJobDescription(f"qcost:{name}:steady")
        t4 = time.perf_counter()
        df2 = spec.spark(spark, sf_dir)
        t5 = time.perf_counter()
        df2.write.format("noop").mode("overwrite").save()
        t6 = time.perf_counter()
        out["build2_s"] = round(t5 - t4, 3)
        out["exec2_s"] = round(t6 - t5, 3)
        out["total2_s"] = round(t6 - t4, 3)
        out["exec2_jobs"] = len(st.getJobIdsForGroup(None)) - jb
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

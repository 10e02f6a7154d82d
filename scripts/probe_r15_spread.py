#!/usr/bin/env python
"""Measure every registry query with and without the spread-scan
repartition (SPARK_GRAFT_SPREAD_FORCE), interleaved passes, medians.

Two sessions would double JVM startup, so this toggles the env knob
between plan builds — load_table reads it at call time. Prints one JSON
line with per-query {off: s, on: s} medians and the delta.

Usage: python scripts/probe_r15_spread.py [runs] [query ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_monitoring_spark.plans.registry import all_queries
from weather_monitoring_spark.session import get_spark


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="wms-spread-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    if not names:
        names = sorted(specs)
    # Warm both plan shapes at the tiny SF.
    warm = "/root/testdata/sf0.001"
    for mode in ("0", "1"):
        os.environ["SPARK_GRAFT_SPREAD_FORCE"] = mode
        for n in names:
            try:
                specs[n].spark(spark, warm).write.format("noop").mode("overwrite").save()
            except Exception:
                pass

    t: dict[str, dict[str, list[float]]] = {n: {"off": [], "on": []} for n in names}
    for _ in range(runs):
        for mode, key in (("0", "off"), ("1", "on")):
            os.environ["SPARK_GRAFT_SPREAD_FORCE"] = mode
            for n in names:
                spark.sparkContext.setJobDescription(f"spread:{key}:{n}")
                t0 = time.perf_counter()
                try:
                    specs[n].spark(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    t[n][key].append(time.perf_counter() - t0)
                except Exception as e:
                    print(f"{n} {key} failed: {e}", file=sys.stderr)
                    t[n][key].append(-1.0)
    os.environ.pop("SPARK_GRAFT_SPREAD_FORCE", None)
    out = {}
    for n in names:
        off = statistics.median([x for x in t[n]["off"] if x >= 0] or [-1])
        on = statistics.median([x for x in t[n]["on"] if x >= 0] or [-1])
        out[n] = {
            "off": round(off, 3),
            "on": round(on, 3),
            "ratio": round(on / off, 3) if off > 0 else None,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

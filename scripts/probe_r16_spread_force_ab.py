#!/usr/bin/env python
"""Inverse spread audit: alternating-order interleaved A/B of
SPARK_GRAFT_SPREAD_FORCE=1 (spread EVERY load in the plan) vs the
registry default, for queries that do NOT currently pass spread=True but
carry non-trivial per-row scan work. A force-win flags a call site worth
promoting to spread=True (after a targeted fact-table-only re-check);
a loss/neutral confirms the current no-spread choice.

Usage: python scripts/probe_r16_spread_force_ab.py [runs] [query ...]
Writes scripts/probe_r16_spread_force_ab.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_monitoring_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"

#: No-spread queries with per-row work heavy enough to plausibly pay for
#: a spread exchange (decode, edit distance, scalar-function zoo,
#: percentile/window state, join fact sides).
CANDIDATES = [
    "q61_multimodal_decode",
    "q58_edit_distance",
    "q46_scalar_functions",
    "q22_percentiles",
    "q40_sessionization",
    "q57_window_zoo",
    "q19_shipping_priority",
    "q20_local_supplier_volume",
    "q14_distinct_counting",
]


def _run(spark, name: str, sf_dir: str, force: bool) -> float:
    from weather_monitoring_spark.plans.registry import all_queries

    prior = os.environ.get("SPARK_GRAFT_SPREAD_FORCE")
    if force:
        os.environ["SPARK_GRAFT_SPREAD_FORCE"] = "1"
    else:
        os.environ.pop("SPARK_GRAFT_SPREAD_FORCE", None)
    try:
        spark.sparkContext.setJobDescription(
            f"spreadForceAB:{name}:{'force' if force else 'asis'}"
        )
        t0 = time.perf_counter()
        df = all_queries()[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 4)
    finally:
        if prior is None:
            os.environ.pop("SPARK_GRAFT_SPREAD_FORCE", None)
        else:
            os.environ["SPARK_GRAFT_SPREAD_FORCE"] = prior


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = sys.argv[2:] or CANDIDATES
    spark = get_spark(app_name="wms-r16-spread-force-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        for force in (True, False):
            try:
                _run(spark, n, WARM, force)
            except Exception as e:  # pragma: no cover
                print(f"warm {n} {force} failed: {e}", file=sys.stderr)

    t: dict[str, list[float]] = {}
    for i in range(runs):
        for n in names:
            order = (True, False) if i % 2 == 0 else (False, True)
            for force in order:
                key = f"{n}:{'force' if force else 'asis'}"
                try:
                    t.setdefault(key, []).append(_run(spark, n, SF_DIR, force))
                except Exception as e:
                    print(f"{key} failed: {e}", file=sys.stderr)
                    t.setdefault(key, []).append(-1.0)

    out = {
        k: {
            "median": round(
                statistics.median([x for x in ts if x >= 0] or [-1]), 4
            ),
            "samples": ts,
        }
        for k, ts in t.items()
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_r16_spread_force_ab.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

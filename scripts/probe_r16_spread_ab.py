#!/usr/bin/env python
"""Interleaved per-query A/B of spread_scan ON vs OFF for every registry
query that passes spread=True (the 12 r15 call sites + q18's r16 form).

spread_scan reads SPARK_GRAFT_SPREAD at PLAN BUILD time, so one process
can build both variants of the same registered query by toggling the env
var around the build — no engine edits, and the comparison is interleaved
(one pass of every variant per round), so a host-throttle spike lands on
one pass of each variant instead of all passes of one (window-immune
medians, the r16 methodology).

Usage: python scripts/probe_r16_spread_ab.py [runs] [query ...]
Writes scripts/probe_r16_spread_ab.json.
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

#: Every registry query whose plan contains a load_table(spread=True)
#: call site (r15 set; q18 dropped its spread in r16 session 2).
SPREAD_QUERIES = [
    "q13_grouping_sets",
    "q15_rollup_aggregate",
    "q18_pricing_summary",
    "q26_doc_annotations",
    "q27_pii_quality",
    "q30_minhash_signatures",
    "q31_minhash_lsh_pairs",
    "q32_ngram_jaccard_pairs",
    "q34_simhash_neardup_pairs",
    "q35_cosine_topk",
    "q50_dedup_survivors",
    "q51_corpus_curation",
    "q52_json_extraction",
]


def _run(spark, name: str, sf_dir: str, spread_on: bool) -> float:
    from weather_monitoring_spark.plans.registry import all_queries

    prior = os.environ.get("SPARK_GRAFT_SPREAD")
    os.environ["SPARK_GRAFT_SPREAD"] = "1" if spread_on else "0"
    try:
        spark.sparkContext.setJobDescription(
            f"spreadAB:{name}:{'on' if spread_on else 'off'}"
        )
        t0 = time.perf_counter()
        df = all_queries()[name].spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 4)
    finally:
        if prior is None:
            os.environ.pop("SPARK_GRAFT_SPREAD", None)
        else:
            os.environ["SPARK_GRAFT_SPREAD"] = prior


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    names = sys.argv[2:] or SPREAD_QUERIES
    spark = get_spark(app_name="wms-r16-spread-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:  # warm both plan shapes at the tiny SF
        for on in (True, False):
            try:
                _run(spark, n, WARM, on)
            except Exception as e:  # pragma: no cover
                print(f"warm {n} {on} failed: {e}", file=sys.stderr)

    t: dict[str, list[float]] = {}
    for i in range(runs):
        for n in names:
            # Alternate which variant runs first each round: the first
            # execution of a back-to-back identical pair measured ~11%
            # slower in this window (q18 control with identical plans,
            # 0/7), so a fixed order biases every pair toward the
            # second position. Alternating cancels it in the medians.
            order = (True, False) if i % 2 == 0 else (False, True)
            for on in order:
                key = f"{n}:{'spread' if on else 'nospread'}"
                try:
                    t.setdefault(key, []).append(_run(spark, n, SF_DIR, on))
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
                        "probe_r16_spread_ab.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

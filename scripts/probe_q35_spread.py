#!/usr/bin/env python
"""q35 in-run spread isolation (VERDICT r13 #6): the r13 driver bench
showed q35_cosine_topk with min 0.57 s vs median 2.48 s — a 4.4x
in-run spread, the widest in the suite. The attributed class for such
spreads is in-loop interleaving + codegen-cache pressure + host band
(the q31/q50/q32 discipline); this probe decides whether q35's
signature is that class or a real plan instability.

Method: the standard isolation harness — fresh plan per run, noop-sink
forced, OUTSIDE the bench loop — but run TWICE per mode:

- "isolated": q35 alone, 6 runs back-to-back (fresh plan each);
- "interleaved": q35 with the two heaviest suite queries (q50, q32)
  executed between its runs, reproducing the bench loop's
  codegen-cache + memory context, 6 q35 samples.

If isolated spread is tight while interleaved reproduces the wide
band, the bench-loop signature IS the known in-loop class. The host
anchor (par32) brackets the measurement.

Usage: python scripts/probe_q35_spread.py [sf_dir]
Writes scripts/probe_q35_spread.json.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 6


def _anchor() -> dict | None:
    try:
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "host_anchor.py",
                ),
                "--par32-only",
            ],
            capture_output=True,
            text=True,
            timeout=180,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from weather_monitoring_spark.plans.registry import all_queries
    from weather_monitoring_spark.session import get_spark

    spark = get_spark(app_name="probe-q35")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    def force(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # steady-state warmup (the bench's own discipline)
    warm = "/root/testdata/sf0.001"
    for name in ("q35_cosine_topk", "q50_dedup_survivors",
                 "q32_ngram_jaccard_pairs"):
        try:
            specs[name].spark(spark, warm).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    a_pre = _anchor()
    isolated = [round(force("q35_cosine_topk"), 4) for _ in range(RUNS)]
    interleaved = []
    for _ in range(RUNS):
        force("q50_dedup_survivors")
        force("q32_ngram_jaccard_pairs")
        interleaved.append(round(force("q35_cosine_topk"), 4))
    a_post = _anchor()

    def stats(xs):
        return {
            "runs": xs,
            "min": min(xs),
            "median": round(statistics.median(xs), 4),
            "max": max(xs),
            "spread_max_over_min": round(max(xs) / min(xs), 2),
        }

    result = {
        "sf_dir": sf_dir,
        "isolated": stats(isolated),
        "interleaved": stats(interleaved),
        "anchor_pre": a_pre,
        "anchor_post": a_post,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_q35_spread.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

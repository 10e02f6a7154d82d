#!/usr/bin/env python
"""q50 cost decomposition (r12 verdict #4, the q31 discipline applied
to the suite's heaviest query).

q50_dedup_survivors = minhash_lsh_pairs (the q31 body) -> bounded
ngram_jaccard_verify on candidates only -> distinct dropped ids ->
ids-only left join back to documents. This probe isolates each stage's
steady-state cost OUTSIDE the bench loop (fresh plan per run, 4 runs,
median), at sf0.01 AND sf0.1, so fixed per-stage overhead separates
from data-proportional work exactly as q31's ~0.4 s guard overhead was
attributed (BASELINE.md r11):

- the sf0.01 stage delta is ~pure fixed overhead (data is 1/10th, so
  data-proportional work is noise there);
- (delta_sf0.1 - delta_sf0.01) is ~the data-proportional part.

Stages measured (all .count()-forced):
  A  lsh_pairs            — candidates (q31)
  B  + jaccard_verify     — exact n-gram Jaccard on candidates only
  C  full q50             — + distinct dropped + left join survivors

Prints one JSON line:
  {"anchor", "sf0.01": {"A","B","C"}, "sf0.1": {...},
   "deltas": {"verify_fixed_s", "verify_data_s", "join_fixed_s",
              "join_data_s"}}

Usage: python scripts/probe_q50_decomp.py
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = 4


def main() -> None:
    from weather_monitoring_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_verify,
    )
    from weather_monitoring_spark.plans.llm_queries import (
        q50_dedup_survivors,
    )
    from weather_monitoring_spark.session import get_spark
    from weather_monitoring_spark.sources.tables import load_table

    spark = get_spark(master="local[32]", shuffle_partitions=32)

    from pyspark.sql import functions as F

    def timed(mk_frame, action="count"):
        times = []
        for _ in range(RUNS):
            frame = mk_frame()  # fresh plan each run: no reused
            t0 = time.monotonic()  # shuffle files / cached stages
            if action == "count":
                frame.count()
            else:
                # q50 is doc_id + survives; a bare count() would let
                # Catalyst ELIMINATE the 1:1 left join and the whole
                # LSH subtree — aggregate over survives instead
                frame.agg(F.sum(F.col("survives").cast("int"))).collect()
            times.append(time.monotonic() - t0)
        return round(statistics.median(times), 3)

    out = {}
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        key = sf_dir.rsplit("/", 1)[-1]
        docs = load_table(spark, sf_dir, "documents")

        def stage_a():
            return minhash_lsh_pairs(docs)

        def stage_b():
            return ngram_jaccard_verify(docs, minhash_lsh_pairs(docs))

        def stage_c():
            return q50_dedup_survivors(spark, sf_dir)

        out[key] = {
            "A_lsh_pairs_s": timed(stage_a),
            "B_plus_verify_s": timed(stage_b),
            "C_full_q50_s": timed(stage_c, action="survives"),
        }

    small, big = out["sf0.01"], out["sf0.1"]
    verify_small = small["B_plus_verify_s"] - small["A_lsh_pairs_s"]
    verify_big = big["B_plus_verify_s"] - big["A_lsh_pairs_s"]
    join_small = small["C_full_q50_s"] - small["B_plus_verify_s"]
    join_big = big["C_full_q50_s"] - big["B_plus_verify_s"]
    deltas = {
        "verify_fixed_s": round(verify_small, 3),
        "verify_data_s": round(verify_big - verify_small, 3),
        "join_fixed_s": round(join_small, 3),
        "join_data_s": round(join_big - join_small, 3),
    }

    anchor = None
    try:
        a = subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "host_anchor.py"
                ),
            ],
            capture_output=True,
            text=True,
            timeout=120,
        )
        anchor = json.loads(a.stdout.strip().splitlines()[-1])
    except Exception:
        pass
    print(json.dumps({"anchor": anchor, **out, "deltas": deltas}))


if __name__ == "__main__":
    main()

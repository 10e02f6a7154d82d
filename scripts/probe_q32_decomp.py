#!/usr/bin/env python
"""q32 cost decomposition (the q31/q50 discipline applied to the last
heavy suite query without one; q32 was plan-audited at r2 as
collision-bounded but never stage-attributed).

q32_ngram_jaccard_pairs = filtered-shingle build (tokenize -> explode ->
corpus-derived df cutoff -> localCheckpoint) -> inverted-index self-join
shared counts -> sizes joins + Jaccard filter. The probe isolates each
stage's steady-state cost OUTSIDE the bench loop (fresh plan per run,
4 runs, median) at sf0.01 AND sf0.1, separating fixed per-stage
overhead from data-proportional work exactly as q31's ~0.4 s guard and
q50's ~0.47 s verify overhead were attributed (BASELINE.md r11/r12):

- the sf0.01 stage delta is ~pure fixed overhead (data is 1/10th, so
  data-proportional work is noise there);
- (delta_sf0.1 - delta_sf0.01) is ~the data-proportional part.

Stages measured (all .count()-forced):
  A  filtered shingles     — tokenize + explode + df-cutoff guard
  B  + shared counts       — the inverted-index self-join
  C  full q32              — + sizes joins + Jaccard threshold

Prints one JSON line:
  {"anchor", "sf0.01": {"A","B","C"}, "sf0.1": {...},
   "deltas": {"join_fixed_s", "join_data_s", "jaccard_fixed_s",
              "jaccard_data_s"}}

Usage: python scripts/probe_q32_decomp.py
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
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.dedup import (
        _filtered_shingles,
        ngram_jaccard_pairs,
    )
    from weather_monitoring_spark.session import get_spark
    from weather_monitoring_spark.sources.tables import load_table

    spark = get_spark(master="local[32]", shuffle_partitions=32)

    def timed(mk_frame):
        times = []
        for _ in range(RUNS):
            frame = mk_frame()  # fresh plan each run: no reused
            t0 = time.monotonic()  # shuffle files / cached stages
            frame.count()
            times.append(time.monotonic() - t0)
        return round(statistics.median(times), 3)

    out = {}
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        key = sf_dir.rsplit("/", 1)[-1]
        docs = load_table(spark, sf_dir, "documents")

        def stage_a():
            return _filtered_shingles(docs, "doc_id", "text", "auto")

        def stage_b():
            sh = _filtered_shingles(docs, "doc_id", "text", "auto")
            a, b = sh.alias("a"), sh.alias("b")
            return (
                a.join(
                    b,
                    (F.col("a.s") == F.col("b.s"))
                    & (F.col("a.id") < F.col("b.id")),
                )
                .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
                .agg(F.count(F.lit(1)).alias("shared"))
            )

        def stage_c():
            return ngram_jaccard_pairs(docs)

        out[key] = {
            "A_shingles_s": timed(stage_a),
            "B_plus_shared_s": timed(stage_b),
            "C_full_q32_s": timed(stage_c),
        }

    small, big = out["sf0.01"], out["sf0.1"]
    join_small = small["B_plus_shared_s"] - small["A_shingles_s"]
    join_big = big["B_plus_shared_s"] - big["A_shingles_s"]
    jac_small = small["C_full_q32_s"] - small["B_plus_shared_s"]
    jac_big = big["C_full_q32_s"] - big["B_plus_shared_s"]
    deltas = {
        "join_fixed_s": round(join_small, 3),
        "join_data_s": round(join_big - join_small, 3),
        "jaccard_fixed_s": round(jac_small, 3),
        "jaccard_data_s": round(jac_big - jac_small, 3),
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

#!/usr/bin/env python
"""Focused re-measure of the three stages that spilled at the r6 25x
probe (BASELINE.md "superlinearity note"), after the r7 shuffle-footprint
work, WITH shuffle-byte accounting:

1. MinHash signature build  — r7: zero-shuffle Arrow path (method=
   "arrow"), legacy exchange path kept as method="agg" for the A/B;
2. span masking             — r7: 60-bit packed gram keys instead of
   8-token gram strings on the exchange;
3. winnow fingerprint index — r7: row-local per-doc distinct, the global
   distinct() exchange removed outright;
4. SimHash signatures + blocked pairs (r9): zero-shuffle Arrow vote
   pass (method="arrow") vs the legacy explode + 64-column sum exchange
   (method="agg"), and the blocked self-join on packed single-long
   block keys — the r7 ~201 s / 2.5M docs row this refactor targets.
   Both paths' sum-of-popcount checksums must match (bit-equality at
   probe scale, not just in tests).

Usage: python scripts/probe_spill_stages.py [n_docs ...] [--stages=a,b]
       (default: 2000000 5000000 — the two r6 comparison points;
       --stages filters stage names by substring, e.g. --stages=simhash)

Per stage it records wall seconds plus the DELTA in shuffle write/read
bytes and memory/disk spill bytes, read from the Spark UI REST API
(/api/v1/.../stages) — the same counters the Spark UI shows. Results
append to scripts/probe_spill_stages.json and print as one JSON line
per corpus size.

Env knobs mirror scale_probe.py: SPARK_GRAFT_PROBE_MEM (default 90g),
SPARK_GRAFT_PROBE_PARTS (default 256 — the r6 5M-doc setting, so the
numbers are comparable).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stage_totals(ui: str) -> dict[str, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    tot = {"shuffle_write": 0, "shuffle_read": 0, "mem_spill": 0, "disk_spill": 0}
    for s in stages:
        if s.get("status") not in ("COMPLETE", "FAILED"):
            continue
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["mem_spill"] += s.get("memoryBytesSpilled", 0)
        tot["disk_spill"] += s.get("diskBytesSpilled", 0)
    return tot


def main() -> None:
    stage_filter = None
    sizes = []
    for a in sys.argv[1:]:
        if a.startswith("--stages="):
            stage_filter = a.split("=", 1)[1].split(",")
        else:
            sizes.append(int(a))
    sizes = sizes or [2_000_000, 5_000_000]

    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        simhash_neardup_pairs,
        simhash_signatures,
    )
    from weather_monitoring_spark.operators.spans import strip_dup_spans
    from weather_monitoring_spark.operators.winnow import fingerprint_index
    from weather_monitoring_spark.session import get_spark

    spark = get_spark(
        app_name="probe-spill-stages",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_PROBE_MEM", "90g"),
            "spark.sql.shuffle.partitions": os.environ.get(
                "SPARK_GRAFT_PROBE_PARTS", "256"
            ),
            "spark.ui.enabled": "true",
        },
    )
    ui = spark.sparkContext.uiWebUrl
    results = []

    for n_docs in sizes:
        out: dict = {"n_docs": n_docs}
        # identical corpus construction to scale_probe.py: ~60
        # md5-derived words per doc
        docs = (
            spark.range(n_docs)
            .select(
                F.col("id").alias("doc_id"),
                F.expr(
                    "concat_ws(' ', transform(sequence(1, 60), i -> "
                    "substring(md5(concat(id, ':w', i)), 1, 8)))"
                ).alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        # span corpus: 10% of docs share a planted 10-word tail (the
        # scale_probe.py construction)
        span_docs = docs.select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.col("text"),
                    F.lit(" " + " ".join(f"tail{i}" for i in range(10))),
                ),
            ).otherwise(F.col("text")).alias("text"),
        )

        def timed(name, fn):
            if stage_filter is not None and not any(
                s in name for s in stage_filter
            ):
                return
            before = _stage_totals(ui)
            t0 = time.perf_counter()
            val = fn()
            out[f"{name}_sec"] = round(time.perf_counter() - t0, 2)
            after = _stage_totals(ui)
            for k in before:
                out[f"{name}_{k}_mb"] = round(
                    (after[k] - before[k]) / 1e6, 1
                )
            out[f"{name}_rows"] = val
            print(
                json.dumps({"stage": name, **{k: out[k] for k in out if k.startswith(name)}}),
                flush=True,
            )

        # force FULL signature evaluation (a count() lets Catalyst prune
        # the minhash columns — the r4 "count() pruned four probe rows"
        # lesson): sum of sig lengths depends on every minhash
        timed(
            "minhash_sig_arrow",
            lambda: minhash_signatures(docs, method="arrow")
            .agg(F.sum(F.length("sig")).cast("long"))
            .collect()[0][0],
        )
        timed(
            "minhash_sig_agg",
            lambda: minhash_signatures(docs, method="agg")
            .agg(F.sum(F.length("sig")).cast("long"))
            .collect()[0][0],
        )
        timed("minhash_lsh_pairs", lambda: minhash_lsh_pairs(docs).count())
        timed(
            "span_masking",
            lambda: strip_dup_spans(span_docs)
            .agg(F.sum("n_masked"))
            .collect()[0][0],
        )
        timed("winnow_index", lambda: fingerprint_index(docs).count())

        # Full-evaluation checksum (sum of popcounts — bounded by
        # 64 * n_docs, no BIGINT overflow) depends on every signature
        # bit, so neither path can be column-pruned; arrow == agg is
        # the probe-scale bit-equality check.
        timed(
            "simhash_sig_arrow",
            lambda: simhash_signatures(docs, method="arrow")
            .agg(F.sum(F.bit_count("simhash")).cast("long"))
            .collect()[0][0],
        )
        timed(
            "simhash_sig_agg",
            lambda: simhash_signatures(docs, method="agg")
            .agg(F.sum(F.bit_count("simhash")).cast("long"))
            .collect()[0][0],
        )
        timed("simhash_blocked_pairs", lambda: simhash_neardup_pairs(docs).count())

        docs.unpersist()
        results.append(out)
        print(json.dumps(out), flush=True)

    # Append to the history file (earlier runs' rows are the comparison
    # baseline — overwriting them would lose the evidence this file
    # exists to keep).
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "probe_spill_stages.json")
    history: list = []
    if os.path.exists(path):
        try:
            with open(path) as fh:
                history = json.load(fh)
        except (OSError, ValueError):
            history = []
    with open(path, "w") as fh:
        json.dump(history + results, fh, indent=1)


if __name__ == "__main__":
    main()

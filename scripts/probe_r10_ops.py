#!/usr/bin/env python
"""Round-10 scale probes (r9 verdict item 4: the r6/r7 discipline
applied to the retrieval/graph changes):

1. pagerank, dangling="redistribute" (the new default) — 1M nodes / 5M
   edges / 4 iterations (direct A/B against the r9b "drop" numbers:
   59.9-79.0 s, 442 MB shuffle), then 5M nodes / 25M edges / 4
   iterations (5x edges: per-iteration shuffle must grow with EDGES
   only — the linearity verdict);
2. bm25_topk with idf="log" (the new default) — 3-term query over 5M
   docs (A/B against the r9b raw-IDF pinned run: 23.3 s): the
   quantized-ln tables ride the plan as constant arrays, so the wall
   and the shuffle bytes (single-row stats broadcast only) should be
   unchanged.

One JSON line per stage; appends to scripts/probe_r10_ops.json.
Env knobs mirror probe_r9_ops.py (SPARK_GRAFT_PROBE_MEM, _PARTS).
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
    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.graph import pagerank
    from weather_monitoring_spark.operators.retrieval import bm25_topk
    from weather_monitoring_spark.session import get_spark

    spark = get_spark(
        app_name="probe-r10-ops",
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

    def timed(name, fn):
        before = _stage_totals(ui)
        t0 = time.time()
        extra = fn()
        wall = round(time.time() - t0, 1)
        after = _stage_totals(ui)
        row = {
            "wall_s": wall,
            **{
                k: after[k] - before[k]
                for k in ("shuffle_write", "shuffle_read", "mem_spill", "disk_spill")
            },
        }
        if extra:
            row.update(extra)
        results.append({name: row})
        print(json.dumps({name: row}), flush=True)

    def lcg_edges(n_nodes: int, fanout: int):
        """Same construction as probe_r9b (5 out-links per node); every
        10th node is made DANGLING (its out-edges dropped) so the
        redistribute aggregate has real mass to move."""
        return (
            spark.range(n_nodes * fanout)
            .filter((F.col("id") % n_nodes) % 10 != 0)
            .select(
                (F.col("id") % n_nodes).alias("src"),
                (
                    (
                        (F.col("id") % n_nodes) * 48271
                        + (F.col("id") - F.col("id") % n_nodes) / n_nodes
                        + 11
                    ).cast("bigint")
                    % n_nodes
                ).alias("dst"),
            )
            .localCheckpoint(eager=True)
        )

    e1 = lcg_edges(1_000_000, 5)
    timed(
        "pagerank_redistribute_1m_nodes_4iters",
        lambda: {"n_nodes": pagerank(e1, iterations=4).count()},
    )
    e1.unpersist()
    e5 = lcg_edges(5_000_000, 5)
    timed(
        "pagerank_redistribute_5m_nodes_25m_edges_4iters",
        lambda: {"n_nodes": pagerank(e5, iterations=4).count()},
    )
    e5.unpersist()

    docs = (
        spark.range(5_000_000)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                "concat(concat_ws(' ', transform(sequence(1, 60), i -> "
                "substring(md5(concat(id, ':w', i)), 1, 8))), "
                "CASE WHEN id % 100 = 0 THEN ' spark window' "
                "WHEN id % 17 = 0 THEN ' spark' ELSE '' END)"
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    timed(
        "bm25_log_idf_5m_docs",
        lambda: {
            "top_ids": [
                r["doc_id"]
                for r in bm25_topk(
                    docs, ("spark", "window", "batch"), top_k=5
                ).collect()
            ][:3]
        },
    )

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_r10_ops.json"
    )
    existing = []
    if os.path.exists(path):
        existing = json.load(open(path))
    json.dump(existing + results, open(path, "w"), indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

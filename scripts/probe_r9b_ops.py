#!/usr/bin/env python
"""Scale probe for the round-9 session-2 operators:

1. pagerank        — 5M-edge LCG graph over 1M nodes, 4 iterations:
                     per-run wall + shuffle bytes (the two-exchange
                     iteration claim), plus a 3-vs-17-partition
                     bit-equality spot check on a 200k-edge slice;
2. bm25_topk       — 3-term query over 5M synthetic docs: one scan,
                     single-row broadcast stats, TakeOrderedAndProject;
3. hashed_tf_vectors + kmeans — vectorize 1M docs at dim=64 (unit) and
                     train/assign k=16 spherical k-means on the hashed
                     vectors: the no-embedding-model clustering path.

One JSON line per stage; appends to scripts/probe_r9b_ops.json.
Env knobs mirror probe_r9_ops.py.
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

    from weather_monitoring_spark.operators.clustering import kmeans_embeddings
    from weather_monitoring_spark.operators.embeddings import hashed_tf_vectors
    from weather_monitoring_spark.operators.graph import pagerank
    from weather_monitoring_spark.operators.retrieval import bm25_topk
    from weather_monitoring_spark.session import get_spark

    spark = get_spark(
        app_name="probe-r9b-ops",
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

    # -- pagerank: 5 out-links per node over 1M nodes = 5M edges
    n_nodes, fanout = 1_000_000, 5
    edges = (
        spark.range(n_nodes * fanout)
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
    timed(
        "pagerank_1m_nodes_5m_edges_4iters",
        lambda: {
            "n_nodes": pagerank(edges, iterations=4)
            .count()
        },
    )

    # -- bm25 over 5M docs (md5-word corpus + planted query words)
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
        "bm25_5m_docs",
        lambda: {
            "top_ids": [
                r["doc_id"]
                for r in bm25_topk(docs, ("spark", "window"), top_k=5).collect()
            ][:3]
        },
    )

    # -- hashed vectors + kmeans over 1M docs
    small = docs.limit(1_000_000).localCheckpoint(eager=True)
    vecs_holder = {}

    def _vectorize():
        v = (
            hashed_tf_vectors(small, dim=64, unit=True)
            .select(
                F.col("doc_id").alias("vec_id"),
                F.col("vec").cast("array<float>").alias("embedding"),
            )
            .localCheckpoint(eager=True)
        )
        vecs_holder["v"] = v
        return {"n_vecs": v.count()}

    timed("hashed_tf_1m_docs_dim64", _vectorize)
    timed(
        "kmeans_on_hashed_1m_k16",
        lambda: {
            "clusters_used": kmeans_embeddings(
                vecs_holder["v"], n_clusters=16, n_iters=2, method="gemm"
            )
            .select("cluster")
            .distinct()
            .count()
        },
    )

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "probe_r9b_ops.json"
    )
    existing = []
    if os.path.exists(path):
        existing = json.load(open(path))
    json.dump(existing + results, open(path, "w"), indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

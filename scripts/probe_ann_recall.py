"""ANN recall instrumentation (VERDICT r12 #4).

The MinHash side has ``dedup.estimate_lsh_recall``; this probe gives the
VECTOR family the same standing: measured recall@k against the exact
brute-force top-k (``cosine_topk``) for

- ``ann_lsh_topk`` across (n_tables, planes_per_table) geometries, and
- ``ivf_topk`` across n_probe (and a large-corpus n_cells point),

on two corpora: the sf0.1 ``embeddings`` table (2,000 x 64) and a 10x
synthetic corpus (20,000 x 64) built as hash-seeded cluster centers plus
jittered members — the cluster structure mirrors what real embedding
spaces have (near neighbors at high cosine), where a pure-uniform corpus
would make top-k neighbors borderline-orthogonal and every bucketing
scheme look uselessly bad. Timings ride along so the recall/cost trade
is visible in one JSON.

Everything is seeded/deterministic: repeat runs emit identical numbers.

Run: python scripts/probe_ann_recall.py
Writes scripts/probe_ann_recall.json; defaults are justified in
BASELINE.md and floored by tests/test_ann_recall.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_monitoring_spark.session import get_spark
from weather_monitoring_spark.sources.tables import load_table

K = 10
N_QUERIES = 32
SYNTH_N = 20_000
SYNTH_CLUSTERS = 200
DIM = 64


def synth_corpus(spark, n=SYNTH_N, n_clusters=SYNTH_CLUSTERS, dim=DIM):
    """Clustered synthetic embeddings, all column algebra: vector i
    belongs to cluster c=i%n_clusters; each coordinate is the cluster
    center's hash value plus a small per-vector jitter, so same-cluster
    vectors sit at high cosine — the neighbor structure ANN exists for."""
    unit = lambda h: (h % 2001 - 1000) / 1000.0  # noqa: E731
    c = F.pmod(F.col("id"), F.lit(n_clusters))
    coords = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            unit(F.abs(F.xxhash64(c, d)))
            + 0.15 * unit(F.abs(F.xxhash64(F.col("id"), d, F.lit(7))))
        ).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), coords.alias("embedding")
    )


def exact_topk(emb, qids, k):
    from weather_monitoring_spark.operators.similarity import cosine_topk

    rows = cosine_topk(emb, qids, k=k).collect()
    truth = {}
    for r in rows:
        truth.setdefault(r.qid, set()).add(r.vec_id)
    return truth


def recall(result_rows, truth, k):
    got = {}
    for r in result_rows:
        got.setdefault(r.qid, set()).add(r.vec_id)
    per_q = [
        len(got.get(q, set()) & t) / min(k, len(t)) for q, t in truth.items()
    ]
    return sum(per_q) / len(per_q)


def sweep(spark, emb, label, out):
    from weather_monitoring_spark.operators.similarity import (
        ann_lsh_topk,
        ivf_topk,
    )

    emb = emb.localCheckpoint(eager=True)
    n = emb.count()
    qids = [int(i * (n // N_QUERIES)) for i in range(N_QUERIES)]
    t0 = time.perf_counter()
    truth = exact_topk(emb, qids, K)
    exact_s = round(time.perf_counter() - t0, 3)
    out[label] = {
        "corpus_rows": n,
        "n_queries": len(qids),
        "k": K,
        "exact_brute_force_s": exact_s,
        "lsh": [],
        "ivf": [],
    }
    for n_tables, ppt in [(2, 4), (4, 4), (8, 4), (4, 6), (8, 6), (16, 8)]:
        t0 = time.perf_counter()
        rows = ann_lsh_topk(
            emb, qids, k=K, n_tables=n_tables, planes_per_table=ppt
        ).collect()
        out[label]["lsh"].append(
            {
                "n_tables": n_tables,
                "planes_per_table": ppt,
                "recall_at_10": round(recall(rows, truth, K), 4),
                "wall_s": round(time.perf_counter() - t0, 3),
                "default": (n_tables, ppt) == (4, 4),
            }
        )
        print(label, out[label]["lsh"][-1], flush=True)
    n_cells_pts = [16] if n < 5000 else [16, 64]
    for n_cells in n_cells_pts:
        for n_probe in [1, 2, 4, 8]:
            t0 = time.perf_counter()
            rows = ivf_topk(
                emb, qids, k=K, n_cells=n_cells, n_probe=n_probe
            ).collect()
            out[label]["ivf"].append(
                {
                    "n_cells": n_cells,
                    "n_probe": n_probe,
                    "recall_at_10": round(recall(rows, truth, K), 4),
                    "wall_s": round(time.perf_counter() - t0, 3),
                    "default": (n_cells, n_probe) == (16, 4),
                }
            )
            print(label, out[label]["ivf"][-1], flush=True)


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    out = {}
    sweep(spark, load_table(spark, "/root/testdata/sf0.1", "embeddings"),
          "sf0.1", out)
    sweep(spark, synth_corpus(spark), "synth_10x", out)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_ann_recall.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B prototype for q36's fan-out stage: current shape (two joins that
broadcast the EMBEDDINGS to every grid-partition task) vs an inverted
shape (broadcast a tiny per-block entries table, stream the embeddings
through one equi-join). Asserts result equality, then times both.

Usage: python scripts/probe_r15_q36shape.py [runs] [spread01]
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weather_monitoring_spark.operators.similarity import (
    COSINE_NEARDUP_THRESHOLD,
    GEMM_BLOCK_ROWS,
    PREFILTER_MARGIN,
    _exact_rescore,
    cosine_neardup_pairs,
    scoreable_vectors,
)
from weather_monitoring_spark.session import get_spark
from weather_monitoring_spark.sources.tables import load_table


def neardup_inverted(
    emb: DataFrame,
    threshold: float = COSINE_NEARDUP_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    from weather_monitoring_spark.operators.similarity import (
        GEMM_SCORE_CHUNK,
        cosine_neardup_pairs as _cur,
    )

    spark = emb.sparkSession
    # Block count from the UNFILTERED count: empty-projection scan (no
    # vector decode); n_blocks only shapes the blocking, never results.
    n_blocks = max(8, math.ceil(emb.count() / GEMM_BLOCK_ROWS))
    emb = scoreable_vectors(emb, vec_col)
    grid = spark.createDataFrame(
        [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)],
        "bi int, bj int",
    )
    ent0 = grid.select(F.col("bi").alias("bid"), "bi", "bj", F.lit(0).alias("role"))
    ent1 = grid.filter(F.col("bi") != F.col("bj")).select(
        F.col("bj").alias("bid"), "bi", "bj", F.lit(1).alias("role")
    )
    entries = ent0.unionByName(ent1)
    e = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("bid"),
        F.size(F.col(vec_col)).alias("dim"),
    )
    fan = e.join(F.broadcast(entries), "bid").select(
        "bi", "bj", "dim", "id", "v", "role"
    )
    cutoff = threshold - PREFILTER_MARGIN

    def score_block_pair(pdf):
        import numpy as np
        import pandas as pd

        left = pdf[pdf["role"] == 0]
        if len(left) == 0:
            return pd.DataFrame({"id_a": [], "id_b": []}, dtype="int64")
        ids_l = left["id"].to_numpy(dtype="int64")
        mat_l = np.array(list(left["v"]), dtype=np.float64)
        norms_l = np.linalg.norm(mat_l, axis=1, keepdims=True)
        norms_l[norms_l == 0.0] = 1.0
        mat_l /= norms_l
        if pdf["bi"].iloc[0] == pdf["bj"].iloc[0]:
            ids_r, mat_r = ids_l, mat_l
        else:
            right = pdf[pdf["role"] == 1]
            if len(right) == 0:
                return pd.DataFrame({"id_a": [], "id_b": []}, dtype="int64")
            ids_r = right["id"].to_numpy(dtype="int64")
            mat_r = np.array(list(right["v"]), dtype=np.float64)
            norms_r = np.linalg.norm(mat_r, axis=1, keepdims=True)
            norms_r[norms_r == 0.0] = 1.0
            mat_r /= norms_r
        parts = []
        for s in range(0, len(ids_l), GEMM_SCORE_CHUNK):
            sims = mat_l[s : s + GEMM_SCORE_CHUNK] @ mat_r.T
            li, ri = np.nonzero(sims >= cutoff)
            ia, ib = ids_l[s : s + GEMM_SCORE_CHUNK][li], ids_r[ri]
            keep = ia != ib
            parts.append((ia[keep], ib[keep]))
        ia = np.concatenate([p[0] for p in parts]) if parts else np.array([], dtype="int64")
        ib = np.concatenate([p[1] for p in parts]) if parts else np.array([], dtype="int64")
        return pd.DataFrame(
            {"id_a": np.minimum(ia, ib), "id_b": np.maximum(ia, ib)}
        ).drop_duplicates()

    cand = fan.groupBy("bi", "bj", "dim").applyInPandas(
        score_block_pair, "id_a long, id_b long"
    )
    # Stage break: without it the rescore's two broadcast relations are
    # deserialized by every matmul task; after the (tiny) exchange AQE
    # coalesces the rescore to ~1 task.
    cand = cand.repartition("id_a")
    return _exact_rescore(cand, emb, threshold, id_col, vec_col)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spread = len(sys.argv) > 2 and sys.argv[2] == "1"
    spark = get_spark(app_name="wms-q36shape")
    spark.sparkContext.setLogLevel("ERROR")

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        embt = load_table(spark, sf, "embeddings", spread=spread)
        cur = {tuple(r) for r in cosine_neardup_pairs(embt).collect()}
        new = {tuple(r) for r in neardup_inverted(embt).collect()}
        assert cur == new, f"{sf}: mismatch cur={len(cur)} new={len(new)}"
        print(f"equal at {sf}: {len(cur)} pairs", file=sys.stderr)

    sf = "/root/testdata/sf0.1"
    out: dict = {"spread": spread}
    for label, fn in (("current", cosine_neardup_pairs), ("inverted", neardup_inverted)):
        ts = []
        for _ in range(runs):
            embt = load_table(spark, sf, "embeddings", spread=spread)
            t0 = time.perf_counter()
            fn(embt).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[label] = {"median": statistics.median(ts), "runs": ts}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B prototype: current minhash_lsh_pairs vs a window-fused variant
where bucket df is attached by a window count over (band_idx, bh) and
hot/cold membership becomes a filter on ONE pinned band table (no
separate hot pin, no broadcast anti/semi joins). Asserts result
equality at sf0.01 and sf0.1, then times both shapes.

Usage: python scripts/probe_r15_lshshape.py [runs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import h60_from_md5_sql
from weather_monitoring_spark.operators.dedup import (
    BAND_DF_MIN,
    LSH_BANDS,
    minhash_lsh_pairs,
    minhash_signatures,
)
from weather_monitoring_spark.session import get_spark
from weather_monitoring_spark.sources.tables import load_table


def lsh_pairs_fused(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    sigs = minhash_signatures(docs, id_col, text_col)
    bands = sigs.selectExpr(
        f"{id_col} AS id",
        f"{h60_from_md5_sql('md5(sig)')} AS fp",
        "posexplode(array("
        + ", ".join(f"band_{b}" for b in range(LSH_BANDS))
        + ")) AS (band_idx, bh)",
    )
    w = Window.partitionBy("band_idx", "bh")
    bands2 = bands.withColumn("df", F.count(F.lit(1)).over(w)).localCheckpoint(
        eager=False
    )
    cut = bands2.agg(
        F.greatest(
            F.lit(BAND_DF_MIN).cast("long"),
            F.ceil(F.sqrt(F.count(F.lit(1)) / F.lit(LSH_BANDS))),
        ).alias("_cut")
    )
    withcut = bands2.crossJoin(F.broadcast(cut))
    cold = withcut.filter(F.col("df") <= F.col("_cut")).select(
        "id", "fp", "band_idx", "bh"
    )
    members = (
        withcut.filter(F.col("df") > F.col("_cut")).select("id", "fp").distinct()
    )
    keepers = members.groupBy("fp").agg(F.min("id").alias("_keeper"))
    hot_pairs = (
        members.join(keepers, "fp")
        .filter(F.col("id") > F.col("_keeper"))
        .select(F.col("_keeper").alias("id_a"), F.col("id").alias("id_b"))
    )
    a, b = cold.alias("a"), cold.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    return pairs.unionByName(hot_pairs).distinct()


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark(app_name="wms-lshshape")
    spark.sparkContext.setLogLevel("ERROR")

    # Equality check at two SFs.
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        docs = load_table(spark, sf, "documents", spread=True)
        cur = {tuple(r) for r in minhash_lsh_pairs(docs).collect()}
        new = {tuple(r) for r in lsh_pairs_fused(docs).collect()}
        assert cur == new, f"{sf}: mismatch cur={len(cur)} new={len(new)}"
        print(f"equal at {sf}: {len(cur)} pairs", file=sys.stderr)

    sf = "/root/testdata/sf0.1"
    out: dict = {}
    for label, fn in (("current", minhash_lsh_pairs), ("fused", lsh_pairs_fused)):
        ts = []
        for _ in range(runs):
            docs = load_table(spark, sf, "documents", spread=True)
            t0 = time.perf_counter()
            fn(docs).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[label] = {"median": statistics.median(ts), "runs": ts}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

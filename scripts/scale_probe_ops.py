#!/usr/bin/env python
"""Scale probe for the round-6 operator families — trigram language-ID,
DSIR importance weights, and PSL registrable-domain rollups — at
millions of synthetic rows (the BPE counting row lives in the main
scripts/scale_probe.py harness).

Same discipline as scale_probe.py: distributed synthetic inputs (no
driver-side generation), every timing forces full evaluation via an
aggregate over a computed column (a bare count() lets Catalyst prune
the work — the r4 measurement-integrity lesson), and outputs ONE JSON
line so runs are comparable across rounds.

Usage: python scripts/scale_probe_ops.py [n_docs] [n_urls]
(defaults 2_000_000 / 5_000_000).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000_000

    from pyspark.sql import functions as F

    from weather_monitoring_spark.session import get_spark

    spark = get_spark(
        app_name="scale-probe-ops",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_PROBE_MEM", "48g")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float | int] = {"n_docs": n_docs, "n_urls": n_urls}

    # --- synthetic multilingual-ish docs: md5-derived words, a Latin
    # corpus with a deterministic 10% slice carrying Cyrillic filler so
    # the script probes exercise both decision paths --------------------
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                "CASE WHEN id % 10 = 0 THEN "
                "concat('документ погода ', concat_ws(' ', transform(sequence(1, 40), "
                "i -> substring(md5(concat(id, ':w', i)), 1, 6)))) "
                "ELSE concat_ws(' ', transform(sequence(1, 50), "
                "i -> substring(md5(concat(id, ':w', i)), 1, 6))) END"
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    # --- trigram language-ID over the full corpus ----------------------
    from weather_monitoring_spark.operators.langid import lang_id_trigram

    t0 = time.perf_counter()
    lid = lang_id_trigram(docs).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("score").alias("s"),
        F.sum(F.when(F.col("pred_lang") == "ru", 1).otherwise(0)).alias("ru"),
    ).first()
    out["langid_sec"] = round(time.perf_counter() - t0, 2)
    out["langid_rows"] = int(lid["n"])
    out["langid_ru_detected"] = int(lid["ru"])  # must equal n_docs/10

    # --- DSIR weights: raw = corpus, target = a 2% deterministic slice -
    from weather_monitoring_spark.operators.dsir import dsir_weights

    target = docs.filter("doc_id % 50 = 0")
    t0 = time.perf_counter()
    dw = dsir_weights(docs, target).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_grams").alias("g"),
        F.sum("log_weight").alias("lw"),
    ).first()
    out["dsir_sec"] = round(time.perf_counter() - t0, 2)
    out["dsir_rows"] = int(dw["n"])
    out["dsir_grams"] = int(dw["g"])

    # --- PSL registrable-domain rollup over synthetic messy URLs -------
    from weather_monitoring_spark.operators.urlops import domain_stats

    urls = (
        spark.range(n_urls)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                "concat('https://www.h', CAST(id % 100000 AS STRING), '.example',"
                " CASE WHEN id % 11 = 0 THEN '.co.uk'"
                "      WHEN id % 13 = 0 THEN '.com.br'"
                "      WHEN id % 17 = 0 THEN '.ck'"
                "      ELSE '.com' END,"
                " '/p/', CAST(id % 1000 AS STRING), '?b=2&a=1&utm_source=x')"
            ).alias("url"),
            F.expr("repeat('x', 50)").alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    ds = domain_stats(urls).agg(
        F.count(F.lit(1)).alias("domains"),
        F.sum("n_docs").alias("docs"),
    ).first()
    out["psl_domain_stats_sec"] = round(time.perf_counter() - t0, 2)
    out["psl_domains"] = int(ds["domains"])
    out["psl_docs_covered"] = int(ds["docs"])

    # --- embedding clustering family (k-means / SemDeDup) --------------
    # 64-dim synthetic embeddings with 3 planted direction bundles (30%
    # of rows) over a uniform background, plus 1% exact-duplicate rows so
    # SemDeDup has real work. GEMM assignment is the scale path; the
    # fold path is the oracle-exact one (clustering.py).
    from weather_monitoring_spark.operators.clustering import (
        cluster_balanced_sample,
        kmeans_assign,
        kmeans_train,
        semdedup_survivors,
    )

    n_vec = int(os.environ.get("SPARK_GRAFT_PROBE_VECS", str(n_docs // 2)))
    emb = (
        spark.range(n_vec)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), i -> CAST("
                "CASE WHEN id % 10 < 3 AND i - 1 = id % 3 THEN 10.0 ELSE "
                "CAST(conv(substring(md5(concat(id - (id % 100), ':', i)), 1, 8), 16, 10) AS DOUBLE)"
                " / 4294967296.0 - 0.5 END AS FLOAT))"
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    cent = kmeans_train(emb, n_clusters=64, n_iters=2)
    out["kmeans_train_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    asg = kmeans_assign(emb, cent, method="gemm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cos").alias("s"),
        F.count_distinct("cluster").alias("k"),
    ).first()
    out["kmeans_assign_sec"] = round(time.perf_counter() - t0, 2)
    out["kmeans_rows"] = int(asg["n"])
    out["kmeans_clusters_used"] = int(asg["k"])

    t0 = time.perf_counter()
    bal = cluster_balanced_sample(
        emb, cap=1000, centroids=cent, method="gemm"
    ).count()
    out["cluster_sample_sec"] = round(time.perf_counter() - t0, 2)
    out["cluster_sample_rows"] = int(bal)

    # SemDeDup at a bounded size: the id-mod-100 seed above makes every
    # block of 100 consecutive background ids IDENTICAL vectors, so the
    # within-cluster join has dense planted collisions — the worst
    # realistic shape for the Σ cluster_size² bound.
    sd_n = min(n_vec, int(os.environ.get("SPARK_GRAFT_PROBE_SEMDEDUP", "200000")))
    sd = emb.filter(F.col("vec_id") < sd_n)
    t0 = time.perf_counter()
    surv = semdedup_survivors(
        sd, n_clusters=max(64, int(sd_n ** 0.5)), threshold=0.99, method="gemm"
    )
    kept = surv.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("survivor").cast("long")).alias("kept"),
    ).first()
    out["semdedup_n"] = sd_n
    out["semdedup_sec"] = round(time.perf_counter() - t0, 2)
    out["semdedup_rows"] = int(kept["n"])
    out["semdedup_survivors"] = int(kept["kept"])

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

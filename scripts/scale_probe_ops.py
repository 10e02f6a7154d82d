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

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

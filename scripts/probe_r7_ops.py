#!/usr/bin/env python
"""Scale probe for the round-7 late additions — the Gopher rule set,
corpus divergence, and the leakage-safe split — at millions of
synthetic rows.

Same discipline as scale_probe_ops.py: distributed synthetic inputs,
every timing forces full evaluation through an aggregate over computed
columns (never a prunable count()), ONE JSON line out.

Usage: python scripts/probe_r7_ops.py [n_docs]   (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from pyspark.sql import functions as F

    from weather_monitoring_spark.session import get_spark

    spark = get_spark(
        app_name="probe-r7-ops",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_PROBE_MEM", "48g")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, float | int] = {"n_docs": n_docs}

    # Synthetic prose-ish corpus with every Gopher code path exercised:
    # ~60 md5-derived words per doc, a stopword backbone every 7 words,
    # 5 lines per doc, a 5% slice with bullet lines, a 3% slice with
    # ellipsis line endings, a 2% slice of '#' symbol spam.
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                "concat_ws('\\n', transform(sequence(1, 5), l -> "
                "concat(CASE WHEN id % 20 = 7 THEN '- ' "
                "            WHEN id % 33 = 11 THEN '# # # ' ELSE '' END, "
                "concat_ws(' ', transform(sequence(1, 12), i -> "
                "CASE WHEN (l * 12 + i) % 7 = 0 THEN 'the' "
                "     WHEN (l * 12 + i) % 7 = 3 THEN 'and' ELSE "
                "substring(md5(concat(id, ':', l, ':', i)), 1, 5) END)), "
                "CASE WHEN id % 37 = 5 THEN '...' ELSE '' END)))"
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    from weather_monitoring_spark.operators.quality import gopher_rules

    t0 = time.perf_counter()
    g = gopher_rules(docs).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mean_word_len").alias("mwl"),
        F.sum(F.when(F.col("verdict") == "kept", 1).otherwise(0)).alias("kept"),
        F.sum(F.when(F.col("verdict") == "bullet_lines", 1).otherwise(0)).alias(
            "bullets"
        ),
        F.sum(F.when(F.col("verdict") == "symbol_ratio", 1).otherwise(0)).alias(
            "symbols"
        ),
    ).first()
    out["gopher_sec"] = round(time.perf_counter() - t0, 2)
    out["gopher_rows"] = int(g["n"])
    out["gopher_kept"] = int(g["kept"])
    out["gopher_bullet_flagged"] = int(g["bullets"])
    out["gopher_symbol_flagged"] = int(g["symbols"])

    from weather_monitoring_spark.operators.dsir import corpus_divergence

    t0 = time.perf_counter()
    d = corpus_divergence(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
    ).first()
    out["divergence_sec"] = round(time.perf_counter() - t0, 2)
    out["divergence_tv"] = round(float(d["tv_distance"]), 6)
    out["divergence_active_a"] = int(d["n_active_a"])

    from weather_monitoring_spark.operators.graph import leakage_safe_split

    pairs = (
        spark.range(n_docs)
        .filter("id % 20 = 0")
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .localCheckpoint(eager=True)
    )
    n_pairs = pairs.count()
    t0 = time.perf_counter()
    split = leakage_safe_split(docs, pairs)
    agg = split.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("train"),
    ).first()
    # pair-integrity check rides the same materialization
    joined = (
        split.alias("s1")
        .join(
            split.alias("s2"),
            F.col("s1.doc_id") + 1 == F.col("s2.doc_id"),
        )
        .filter(F.col("s1.doc_id") % 20 == 0)
        .agg(
            F.sum(
                F.when(F.col("s1.split") == F.col("s2.split"), 1).otherwise(0)
            ).alias("same")
        )
        .first()
    )
    out["split_sec"] = round(time.perf_counter() - t0, 2)
    out["split_rows"] = int(agg["n"])
    out["split_train_frac"] = round(int(agg["train"]) / n_docs, 4)
    out["split_pairs_planted"] = int(n_pairs)
    out["split_pairs_same_split"] = int(joined["same"])

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

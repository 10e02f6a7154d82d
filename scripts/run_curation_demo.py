#!/usr/bin/env python
"""Run the crawl -> training-shards curation pipeline end-to-end — the
engine's LLM-data-pipeline story as ONE composed job:

  synthetic crawl (HTML pages + messy URLs, planted duplicates)
    -> HTML -> text extraction            (operators/htmlops.py)
    -> URL canonicalization + URL dedup   (operators/urlops.py)
    -> curation gates (normalize/quality) (operators/quality.py)
    -> exact dedup                        (operators/dedup.py)
    -> MinHash-LSH near-dup -> quality-aware survivors
                                          (dedup.py + graph.py)
    -> benchmark decontamination          (operators/training_prep.py)
    -> token-budget shards + manifest     (training_prep.py)
    -> manifest verification

Every stage is individually oracle-checked in CI (see COVERAGE.md);
this script proves the COMPOSITION runs end-to-end and measures it.
Prints one JSON line: per-stage surviving row counts and seconds.

Usage: python scripts/run_curation_demo.py [n_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from weather_monitoring_spark.operators.graph import quality_survivors
    from weather_monitoring_spark.operators.htmlops import extract_html_text
    from weather_monitoring_spark.operators.quality import curate_corpus
    from weather_monitoring_spark.operators.training_prep import (
        contamination_flags,
        verify_training_shards,
        write_training_shards,
    )
    from weather_monitoring_spark.operators.urlops import canonicalize_urls, url_dedup
    from weather_monitoring_spark.session import get_spark

    spark = get_spark(app_name="wms-curation-demo")
    tmp = tempfile.mkdtemp(prefix="wms_curate_")
    out: dict[str, float | int] = {"n_docs": n_docs}
    t_all = time.perf_counter()

    def stage(name: str, t0: float, df_count: int) -> int:
        out[name] = df_count
        out[name + "_sec"] = round(time.perf_counter() - t0, 2)
        return df_count

    try:
        # --- synthetic crawl with every defect class the pipeline handles:
        # URL-identity duplicates (path collapses mod 0.8n; 20% of pages
        # are re-crawls of the same resource), exact-duplicate bodies
        # (content keyed mod 0.5n — pairs that survive URL dedup), NEAR-
        # duplicate bodies (every 37th doc perturbs one word, so its copy
        # is invisible to exact hashing but J ~ 0.98 for MinHash), and
        # too-short docs (every 61st has a 5-word body -> quality gate).
        body_key = f"id % {max(1, int(n_docs * 0.5))}"
        body_len = "CASE WHEN id % 61 = 0 THEN 5 ELSE 80 END"
        prefix = (
            "CASE WHEN id % 37 = 0 THEN concat('v', CAST(id AS STRING)) "
            "ELSE 'stable' END"
        )
        crawl = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.expr(
                f"concat('<html><head><title>page</title>"
                f"<script>var i=1; if(i<2){{x(\"<p>\")}}</script>"
                f"<style>.m{{c:1}}</style></head><body><p>', "
                f"{prefix}, ' ', "
                f"concat_ws(' ', transform(sequence(1, {body_len}), i -> "
                f"substring(md5(concat({body_key}, ':w', i)), 1, 8))), "
                f"' &amp; tail</p><a href=\"/x\">l</a></body></html>')"
            ).alias("html"),
            F.expr(
                f"concat('HTTPS://WWW.site', CAST(id % 50 AS STRING), "
                f"'.Example.com:443/p/', CAST(id % {max(1, int(n_docs * 0.8))} AS STRING), "
                f"'/?b=2&a=1&utm_source=x#f')"
            ).alias("url"),
        ).localCheckpoint(eager=True)

        # --- 1. HTML -> text ------------------------------------------------
        t0 = time.perf_counter()
        extracted = (
            extract_html_text(crawl)
            .join(crawl.select("doc_id", "url"), "doc_id")
            .select("doc_id", "url", "text")
            .localCheckpoint(eager=True)
        )
        stage("extracted", t0, extracted.count())

        # --- 2. URL canonicalization + URL-identity dedup -------------------
        t0 = time.perf_counter()
        keepers = url_dedup(extracted).select(
            F.col("keeper_doc_id").alias("doc_id")
        )
        url_kept = extracted.join(keepers, "doc_id", "left_semi").localCheckpoint(
            eager=True
        )
        stage("url_unique", t0, url_kept.count())

        # --- 3. curation gates (normalize + quality verdicts) ---------------
        t0 = time.perf_counter()
        curated = (
            curate_corpus(url_kept, min_tokens=20)
            .filter(F.col("verdict") == "kept")
            .select("doc_id", F.col("text_norm").alias("text"), "n_tokens")
            .localCheckpoint(eager=True)
        )
        stage("curated", t0, curated.count())

        # --- 4. exact dedup --------------------------------------------------
        t0 = time.perf_counter()
        exact_keep = exact_dedup(curated).select(
            F.col("keeper_doc_id").alias("doc_id")
        )
        deduped = curated.join(exact_keep, "doc_id", "left_semi").localCheckpoint(
            eager=True
        )
        stage("exact_unique", t0, deduped.count())

        # --- 5. near-dup pairs -> quality-aware survivors --------------------
        t0 = time.perf_counter()
        pairs = minhash_lsh_pairs(deduped).select("id_a", "id_b")
        surv = quality_survivors(
            deduped, pairs, quality=F.col("n_tokens").cast("double")
        ).filter(F.col("survivor"))
        survivors = deduped.join(
            surv.select("doc_id"), "doc_id", "left_semi"
        ).localCheckpoint(eager=True)
        stage("near_dup_survivors", t0, survivors.count())

        # --- 6. benchmark decontamination ------------------------------------
        # eval set = 50 docs sampled content-addressed from the corpus
        # (guaranteed overlap, the worst case for a decontaminator).
        t0 = time.perf_counter()
        bench = survivors.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) == "00"
        ).limit(50)
        flags = contamination_flags(survivors, bench)
        clean = survivors.join(
            flags.filter(~F.col("contaminated")).select("doc_id"),
            "doc_id",
            "left_semi",
        ).localCheckpoint(eager=True)
        stage("decontaminated", t0, clean.count())

        # --- 7. token-budget shards + manifest -------------------------------
        t0 = time.perf_counter()
        shard_dir = f"{tmp}/shards"
        manifest = write_training_shards(
            clean.select("doc_id", "text"), shard_dir, budget=100_000, shuffle=True
        )
        out["shards"] = manifest.count()
        out["shard_tokens"] = int(
            manifest.agg(F.sum("n_tokens").alias("t")).first()["t"]
        )
        out["write_shards_sec"] = round(time.perf_counter() - t0, 2)

        # --- 8. manifest verification ----------------------------------------
        t0 = time.perf_counter()
        diff = verify_training_shards(spark, shard_dir)
        out["manifest_mismatches"] = diff.count()
        out["verify_sec"] = round(time.perf_counter() - t0, 2)

        out["total_sec"] = round(time.perf_counter() - t_all, 2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Run the crawl -> training-shards curation pipeline end-to-end — the
engine's LLM-data-pipeline story as ONE composed job
(weather_monitoring_spark/pipelines.py::curate_crawl):

  synthetic crawl (HTML pages + messy URLs, planted defect classes)
    -> HTML -> text -> URL dedup -> quality gates -> exact dedup
    -> near-dup survivors -> decontamination -> token shards -> verify

The synthetic crawl plants every defect class the pipeline handles:
URL-identity re-crawls, exact-duplicate bodies that survive URL dedup,
NEAR-duplicate bodies (one perturbed word — invisible to exact hashing,
J ~ 0.93 on shingles for MinHash), and too-short docs. Each stage's
count visibly drops its own class. Every stage is individually
oracle-checked in CI (COVERAGE.md); the composition itself is pinned by
tests/test_pipeline_e2e.py against a pure-Python simulation.

Prints one JSON line: per-stage surviving row counts and seconds.

Usage: python scripts/run_curation_demo.py [n_docs] [--gopher|--r9]

``--r9`` runs the r9 gate stack instead: a PROSE-SHAPED synthetic crawl
(multi-paragraph pages, sentences end in '.') with one planted class
per r9 knob — mojibake damage (repaired in place), a javascript line
(stripped, page kept), a '{' page (dropped by c4), a repeated-paragraph
page (dropped by the Gopher repetition gate) — through
curate_crawl(mojibake="table", c4_kwargs={}, repetition_kwargs={}).

``--gopher`` enables the optional Gopher rule gate inside the curated
stage, isolated to the word-count rule (min_words=30 over all-pass
thresholds): the synthetic corpus's md5-hex words cannot satisfy the
paper's stopword/word-length defaults — a real-prose corpus would use
``gopher_kwargs={}`` — but the planted 22-word doc class passes the
min_tokens=20 gate and fails min_words=30, so the gate's drop is
visible in the ``curated`` count.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_crawl(spark, n_docs: int):
    """Deterministic crawl with planted defects (shared with the e2e
    test's Python simulation — keep the rules in sync):

    - URL path collapses mod 0.8n (20% re-crawls; host mod 50 aligns
      because 0.8n is a multiple of 50 for the supported sizes);
    - body content keyed mod 0.5n (exact-dup pairs surviving URL dedup);
    - every 37th doc perturbs its first word (near-dup, not exact-dup);
    - every 61st doc has a 5-word body (fails the min_tokens gate);
    - every 53rd doc (unless also 61st) has a 22-word body in a
      SALTED word space: long enough to pass min_tokens=20, short
      enough to fail Gopher min_words=30 — the class that makes the
      optional gopher gate observably fire. The salt keeps its words
      disjoint from the 80-word docs sharing its body key, so it forms
      its own exact/near-dup groups and never cross-contaminates the
      decontamination stage (3 shared word-3-grams flag a doc).
    """
    from pyspark.sql import functions as F

    n5 = max(1, int(n_docs * 0.5))
    body_key = (
        f"CASE WHEN id % 53 = 0 THEN concat(CAST(id % {n5} AS STRING), ':s') "
        f"ELSE CAST(id % {n5} AS STRING) END"
    )
    body_len = (
        "CASE WHEN id % 61 = 0 THEN 5 WHEN id % 53 = 0 THEN 22 ELSE 80 END"
    )
    prefix = (
        "CASE WHEN id % 37 = 0 THEN concat('v', CAST(id AS STRING)) "
        "ELSE 'stable' END"
    )
    return spark.range(n_docs).select(
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
    )


def synthetic_crawl_prose(spark, n_docs: int):
    """Prose-shaped crawl for the --r9 gate stack: every page is six
    <p> paragraphs of ten md5 words ending in '.', so C4's line/sentence
    rules pass by construction. Planted classes (disjoint by priority):

    - every 29th doc: its first paragraph repeated 3x more (fails the
      Gopher A1.2 duplicate-paragraph fraction, 3/9 > 0.30);
    - every 31st doc: windows-1252 mojibake planted in paragraph 1
      (repaired in place by mojibake="table"; page kept);
    - every 41st doc: one 'enable javascript' line (line stripped by
      c4, page kept);
    - every 43rd doc: a '{' code line (page dropped by c4's brace rule);
    - URL re-crawls mod 0.8n (the URL-dedup class, as in
      synthetic_crawl).
    """
    from pyspark.sql import functions as F

    para = (
        "concat(concat_ws(' ', transform(sequence(1, 10), i -> "
        "substring(md5(concat(CAST(id AS STRING), ':', CAST(p AS STRING), "
        "':w', i)), 1, 8))), '.')"
    )
    paras = (
        f"transform(sequence(1, 6), p -> {para})"
    )
    body = (
        f"concat_ws('', transform({paras}, x -> concat('<p>', x, '</p>')))"
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"""concat('<html><body>',
            CASE WHEN id % 29 = 0 THEN concat_ws('', transform(
                transform(sequence(1, 3), p -> {para.replace("CAST(p AS STRING)", "'1'")}),
                x -> concat('<p>', x, '</p>'))) ELSE '' END,
            CASE WHEN id % 31 = 0 AND id % 29 != 0
                 THEN '<p>He said \u00e2\u20ac\u0153quoted\u00e2\u20ac\u009d words.</p>' ELSE '' END,
            CASE WHEN id % 41 = 0 AND id % 29 != 0 AND id % 31 != 0
                 THEN '<p>Please enable javascript to continue here.</p>' ELSE '' END,
            CASE WHEN id % 43 = 0 AND id % 29 != 0 AND id % 31 != 0 AND id % 41 != 0
                 THEN '<p>code sample {{ x }} follows.</p>' ELSE '' END,
            {body}, '</body></html>')"""
        ).alias("html"),
        F.expr(
            f"concat('https://site', CAST(id % 50 AS STRING), '.example.com/p/', "
            f"CAST(id % {max(1, int(n_docs * 0.8))} AS STRING))"
        ).alias("url"),
    )


def run_r9(n_docs: int) -> None:
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from weather_monitoring_spark.pipelines import curate_crawl
    from weather_monitoring_spark.session import get_spark

    spark = get_spark(
        app_name="wms-curation-demo-r9",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_PROBE_MEM", "8g")
        },
    )
    out: dict = {"n_docs": n_docs, "mode": "r9-gates"}
    t_all = time.perf_counter()
    crawl = synthetic_crawl_prose(spark, n_docs).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    stages = curate_crawl(
        crawl,
        min_tokens=5,
        mojibake="table",
        c4_kwargs={},
        repetition_kwargs={},
    )
    out["pipeline_sec"] = round(time.perf_counter() - t0, 2)
    for name in ("extracted", "url_unique", "curated", "exact_unique",
                 "survivors", "clean"):
        out[name] = getattr(stages, name).count()
    out["mojibake_repaired"] = stages.extracted.filter(
        F.col("text").contains("\u201c")
    ).count()
    out["js_lines_stripped_pages"] = stages.curated.filter(
        F.lower(F.col("text")).contains("javascript")
    ).count()  # must be 0
    out["total_sec"] = round(time.perf_counter() - t_all, 2)
    print(json.dumps(out))


def run_r10(n_docs: int) -> None:
    """The composed worst case (r9 verdict item 6) in ONE invocation:
    every r9 gate (mojibake + c4 + repetition + gopher word-count
    config) + explicit bench (n-gram decontamination) + token shards +
    leakage-safe split_pcts + EMBEDDING-axis semantic decontamination
    over hashed-TF vectors of the surviving corpus.

    Gate-firing notes, honest by construction: the gopher gate's
    min_words=30 drops nothing on this corpus (every prose page has
    60+ words) — it is included for the composition cost, not a planted
    class; keep_langs is omitted because md5-hex words are not a
    language (the r9 lang-gate demo covers it on real prose). The
    semantic axis runs against the SURVIVORS (pre-n-gram-decontam)
    frame so its verdicts can be cross-checked against the n-gram
    stage: every exact bench leak still present must be flagged at
    cosine ~1.0 by construction."""
    import tempfile as _tf

    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.embeddings import hashed_tf_vectors
    from weather_monitoring_spark.operators.htmlops import extract_html_text
    from weather_monitoring_spark.operators.training_prep import (
        semantic_decontaminate,
    )
    from weather_monitoring_spark.pipelines import curate_crawl, curation_report
    from weather_monitoring_spark.session import get_spark

    spark = get_spark(
        app_name="wms-curation-demo-r10",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_PROBE_MEM", "8g"),
            "spark.sql.shuffle.partitions": os.environ.get(
                "SPARK_GRAFT_PROBE_PARTS", "64"
            ),
        },
    )
    tmp = _tf.mkdtemp(prefix="wms_curate_r10_")
    out: dict = {"n_docs": n_docs, "mode": "r10-composed"}
    t_all = time.perf_counter()
    try:
        crawl = synthetic_crawl_prose(spark, n_docs).localCheckpoint(eager=True)
        bench = (
            extract_html_text(crawl.filter("doc_id % 997 = 0"), lines=True)
            .select("doc_id", "text")
            .localCheckpoint(eager=True)
        )
        out["bench_docs"] = bench.count()
        gopher_kwargs = dict(
            min_words=30, max_words=10**9, min_mean_word_len=0.0,
            max_mean_word_len=1e9, max_symbol_ratio=1e9,
            max_bullet_frac=1e9, max_ellipsis_frac=1e9,
            min_alpha_frac=0.0, min_stopwords=0,
        )
        t0 = time.perf_counter()
        stages = curate_crawl(
            crawl,
            bench=bench,
            min_tokens=5,
            mojibake="table",
            c4_kwargs={},
            repetition_kwargs={},
            gopher_kwargs=gopher_kwargs,
            split_pcts=(80, 10),
            split_salt="r10",
            shard_dir=f"{tmp}/shards",
            shard_budget=100_000,
        )
        report = curation_report(stages)
        out["pipeline_sec"] = round(time.perf_counter() - t0, 2)
        out["stages"] = report
        out["split_counts"] = {
            r["split"]: r["n"]
            for r in stages.split.groupBy("split")
            .agg(F.count("*").alias("n"))
            .collect()
        }

        # embedding axis over the pre-decontam survivors: the exact
        # bench leaks are still present there, so semantic flags must
        # cover them (cosine 1.0 on identical token vectors)
        def embed(df):
            return (
                hashed_tf_vectors(df.select("doc_id", "text"), dim=64, unit=True)
                .select(
                    F.col("doc_id").alias("vec_id"),
                    F.col("vec").cast("array<float>").alias("embedding"),
                )
                .localCheckpoint(eager=True)
            )

        t0 = time.perf_counter()
        train_emb, bench_emb = embed(stages.survivors), embed(bench)
        out["vectorize_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        sem = semantic_decontaminate(
            train_emb, bench_emb, threshold=0.95
        ).localCheckpoint(eager=True)
        out["semantic_sec"] = round(time.perf_counter() - t0, 2)
        out["semantic_flagged"] = sem.filter("contaminated").count()
        # cross-axis check: docs the n-gram stage removed (survivors \
        # clean) that were flagged by the semantic axis too
        ngram_dropped = stages.survivors.select("doc_id").subtract(
            stages.clean.select("doc_id")
        )
        out["ngram_dropped"] = ngram_dropped.count()
        out["ngram_dropped_also_semantic"] = (
            sem.filter("contaminated")
            .select(F.col("vec_id").alias("doc_id"))
            .join(ngram_dropped, "doc_id", "left_semi")
            .count()
        )
        out["total_sec"] = round(time.perf_counter() - t_all, 2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    args = [a for a in sys.argv[1:] if a not in ("--gopher", "--r9", "--r10")]
    gopher = "--gopher" in sys.argv[1:]
    n_docs = int(args[0]) if args else 100_000
    if "--r10" in sys.argv[1:]:
        run_r10(n_docs)
        return
    if "--r9" in sys.argv[1:]:
        run_r9(n_docs)
        return

    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.training_prep import (
        verify_training_shards,
    )
    from weather_monitoring_spark.pipelines import curate_crawl
    from weather_monitoring_spark.session import get_spark

    # Million-page runs need an executor-realistic heap (the 1g JVM
    # default is a test setting) — same knob as the scale probes.
    spark = get_spark(
        app_name="wms-curation-demo",
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_PROBE_MEM", "8g")
        },
    )
    tmp = tempfile.mkdtemp(prefix="wms_curate_")
    out: dict[str, float | int] = {"n_docs": n_docs}
    t_all = time.perf_counter()

    try:
        crawl = synthetic_crawl(spark, n_docs).localCheckpoint(eager=True)
        shard_dir = f"{tmp}/shards"

        # Explicit benchmark table (the r5 fix's real-usage shape —
        # bench=None now SKIPS decontamination): every 997th page's
        # extracted text stands in for an eval set that leaked into the
        # crawl, so the decontamination stage has genuine work and its
        # drop is visible in the stage counts.
        from weather_monitoring_spark.operators.htmlops import extract_html_text

        bench = (
            extract_html_text(crawl.filter("doc_id % 997 = 0"))
            .select("doc_id", "text")
            .localCheckpoint(eager=True)
        )
        out["bench_docs"] = bench.count()

        gopher_kwargs = None
        if gopher:
            gopher_kwargs = dict(
                min_words=30, max_words=10**9, min_mean_word_len=0.0,
                max_mean_word_len=1e9, max_symbol_ratio=1e9,
                max_bullet_frac=1e9, max_ellipsis_frac=1e9,
                min_alpha_frac=0.0, min_stopwords=0,
            )
        out["gopher_gate"] = gopher

        t0 = time.perf_counter()
        stages = curate_crawl(
            crawl, bench=bench, shard_dir=shard_dir, shard_budget=100_000,
            gopher_kwargs=gopher_kwargs,
        )
        # counts are on pinned frames: each stage's work is timed once,
        # inside curate_crawl's eager checkpoints.
        out["pipeline_sec"] = round(time.perf_counter() - t0, 2)
        for name in (
            "extracted",
            "url_unique",
            "curated",
            "exact_unique",
            "survivors",
            "clean",
        ):
            out[name] = getattr(stages, name).count()
        out["shards"] = stages.manifest.count()
        out["shard_tokens"] = int(
            stages.manifest.agg(F.sum("n_tokens").alias("t")).first()["t"]
        )

        t0 = time.perf_counter()
        out["manifest_mismatches"] = verify_training_shards(spark, shard_dir).count()
        out["verify_sec"] = round(time.perf_counter() - t0, 2)

        out["total_sec"] = round(time.perf_counter() - t_all, 2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

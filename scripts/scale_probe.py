#!/usr/bin/env python
"""Scale probe for the quadratic-family operators: run the blocked/banded
plans on synthetic corpora 10-40x the sf0.1 bench tables and print one
JSON line of timings. The point is trend evidence for the 100 TB story:
these operators must scale with collisions/candidates, not n^2.

Synthetic inputs are generated distributed (spark.range + md5-derived
columns) — nothing is collected to the driver.

Usage: python scripts/scale_probe.py [n_embeddings] [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: Filled by main(); printed by the failure handler so a crashed row
#: never discards the completed measurements.
OUT: dict = {}


def main() -> None:
    n_emb = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from pyspark.sql import functions as F

    from weather_monitoring_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        simhash_neardup_pairs,
    )
    from weather_monitoring_spark.operators.similarity import (
        ann_lsh_topk,
        cosine_neardup_pairs,
        ivf_topk,
    )
    from weather_monitoring_spark.session import get_spark

    # Probe corpora are 10-100x the bench tables; give the single local
    # JVM an executor-realistic heap (the default 1g driver heap is a
    # test setting, not a scale statement). 32 executor threads share
    # this heap — the 2M-doc wide hash aggregates need the headroom
    # (SPARK_GRAFT_PROBE_MEM overrides; 8g measured UNABLE_TO_ACQUIRE_MEMORY
    # at the 10x sizes).
    extra_conf = {
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_PROBE_MEM", "48g")
    }
    # Optional override for the largest runs: the 5M-doc minhash
    # signature aggregation OOMs 48g at 32 partitions (r6 measured);
    # finer shuffle partitioning + a bigger heap are the probe-scale
    # knobs, not operator changes.
    parts = os.environ.get("SPARK_GRAFT_PROBE_PARTS")
    if parts:
        extra_conf["spark.sql.shuffle.partitions"] = parts
    spark = get_spark(app_name="scale-probe", extra_conf=extra_conf)
    out = OUT
    out.update({"n_embeddings": n_emb, "n_docs": n_docs})

    # --- synthetic embeddings: 64-dim uniform via md5 (distributed) ------
    emb = (
        spark.range(n_emb)
        .select(
            F.col("id").alias("vec_id"),
            F.expr(
                "transform(sequence(1, 64), i -> "
                "CAST(CAST(conv(substring(md5(concat(id, ':', i)), 1, 8), 16, 10) AS DOUBLE)"
                " / 4294967296.0 - 0.5 AS FLOAT))"
            ).alias("embedding"),
        )
        .localCheckpoint(eager=True)
    )

    # The exact all-pairs GEMM row is the O(n^2)-scoring BASELINE, not a
    # scale path — at 1M vectors its shuffle spill exceeds this host's
    # ~90 GB usable disk (measured r6: 38 SPILL_OUT_OF_MEMORY "No space
    # left on device" failures in the prefilter sort), so the row is
    # capped independently of the ANN/IVF rows, which are the actual
    # 100 TB designs and run at the full requested size.
    gemm_cap = int(os.environ.get("SPARK_GRAFT_PROBE_GEMM_MAX", "500000"))
    gemm_n = min(n_emb, gemm_cap)
    gemm_emb = emb.filter(F.col("vec_id") < gemm_n)
    out["gemm_neardup_n"] = gemm_n
    t0 = time.perf_counter()
    out["gemm_neardup_pairs"] = cosine_neardup_pairs(gemm_emb, threshold=0.4).count()
    out["gemm_neardup_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["ann_topk_rows"] = ann_lsh_topk(emb, [0, 1, 2, 3, 4]).count()
    out["ann_topk_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["ivf_topk_rows"] = ivf_topk(
        emb, [0, 1, 2, 3, 4], n_cells=max(16, int(n_emb**0.5))
    ).count()
    out["ivf_topk_sec"] = round(time.perf_counter() - t0, 2)

    # IVF + int8 coarse scan vs plain IVF on the identical corpus/cells:
    # the 100 TB composition (quantized code table is the stored index).
    from weather_monitoring_spark.operators.similarity import ivf_pq_topk

    t0 = time.perf_counter()
    out["ivf_pq_topk_rows"] = ivf_pq_topk(
        emb, [0, 1, 2, 3, 4], n_cells=max(16, int(n_emb**0.5))
    ).count()
    out["ivf_pq_topk_sec"] = round(time.perf_counter() - t0, 2)

    # --- synthetic documents: ~60 md5-derived words each (distributed) ---
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform(sequence(1, 60), i -> "
                "substring(md5(concat(id, ':w', i)), 1, 8)))"
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    t0 = time.perf_counter()
    out["exact_dedup_groups"] = exact_dedup(docs).count()
    out["exact_dedup_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["minhash_lsh_pairs"] = minhash_lsh_pairs(docs).count()
    out["minhash_lsh_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["simhash_blocked_pairs"] = simhash_neardup_pairs(docs).count()
    out["simhash_blocked_sec"] = round(time.perf_counter() - t0, 2)

    # --- BPE token counting throughput (Arrow-batched pandas_udf) --------
    # Worst-case text for the tokenizer's pre-token cache: md5 hex words
    # are near-all-distinct, so every word pays the full merge loop —
    # real corpora re-use vocabulary and run faster. tokens/s is the
    # budget-denomination cost a shard-packing run would pay end to end.
    from weather_monitoring_spark.operators.tokenize import count_bpe_tokens

    t0 = time.perf_counter()
    bpe_row = (
        count_bpe_tokens(docs)
        .agg(
            F.sum("n_tokens_bpe").alias("bpe"),
            F.sum("n_tokens_ws").alias("ws"),
        )
        .first()
    )
    out["bpe_count_sec"] = round(time.perf_counter() - t0, 2)
    out["bpe_tokens_total"] = int(bpe_row["bpe"])
    out["bpe_tokens_per_sec"] = int(bpe_row["bpe"] / max(out["bpe_count_sec"], 1e-9))
    out["bpe_vs_ws_ratio"] = round(bpe_row["bpe"] / bpe_row["ws"], 3)

    # --- candidate-volume evidence: collisions, not n^2 ------------------
    # The round-3 verdict asked for measured CANDIDATE counts, so that
    # quadratic growth is visible rather than inferred. Candidate volume
    # = sum over join buckets of C(m, 2) — computed exactly from bucket
    # sizes (one aggregation), without materializing the joins.
    from weather_monitoring_spark.operators.dedup import (
        LSH_BANDS,
        minhash_signatures,
        simhash_signatures,
        simhash_table_key_exprs,
    )

    def simhash_candidate_volume(d):
        keys = simhash_signatures(d).select(
            F.posexplode(
                F.array(*[F.expr(k) for k in simhash_table_key_exprs()])
            ).alias("tbl", "key")
        )
        return (
            keys.groupBy("tbl", "key")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")).cast("long").alias("v"))
            .first()["v"]
        )

    def band_candidate_volume(d):
        sigs = minhash_signatures(d)
        bands = sigs.select(
            F.posexplode(
                F.array(*[F.col(f"band_{b}") for b in range(LSH_BANDS)])
            ).alias("band_idx", "bh")
        )
        return (
            bands.groupBy("band_idx", "bh")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")).cast("long").alias("v"))
            .first()["v"]
        )

    # (a) SimHash blocked search at >= 1M docs, planted near-dup fractions
    # 0% / 1% / 2%: candidate volume must track the planted collisions
    # (linear in dups, background ~ 10 * C(n,2) / 2^25.7), nowhere near
    # the old 8-bit-block design's n^2/64.
    # >= 1M docs for the recorded run (the verdict's bar); small smoke
    # invocations exercise the same code path at their own size.
    cand_n = max(1_000_000, n_docs // 2) if n_docs >= 500_000 else n_docs
    out["simhash_cand_n_docs"] = cand_n
    for pct in (0, 1, 2):
        planted = spark.range(cand_n).select(
            F.col("id").alias("doc_id"),
            F.expr(
                # docs with id%100 in [1, pct] are one-word-variant
                # near-copies of the id - id%100 'base' doc
                f"concat_ws(' ', transform(sequence(1, 60), i -> "
                f"substring(md5(concat(CASE WHEN (id % 100) BETWEEN 1 AND {pct} "
                f"THEN id - (id % 100) ELSE id END, ':w', "
                f"CASE WHEN i = 7 AND (id % 100) BETWEEN 1 AND {pct} "
                f"THEN -id ELSE i END)), 1, 8)))"
            ).alias("text"),
        )
        t0 = time.perf_counter()
        out[f"simhash_candidates_p{pct}"] = simhash_candidate_volume(planted)
        out[f"simhash_candidates_p{pct}_sec"] = round(time.perf_counter() - t0, 2)
    out["simhash_old_design_equiv_candidates"] = cand_n * cand_n // 64

    # (b) hot-bucket guards on a degenerate corpus: 10k identical docs +
    # the probe corpus. Uncapped band volume is computed (not executed);
    # the capped operators are executed and their bounded outputs counted.
    degenerate = docs.unionByName(
        spark.range(10_000).select(
            (F.col("id") + 10 * n_docs).alias("doc_id"),
            F.lit("mass duplicated boilerplate " * 12).alias("text"),
        )
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    out["band_candidates_uncapped"] = band_candidate_volume(degenerate)
    t0 = time.perf_counter()
    out["minhash_capped_pairs_degenerate"] = minhash_lsh_pairs(degenerate).count()
    out["minhash_capped_degenerate_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["simhash_capped_pairs_degenerate"] = simhash_neardup_pairs(
        degenerate, max_block_df="auto"
    ).count()
    out["simhash_capped_degenerate_sec"] = round(time.perf_counter() - t0, 2)
    degenerate.unpersist()

    # --- training prep: global cumsum packing + decontamination ----------
    from weather_monitoring_spark.operators.training_prep import (
        contamination_flags,
        pack_token_budget,
    )

    t0 = time.perf_counter()
    out["pack_shards"] = (
        pack_token_budget(docs, budget=50_000)
        .agg(F.countDistinct("shard_id").alias("n"))
        .first()["n"]
    )
    out["pack_shards_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    bench_set = docs.filter(F.col("doc_id") % 20 == 0)
    train_set = docs.filter(F.col("doc_id") % 20 != 0)
    out["decontam_flagged"] = (
        contamination_flags(train_set, bench_set)
        .filter(F.col("contaminated"))
        .count()
    )
    out["decontam_sec"] = round(time.perf_counter() - t0, 2)

    # --- quality annotations: zero-shuffle curation pass -----------------
    from weather_monitoring_spark.operators.quality import quality_annotations

    t0 = time.perf_counter()
    # force the projection (count() would prune the signal columns and
    # time an empty scan); sum a computed signal instead.
    out["quality_rows"] = int(
        quality_annotations(docs)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dup_token_frac").alias("s"))
        .first()["n"]
    )
    out["quality_sec"] = round(time.perf_counter() - t0, 2)

    # --- connected components: n_docs/5 planted 5-node chains ------------
    # path edges i -> i+1 except across cluster boundaries; worst-case
    # label distance 4 inside each cluster, plus one n_docs/100-node chain
    # appended to exercise pointer jumping depth.
    from weather_monitoring_spark.operators.graph import connected_components

    edges = (
        spark.range(n_docs - 1)
        .filter((F.col("id") % 5) != 4)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        .unionByName(
            spark.range(n_docs, n_docs + n_docs // 100)
            .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.perf_counter()
    out["cc_components"] = (
        connected_components(edges).select("component").distinct().count()
    )
    out["cc_sec"] = round(time.perf_counter() - t0, 2)

    # --- linear-family training ops: chunking / tf-idf / quantization ----
    from weather_monitoring_spark.operators.embeddings import quantize_embeddings
    from weather_monitoring_spark.operators.textops import tfidf_topk
    from weather_monitoring_spark.operators.training_prep import chunk_documents

    t0 = time.perf_counter()
    out["chunk_rows"] = chunk_documents(docs).count()
    out["chunk_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["tfidf_rows"] = tfidf_topk(docs).count()
    out["tfidf_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["quantize_rows"] = int(
        quantize_embeddings(emb)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("max_abs_err").alias("s"))
        .first()["n"]
    )
    out["quantize_sec"] = round(time.perf_counter() - t0, 2)

    # --- line ops: planted boilerplate + per-doc line arrays --------------
    from weather_monitoring_spark.operators.lines import dedup_lines, strip_boilerplate

    lined = docs.select(
        "doc_id",
        F.expr(
            "concat(array('site header', 'cookie banner'), "
            "transform(sequence(1, 30), i -> concat(substring(md5(concat(doc_id, ':l', i)), 1, 8), ' ', "
            "substring(md5(concat(doc_id, ':m', i)), 1, 8))))"
        ).alias("lines"),
    )
    t0 = time.perf_counter()
    out["dedup_lines_rows"] = int(
        dedup_lines(lined)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_kept").alias("s"))
        .first()["n"]
    )
    out["dedup_lines_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    stripped = strip_boilerplate(lined, min_docs=1000)
    out["strip_boilerplate_removed"] = (
        stripped.agg(F.sum(F.col("n_lines") - F.col("n_kept")).alias("r")).first()["r"]
    )
    out["strip_boilerplate_sec"] = round(time.perf_counter() - t0, 2)

    # --- bigram LM: web-scale-shaped vocabulary (NOT broadcastable) ------
    from weather_monitoring_spark.operators.textops import bigram_lm

    t0 = time.perf_counter()
    out["bigram_lm_rows"] = bigram_lm(docs).count()
    out["bigram_lm_sec"] = round(time.perf_counter() - t0, 2)

    # --- snapshot diff: digest-only full-outer join ----------------------
    from weather_monitoring_spark.operators.versioning import snapshot_diff

    new_snap = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    t0 = time.perf_counter()
    out["snapshot_changed"] = (
        snapshot_diff(docs, new_snap).filter(F.col("status") == "changed").count()
    )
    out["snapshot_diff_sec"] = round(time.perf_counter() - t0, 2)

    # --- compression signal: the Python-boundary cost, honestly metered --
    from weather_monitoring_spark.operators.quality import compression_signals

    t0 = time.perf_counter()
    out["compression_rows"] = int(
        compression_signals(docs)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("compression_ratio").alias("s"))
        .first()["n"]
    )
    out["compression_sec"] = round(time.perf_counter() - t0, 2)

    # --- JL reduction: one Arrow matmul per partition --------------------
    from weather_monitoring_spark.operators.embeddings import reduce_embeddings

    t0 = time.perf_counter()
    out["reduce_rows"] = reduce_embeddings(emb).count()
    out["reduce_sec"] = round(time.perf_counter() - t0, 2)

    # --- span dedup: 10% of docs share a planted 10-word tail ------------
    from weather_monitoring_spark.operators.spans import strip_dup_spans

    span_docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat_ws(
                " ",
                F.col("text"),
                F.lit("alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    t0 = time.perf_counter()
    out["span_masked_tokens"] = (
        strip_dup_spans(span_docs)
        .agg(F.sum("n_masked").alias("m"))
        .first()["m"]
    )
    out["strip_dup_spans_sec"] = round(time.perf_counter() - t0, 2)

    # --- LM scoring: corpus joined against the (held-out) count table ----
    from weather_monitoring_spark.operators.textops import lm_score

    t0 = time.perf_counter()
    out["lm_score_rows"] = lm_score(
        docs, bigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
    ).count()
    out["lm_score_sec"] = round(time.perf_counter() - t0, 2)

    # --- incremental dedup: 90% history index, 10% daily batch -----------
    from weather_monitoring_spark.operators.winnow import (
        dedup_against_index,
        fingerprint_index,
    )

    hist = docs.filter(F.col("doc_id") % 10 != 0)
    # 10% of batch docs are near-copies of history (planted via shared text)
    batch = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10 * n_docs).alias("doc_id"),
        F.when(
            F.col("doc_id") % 100 == 0,
            # verbatim copy of HISTORY doc id+1 (id % 10 == 1 -> indexed):
            # regenerate its deterministic text rather than self-copy a
            # batch doc (batch docs are not in the index)
            F.expr(
                "concat_ws(' ', transform(sequence(1, 60), i -> "
                "substring(md5(concat(doc_id + 1, ':w', i)), 1, 8)))"
            ),
        )
        .otherwise(
            F.expr(
                "concat_ws(' ', transform(sequence(1, 60), i -> "
                "substring(md5(concat(doc_id, ':fresh', i)), 1, 8)))"
            )
        )
        .alias("text"),
    )
    t0 = time.perf_counter()
    idx = fingerprint_index(hist).localCheckpoint(eager=True)
    out["fp_index_rows"] = idx.count()
    out["fp_index_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["incremental_dedup_flagged"] = (
        dedup_against_index(batch, idx).filter(F.col("is_dup")).count()
    )
    out["incremental_dedup_sec"] = round(time.perf_counter() - t0, 2)

    # --- mixture weights: corpus -> |sources|-row arithmetic -------------
    from weather_monitoring_spark.operators.training_prep import mixture_weights

    sourced = docs.withColumn(
        "source", F.concat(F.lit("src"), (F.col("doc_id") % 17).cast("string"))
    )
    t0 = time.perf_counter()
    out["mixture_sources"] = mixture_weights(sourced).count()
    out["mixture_sec"] = round(time.perf_counter() - t0, 2)

    # --- HTML -> text extraction: pure projection, should track scan ----
    from weather_monitoring_spark.operators.htmlops import extract_html_text

    html_docs = docs.select(
        "doc_id",
        F.expr(
            "concat('<html><head><title>t</title>"
            "<script>var i=1; if(i<2){x(\"<p>\")}</script>"
            "<style>.m{c:1}</style></head><body><p>', text, "
            "' &amp; &lt;x&gt;</p><a href=\"/a\">l</a></body></html>')"
        ).alias("html"),
    )
    t0 = time.perf_counter()
    # sum-of-lengths, not count(): count() lets Catalyst prune the text
    # column and skip the whole regex chain — it would time nothing.
    out["html_extract_chars"] = int(
        extract_html_text(html_docs)
        .agg(F.sum(F.length("text")).alias("c"))
        .first()["c"]
    )
    out["html_extract_sec"] = round(time.perf_counter() - t0, 2)

    # --- corpus-wide paragraph dedup: digests elect keepers --------------
    from weather_monitoring_spark.operators.lines import dedup_paragraphs

    para_docs = docs.select(
        "doc_id",
        F.expr(
            "array(substring(text, 1, 120), "
            "concat('SHARED-', CAST(doc_id % 1000 AS STRING)), "
            "substring(text, 121, 120))"
        ).alias("paras"),
    )
    t0 = time.perf_counter()
    out["para_dedup_dropped"] = int(
        dedup_paragraphs(para_docs)
        .agg(F.sum(F.col("n_paras") - F.col("n_kept")).alias("d"))
        .first()["d"]
    )
    out["para_dedup_sec"] = round(time.perf_counter() - t0, 2)

    # --- heavy hitters: shuffle bounded by partitions x k ----------------
    from weather_monitoring_spark.operators.sketches import (
        heavy_hitters,
        heavy_hitters_threshold,
    )

    keyed = docs.select(
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.lit("hot"), (F.col("doc_id") % 3).cast("string")),
        )
        .otherwise(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12))
        .alias("key")
    )
    t0 = time.perf_counter()
    out["heavy_hitters_candidates"] = heavy_hitters(keyed, "key", k=100).count()
    out["heavy_hitters_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["heavy_hitters_exact_rows"] = heavy_hitters_threshold(
        keyed, "key", min_frac=0.01
    ).count()
    out["heavy_hitters_exact_sec"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out))


def _resilient_main() -> None:
    """Run main(); if any row crashes (probe scales are deliberately at
    the host's limits), STILL print the rows measured so far plus the
    failure — a crashed probe that discards its completed measurements
    forces a full re-run per attempt (r6 lesson: two 30-minute attempts
    lost all their numbers to a single late row)."""
    import traceback

    try:
        main()
    except BaseException as e:  # noqa: BLE001 - report, then re-raise
        OUT["probe_failed"] = repr(e)[:500]
        print(json.dumps(OUT), flush=True)
        traceback.print_exc()
        raise


if __name__ == "__main__":
    _resilient_main()

"""Adversarial-skew stress for the dedup guards at 1M docs (VERDICT r12
#5; tests/test_properties.py::test_skewed_corpus_dedup_guards_keep_
survivors_exact is the CI-sized twin).

Two 1M-doc corpora, generated distributedly:

- **uniform**: every doc a distinct 40-word salad;
- **skewed**: 30% byte-identical boilerplate (one text, 300k copies),
  10% sub-shingle stubs (no 3-gram content at all), 1% planted genuine
  near-dup pairs, the rest distinct.

Claims measured:
1. the q31-shaped candidate stage (minhash_lsh_pairs) on the skewed
   corpus stays within a bounded multiple of the uniform corpus — the
   sqrt(n) hot-bucket guard routes the boilerplate band buckets
   (300k members each, m^2 = 9*10^10 pair rows un-guarded) to linear
   star pairs;
2. the q50-shaped composition (candidates -> exact Jaccard verify)
   keeps survivor semantics exact: stubs pair with nothing (r12
   NULL-band fix), the boilerplate mega-cluster is not fuzzily deleted
   (its shingles sit above the df cutoff; byte-identical mass is
   exact_dedup's job — measured here too, keeping exactly the min-id
   keeper), planted near-dups outside hot buckets are all caught.

Run: python scripts/probe_dedup_skew_stress.py [N_DOCS]
Writes scripts/probe_dedup_skew_stress.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_monitoring_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
WORDS = 40


def uniform_corpus(spark, n):
    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS - 1)),
        lambda w: F.conv(F.abs(F.xxhash64(F.col("id"), w)).cast("string"), 10, 36),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def skewed_corpus(spark, n):
    """doc_id % 100: 0-29 boilerplate, 30-39 stub, 40-41 near-dup pair
    halves (41 = 40's text with the last word changed), else distinct."""
    m = F.pmod(F.col("id"), F.lit(100))
    pair_seed = (F.col("id") - F.lit(1)).cast("long")  # 41 mirrors 40
    seed = F.when(m == 41, pair_seed).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS - 1)),
        lambda w: F.conv(F.abs(F.xxhash64(seed, w)).cast("string"), 10, 36),
    )
    salad = F.array_join(words, " ")
    near = F.concat(
        F.array_join(F.slice(words, 1, WORDS - 1), " "), F.lit(" changedword")
    )
    boiler = " ".join(f"boiler{w}" for w in range(WORDS))
    text = (
        F.when(m < 30, F.lit(boiler))
        .when(m < 40, F.lit("stub"))
        .when(m == 41, near)
        .otherwise(salad)
    )
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))


def run_pipeline(spark, docs, label, out):
    from weather_monitoring_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_verify,
    )

    docs = docs.localCheckpoint(eager=True)
    t0 = time.perf_counter()
    cand = minhash_lsh_pairs(docs).localCheckpoint(eager=True)
    n_cand = cand.count()
    lsh_s = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    verified = ngram_jaccard_verify(docs, cand).localCheckpoint(eager=True)
    n_verified = verified.count()
    verify_s = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_exact_groups = exact_dedup(docs).count()
    exact_s = round(time.perf_counter() - t0, 2)
    out[label] = {
        "n_docs": docs.count(),
        "lsh_candidates": n_cand,
        "lsh_wall_s": lsh_s,
        "verified_pairs": n_verified,
        "verify_wall_s": verify_s,
        "exact_dedup_groups": n_exact_groups,
        "exact_wall_s": exact_s,
    }
    print(label, out[label], flush=True)
    return cand, verified


def main():
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=32,
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_PROBE_MEM", "48g"
            )
        },
    )
    out = {"n_docs": N_DOCS}
    run_pipeline(spark, uniform_corpus(spark, N_DOCS), "uniform", out)
    skew = skewed_corpus(spark, N_DOCS).localCheckpoint(eager=True)
    cand, verified = run_pipeline(spark, skew, "skewed", out)

    # survivor-semantics checks on the skewed corpus (all plan-side)
    m = F.pmod(F.col("doc_id"), F.lit(100))
    stub_pairs = (
        cand.join(skew.filter(m < 40).filter(m >= 30), cand.id_a == F.col("doc_id"), "left_semi").count()
        + cand.join(skew.filter(m < 40).filter(m >= 30), cand.id_b == F.col("doc_id"), "left_semi").count()
    )
    vb = verified.select(F.col("id_b").alias("doc_id"))
    boiler_dropped = vb.join(skew.filter(m < 30), "doc_id", "left_semi").count()
    stub_dropped = vb.join(skew.filter((m >= 30) & (m < 40)), "doc_id", "left_semi").count()
    planted = skew.filter(m == 41).count()
    planted_caught = vb.filter(F.pmod(F.col("doc_id"), F.lit(100)) == 41).count()
    from weather_monitoring_spark.operators.dedup import exact_dedup

    keep = exact_dedup(skew)
    boiler_keepers = keep.join(
        skew.filter(m < 30).select(F.col("doc_id").alias("keeper_doc_id")),
        "keeper_doc_id",
        "left_semi",
    ).count()
    ratios = {
        "lsh_wall_skew_over_uniform": round(
            out["skewed"]["lsh_wall_s"] / out["uniform"]["lsh_wall_s"], 3
        ),
        "verify_wall_skew_over_uniform": round(
            out["skewed"]["verify_wall_s"] / out["uniform"]["verify_wall_s"], 3
        ),
        "cand_skew_over_n": round(out["skewed"]["lsh_candidates"] / N_DOCS, 4),
    }
    out["semantics"] = {
        "stub_candidate_incidences": stub_pairs,          # must be 0
        "boilerplate_fuzzy_dropped": boiler_dropped,      # must be 0
        "stub_fuzzy_dropped": stub_dropped,               # must be 0
        "planted_near_dups": planted,
        "planted_caught": planted_caught,                 # must equal planted
        "boilerplate_exact_keepers": boiler_keepers,      # must be 1
    }
    out["ratios"] = ratios
    ok = (
        stub_pairs == 0
        and boiler_dropped == 0
        and stub_dropped == 0
        and planted_caught == planted
        and boiler_keepers == 1
        and ratios["lsh_wall_skew_over_uniform"] < 3.0
    )
    out["all_claims_hold"] = ok
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_dedup_skew_stress.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()

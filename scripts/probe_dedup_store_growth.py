"""Growth probe for the r13 streaming dedup store (VERDICT r12 #1).

Claim under test: with the LSM layout (per-batch deltas + periodically
compacted hash-clustered base generations) and probe-direction joins
(store scans in place against broadcast batch keys), per-batch wall
time stays FLAT as the accumulated corpus grows — the r12 layout's
per-batch cost grew with both the batch count (one directory per
micro-batch forever; file-listing/open overhead) and the corpus size
(sort-merge anti joins re-shuffled the whole unbucketed store every
trigger).

Shape: N_BATCHES micro-batches of BATCH_DOCS synthetic documents each
(~1.1M docs accumulated), with 10% exact re-arrivals and 5% near-dup
rewrites of earlier documents so both probe joins do real work every
batch. Reports per-batch wall times, decile medians (early vs late),
the flatness ratio between them, survivor counts, and the end-state
file/directory census of the store.

Run: python scripts/probe_dedup_store_growth.py [N_BATCHES]
Writes scripts/probe_dedup_store_growth.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_monitoring_spark.session import get_spark
from weather_monitoring_spark.streaming.doc_dedup import StreamingDocDedup

N_BATCHES = int(sys.argv[1]) if len(sys.argv) > 1 else 220
BATCH_DOCS = 5000
EXACT_DUP_FRAC = 0.10
NEAR_DUP_FRAC = 0.05
WORDS_PER_DOC = 40


def batch_df(spark, b: int):
    """BATCH_DOCS docs for batch b, generated distributedly: 85% fresh
    (seeded word salad, unique per (batch, i)), 10% exact re-arrivals of
    a doc from an earlier batch, 5% near-dup rewrites (one word changed)
    of an earlier doc — all pure column algebra, no driver data."""
    n_exact = int(BATCH_DOCS * EXACT_DUP_FRAC)
    n_near = int(BATCH_DOCS * NEAR_DUP_FRAC)
    base = spark.range(BATCH_DOCS).select(
        (F.lit(b) * BATCH_DOCS + F.col("id")).alias("doc_id"),
        F.col("id").alias("i"),
    )
    # which (batch, slot) a dup/near row replays: deterministic spread
    # over all earlier batches
    src_b = F.pmod(F.xxhash64(F.col("i"), F.lit(b)), F.lit(max(b, 1)))
    src_i = F.pmod(F.xxhash64(F.col("i"), F.lit(b), F.lit(1)), F.lit(BATCH_DOCS))
    eff_b = F.when((F.col("i") < n_exact + n_near) & (F.lit(b) > 0), src_b).otherwise(F.lit(b))
    eff_i = F.when((F.col("i") < n_exact + n_near) & (F.lit(b) > 0), src_i).otherwise(F.col("i"))
    # doc text = WORDS_PER_DOC hashed words seeded by (eff_b, eff_i);
    # near-dups (slots [n_exact, n_exact+n_near)) replace word 0
    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
        lambda w: F.conv(
            F.abs(F.xxhash64(eff_b, eff_i, w)).cast("string"), 10, 36
        ),
    )
    near = (F.col("i") >= n_exact) & (F.col("i") < n_exact + n_near) & (F.lit(b) > 0)
    text = F.when(
        near,
        F.concat(
            F.lit("rewritten "),
            F.array_join(F.slice(words, 2, WORDS_PER_DOC - 1), " "),
        ),
    ).otherwise(F.array_join(words, " "))
    return base.select("doc_id", text.alias("text"))


def census(root: str) -> dict:
    files = dirs = 0
    for _, dnames, fnames in os.walk(root):
        dirs += len(dnames)
        files += len(fnames)
    return {"dirs": dirs, "files": files}


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    store_dir = tempfile.mkdtemp(prefix="dedup_growth_")
    dd = StreamingDocDedup(spark, store_dir)
    wall = []
    try:
        for b in range(N_BATCHES):
            df = batch_df(spark, b).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            dd.process_batch(df, b)
            wall.append(round(time.perf_counter() - t0, 4))
            if b % 20 == 0:
                print(f"batch {b}: {wall[-1]:.2f}s", flush=True)
        corpus_n = dd.corpus().count()
        # compaction batches spike by design (they rewrite the base —
        # amortized, not per-batch, cost); report them separately so the
        # flatness claim is about the steady-state trigger path
        is_compact = [
            (b % dd.compact_every) == (dd.compact_every - 1)
            for b in range(N_BATCHES)
        ]
        steady = [w for w, c in zip(wall, is_compact) if not c]
        compact = [w for w, c in zip(wall, is_compact) if c]
        # skip the first 10 batches (JVM/codegen warmup dominates them)
        early = statistics.median(steady[10:40])
        late = statistics.median(steady[-40:-10])
        out = {
            "n_batches": N_BATCHES,
            "batch_docs": BATCH_DOCS,
            "docs_offered": N_BATCHES * BATCH_DOCS,
            "corpus_survivors": corpus_n,
            "exact_dup_frac": EXACT_DUP_FRAC,
            "near_dup_frac": NEAR_DUP_FRAC,
            "compact_every": dd.compact_every,
            "n_buckets": dd.n_buckets,
            "wall_per_batch_s": wall,
            "median_early_s": round(early, 4),
            "median_late_s": round(late, 4),
            "flatness_late_over_early": round(late / early, 4),
            "median_compaction_batch_s": round(statistics.median(compact), 4)
            if compact else None,
            "max_compaction_batch_s": round(max(compact), 4) if compact else None,
            "store_census": {
                name: census(root)
                for name, root in (
                    ("corpus", dd.corpus_dir),
                    ("fingerprints", dd.fp_dir),
                    ("bands", dd.bands_dir),
                )
            },
        }
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "probe_dedup_store_growth.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({k: v for k, v in out.items()
                          if k != "wall_per_batch_s"}, indent=1))
    finally:
        shutil.rmtree(store_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()

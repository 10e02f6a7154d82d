"""Streaming document deduplication — the LLM-ops x streaming
intersection: an unbounded stream of documents deduplicated against
everything seen so far, exact + fuzzy.

Design (foreachBatch, like every stateful sink in this engine):

1. **exact**: drop batch rows whose content hash already exists in the
   persisted fingerprint store (anti-join), and batch-internal duplicates
   (keep min id per hash).
2. **fuzzy**: MinHash band hashes of the remaining rows are anti-joined
   against the persisted band index — a candidate band collision marks
   the doc as a near-dup of the existing corpus and it is dropped. (The
   1-in-2^128 band-hash false-positive rate is negligible; false
   negatives follow the LSH curve, tunable via K/bands in
   operators/dedup.py.)
3. survivors are appended to the output corpus AND their fingerprints +
   band hashes are appended to the stores.

The stores are plain parquet append tables keyed by digest — at 100 TB
they'd be bucketed by hash prefix so both anti-joins stay co-located and
the per-batch cost is O(batch), independent of corpus size. Batch-id
tracking makes replays no-ops (same pattern as ContinuousRollup).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from weather_monitoring_spark.operators.dedup import LSH_BANDS, minhash_signatures


class StreamingDocDedup:
    def __init__(self, spark: SparkSession, store_dir: str) -> None:
        self.spark = spark
        self.corpus_dir = os.path.join(store_dir, "corpus")
        self.fp_dir = os.path.join(store_dir, "fingerprints")
        self.bands_dir = os.path.join(store_dir, "bands")
        self._meta = os.path.join(store_dir, "meta.json")
        os.makedirs(store_dir, exist_ok=True)

    def corpus(self) -> DataFrame:
        return self.spark.read.parquet(self.corpus_dir)

    def _read_or_none(self, path: str) -> DataFrame | None:
        return self.spark.read.parquet(path) if os.path.exists(path) else None

    def _last_applied(self) -> int:
        if not os.path.exists(self._meta):
            return -1
        with open(self._meta) as f:
            return json.load(f).get("last_batch_id", -1)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_applied():
            return
        # 1. exact: batch-internal (min doc_id per hash) + vs store
        hashed = batch_df.withColumn("fp", F.md5(F.col("text")))
        w_min = hashed.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        fresh = hashed.join(w_min, ["fp", "doc_id"], "left_semi")
        store_fp = self._read_or_none(self.fp_dir)
        if store_fp is not None:
            fresh = fresh.join(store_fp, "fp", "left_anti")

        # 2. fuzzy: any band collision with the persisted index -> drop
        sigs = minhash_signatures(fresh)
        bands = sigs.select(
            "doc_id",
            F.posexplode(
                F.array(*[F.col(f"band_{b}") for b in range(LSH_BANDS)])
            ).alias("band_idx", "bh"),
        )
        store_bands = self._read_or_none(self.bands_dir)
        if store_bands is not None:
            neardup_ids = bands.join(store_bands, ["band_idx", "bh"], "left_semi").select(
                "doc_id"
            ).distinct()
            fresh = fresh.join(neardup_ids, "doc_id", "left_anti")

        # 3. append survivors + their index entries. The survivor set MUST
        # have its lineage truncated before the first store write: the
        # plans above read the fp/band stores lazily, and appending to
        # those paths auto-invalidates dependent caches (refreshByPath),
        # so a merely-cached plan re-evaluated after the fp append would
        # see the batch's own fingerprints and filter out its own
        # survivors. localCheckpoint pins the rows themselves.
        fresh = fresh.localCheckpoint(eager=True)
        survivor_bands = minhash_signatures(fresh).select(
            "doc_id",
            F.posexplode(
                F.array(*[F.col(f"band_{b}") for b in range(LSH_BANDS)])
            ).alias("band_idx", "bh"),
        )
        fresh.drop("fp").write.mode("append").parquet(self.corpus_dir)
        fresh.select("fp").write.mode("append").parquet(self.fp_dir)
        survivor_bands.write.mode("append").parquet(self.bands_dir)
        with open(self._meta + ".tmp", "w") as f:
            json.dump({"last_batch_id": batch_id}, f)
        os.replace(self._meta + ".tmp", self._meta)

    def attach(
        self, doc_stream: DataFrame, checkpoint_dir: str, trigger: dict | None = None
    ) -> StreamingQuery:
        trig = trigger or {"processingTime": "10 seconds"}
        return (
            doc_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(**trig)
            .start()
        )

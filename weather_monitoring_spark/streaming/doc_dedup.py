"""Streaming document deduplication — the LLM-ops x streaming
intersection: an unbounded stream of documents deduplicated against
everything seen so far, exact + fuzzy.

Design (foreachBatch, like every stateful sink in this engine):

1. **exact**: drop batch rows whose content hash already exists in the
   persisted fingerprint store (anti-join), and batch-internal duplicates
   (keep min id per hash).
2. **fuzzy**: MinHash band hashes of the remaining rows are anti-joined
   against the persisted band index — a candidate band collision marks
   the doc as a near-dup of the existing corpus and it is dropped — AND
   self-joined within the batch (keep the min doc_id of each colliding
   band group), so two near-dup documents arriving in the same
   micro-batch don't both survive. (The 1-in-2^128 band-hash
   false-positive rate is negligible; false negatives follow the LSH
   curve, tunable via K/bands in operators/dedup.py.)
3. survivors + their fingerprints/band hashes are written to
   ``batch_id=N`` partition directories with overwrite semantics — the
   replay of a partially-written batch overwrites its own partitions
   instead of appending next to them, so corpus/fp/band stay consistent
   with NO ordering requirement between the three writes. Store reads
   filter to ``batch_id < current``, so a crashed attempt's partial
   partitions can't shadow the retry's own survivors.

The stores are plain parquet tables keyed by digest — at 100 TB they'd
be bucketed by hash prefix so the anti-joins stay co-located and the
per-batch cost is O(batch), independent of corpus size. The meta file is
only a fast-path skip; idempotency comes from partition overwrite.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from weather_monitoring_spark.operators.dedup import LSH_BANDS, minhash_signatures

#: Persisted-store format version. 2 = 60-bit BIGINT band keys (the r7
#: key packing in operators/dedup.minhash_signatures); 1 (or absent) =
#: the pre-r7 32-char md5 hex strings. A store written under one format
#: must not be read under the other — mixed parquet partitions fail the
#: scan, and a type-coerced join would silently match NOTHING, letting
#: near-dups of the existing corpus back in — so construction refuses a
#: format-mismatched store with a clear error instead of degrading.
STORE_FORMAT = 2


class StreamingDocDedup:
    def __init__(self, spark: SparkSession, store_dir: str) -> None:
        self.spark = spark
        self.corpus_dir = os.path.join(store_dir, "corpus")
        self.fp_dir = os.path.join(store_dir, "fingerprints")
        self.bands_dir = os.path.join(store_dir, "bands")
        self._meta = os.path.join(store_dir, "meta.json")
        os.makedirs(store_dir, exist_ok=True)
        if os.path.exists(self._meta):
            with open(self._meta) as f:
                fmt = json.load(f).get("format", 1)
            if fmt != STORE_FORMAT:
                raise ValueError(
                    f"StreamingDocDedup store at {store_dir} was written "
                    f"with band-store format {fmt}; this build reads/"
                    f"writes format {STORE_FORMAT} (60-bit BIGINT band "
                    "keys). Rebuild the store by replaying the corpus "
                    "through a fresh store_dir, or run the matching "
                    "engine version against it."
                )

    def corpus(self) -> DataFrame:
        return self.spark.read.parquet(self.corpus_dir).drop("batch_id")

    def _read_before(self, path: str, batch_id: int) -> DataFrame | None:
        """Store contents committed by earlier batches only — a crashed
        attempt of THIS batch may have left partial partitions that must
        not be visible to the retry."""
        if not os.path.exists(path):
            return None
        df = self.spark.read.parquet(path)
        return df.filter(F.col("batch_id") < batch_id).drop("batch_id")

    def _last_applied(self) -> int:
        if not os.path.exists(self._meta):
            return -1
        with open(self._meta) as f:
            return json.load(f).get("last_batch_id", -1)

    def _batch_partition(self, root: str, batch_id: int) -> str:
        return os.path.join(root, f"batch_id={batch_id}")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self._last_applied():
            return
        # 1. exact: batch-internal (min doc_id per hash) + vs store.
        # NULL text = UNKNOWN content, never shared content: md5(NULL)
        # is NULL, and a NULL fp would fail the null-rejecting semi
        # join below — silently dropping EVERY null-text doc (the
        # url_dedup r12 null-collapse class, one layer worse). The
        # sentinel makes each null-text doc its own exact-dedup group
        # while re-arrival of the same doc_id still dedups vs store.
        hashed = batch_df.withColumn(
            "fp",
            F.coalesce(
                F.md5(F.col("text")),
                F.concat(F.lit("null:"), F.col("doc_id").cast("string")),
            ),
        )
        w_min = hashed.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        fresh = hashed.join(w_min, ["fp", "doc_id"], "left_semi")
        store_fp = self._read_before(self.fp_dir, batch_id)
        if store_fp is not None:
            fresh = fresh.join(store_fp, "fp", "left_anti")

        # 2. fuzzy: band hashes of the exact-surviving rows. Null-text
        # rows BYPASS the fuzzy stage entirely (here and in the store
        # write below): they have no content to be "near" — but they
        # all minhash to the same degenerate signature, so letting them
        # in would re-collapse them against each other at step 2a.
        sigs = minhash_signatures(fresh.filter(F.col("text").isNotNull()))
        bands = sigs.select(
            "doc_id",
            F.posexplode(
                F.array(*[F.col(f"band_{b}") for b in range(LSH_BANDS)])
            ).alias("band_idx", "bh"),
        ).localCheckpoint(eager=False)
        # 2a. batch-internal: two near-dups arriving in the same batch must
        # not both survive — keep the min doc_id of each colliding band
        # group (mirrors the batch-internal exact-dedup step). Drop
        # semantics need no pair ENUMERATION: "collides with a smaller id
        # in some bucket" == "id > its bucket's min id" — one aggregate +
        # a fan-out-1 join, where the band self-join this replaces was
        # m^2 per bucket for a burst of near-identical boilerplate
        # arriving in one micro-batch (byte-identical copies are already
        # collapsed by step 1, but near-identical ones were not).
        keepers = bands.groupBy("band_idx", "bh").agg(
            F.min("doc_id").alias("_keeper")
        )
        batch_drops = (
            bands.join(keepers, ["band_idx", "bh"])
            .filter(F.col("doc_id") > F.col("_keeper"))
            .select("doc_id")
            .distinct()
        )
        fresh = fresh.join(batch_drops, "doc_id", "left_anti")
        # 2b. vs the persisted index: any band collision -> near-dup of the
        # existing corpus -> drop.
        store_bands = self._read_before(self.bands_dir, batch_id)
        if store_bands is not None:
            neardup_ids = bands.join(store_bands, ["band_idx", "bh"], "left_semi").select(
                "doc_id"
            ).distinct()
            fresh = fresh.join(neardup_ids, "doc_id", "left_anti")

        # 3. write survivors + index entries into this batch's partition
        # directories with OVERWRITE semantics: a replay of a partially
        # written batch overwrites its own partitions, so the three stores
        # stay mutually consistent with no ordering requirement between
        # the writes. The survivor set MUST have its lineage truncated
        # first: the plans above read the fp/band stores lazily, and
        # writing those paths auto-invalidates dependent caches
        # (refreshByPath), so a merely-cached plan re-evaluated after the
        # fp write would see the batch's own fingerprints and filter out
        # its own survivors. localCheckpoint pins the rows themselves.
        fresh = fresh.localCheckpoint(eager=True)
        survivor_bands = minhash_signatures(
            fresh.filter(F.col("text").isNotNull())
        ).select(
            "doc_id",
            F.posexplode(
                F.array(*[F.col(f"band_{b}") for b in range(LSH_BANDS)])
            ).alias("band_idx", "bh"),
        )
        fresh.drop("fp").write.mode("overwrite").parquet(
            self._batch_partition(self.corpus_dir, batch_id)
        )
        fresh.select("fp").write.mode("overwrite").parquet(
            self._batch_partition(self.fp_dir, batch_id)
        )
        survivor_bands.write.mode("overwrite").parquet(
            self._batch_partition(self.bands_dir, batch_id)
        )
        with open(self._meta + ".tmp", "w") as f:
            json.dump({"last_batch_id": batch_id, "format": STORE_FORMAT}, f)
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

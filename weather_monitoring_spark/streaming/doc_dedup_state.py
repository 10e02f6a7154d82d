"""Streaming document dedup on Spark's OWN state store — the flat-cost
sibling of :mod:`weather_monitoring_spark.streaming.doc_dedup`.

The parquet-store engine keeps the seen-corpus index as immutable
columnar runs and answers membership with a per-batch store SCAN. Its
shuffle volume is O(batch), but the scan itself grows linearly with the
corpus (measured: 3.8 s -> 6.6 s per batch across 1M accumulated docs,
probe JSON committed) — at 100 TB a scan per 10 s trigger is the wrong
trade. The scan-free answer is POINT LOOKUPS, and Spark already ships
the machinery: the streaming state store (keyed, incrementally
checkpointed, RocksDB-backed at scale). This engine re-expresses both
dedup stages as ``applyInPandasWithState`` operators, so per-batch cost
is the batch's own shuffle + O(batch) state-store lookups/updates —
INDEPENDENT of corpus size.

Topology — two chained streaming queries (Spark allows one arbitrary
stateful operator per query; the handoff is an exactly-once streaming
file sink, so the composition stays end-to-end exactly-once):

  query A (exact):  docs -> fp = md5(text) (NULL-text sentinel, the r12
    null-identity contract) -> groupBy(fp) stateful: first batch to
    present a fingerprint emits its min-doc_id row, every later arrival
    (and every same-batch larger id) is dropped; state per key = seen
    marker. Sink: ``<out>/exact/`` parquet.

  query B (fuzzy):  exact survivors (streamed from A's sink) -> MinHash
    band rows (band_idx 0 carries the text so the 16x explode ships
    each text once) -> groupBy(packed band key) stateful: a key with
    existing state marks its rows known=True; a fresh key elects the
    batch's min doc_id keeper (known=False) and marks the rest True;
    state = seen marker. foreachBatch assembles verdicts: a doc
    survives iff ALL its band rows are known=False (same drop law as
    the parquet engine: any store hit, or a larger id in some bucket),
    and appends survivors to ``<out>/corpus/`` with batch_id-scoped
    overwrite (idempotent replay).

Null-text docs bypass the fuzzy stage entirely (no content to be
"near"; they all minhash to one degenerate signature) — query B routes
them straight to the corpus sink, keyed by their sentinel fingerprint.

State sizing: one marker per distinct fingerprint + one per distinct
band key (~LSH_BANDS x docs). The default HDFS-backed provider holds
state on executor heaps — fine to tens of millions of keys; at real
scale set ``spark.sql.streaming.stateStore.providerClass`` to the
RocksDB provider (changelog-checkpointed, spills to disk) — a config
flip, not a code change.

Trade vs the parquet engine: no queryable band/fingerprint TABLES (the
index lives inside the state store), and corpus survivors appear one
trigger later (two-query pipeline). Pick this engine for unbounded
high-rate streams; pick the parquet engine when the index itself must
be a first-class table.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from weather_monitoring_spark.operators.dedup import LSH_BANDS

_EXACT_OUT = "doc_id long, text string, fp string"
_SEEN_STATE = "seen boolean"
_BAND_OUT = "doc_id long, text string, fp string, band_idx int, known boolean"


def _exact_keeper(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """One fingerprint group: emit nothing if the fp was ever seen;
    otherwise emit the min-doc_id row (deterministic keeper) and mark
    the fp seen. Pure point lookup + point update — no corpus scan."""
    (fp,) = key
    if state.exists:
        for _ in batches:
            pass
        return
    best = None
    for pdf in batches:
        i = pdf["doc_id"].idxmin()
        row = pdf.loc[i]
        if best is None or row["doc_id"] < best["doc_id"]:
            best = row
    state.update((True,))
    yield pd.DataFrame(
        {"doc_id": [int(best["doc_id"])], "text": [best["text"]], "fp": [fp]}
    )


def _band_verdicts(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """One band-key group: rows are known=True when the key has state
    (near-dup of the existing corpus) or when a smaller doc_id shares
    the key in this batch (batch-internal collision keeps the min-id
    keeper) — the exact drop law of the parquet engine's 2a/2b."""
    known = state.exists
    frames = [pdf for pdf in batches if len(pdf)]
    if not frames:
        return
    allb = pd.concat(frames, ignore_index=True)
    keeper = int(allb["doc_id"].min())
    allb["known"] = True if known else allb["doc_id"] != keeper
    state.update((True,))
    yield allb[["doc_id", "text", "fp", "band_idx", "known"]]


class StateStoreDocDedup:
    """Flat-cost streaming doc dedup (see module docstring)."""

    def __init__(self, spark: SparkSession, out_dir: str) -> None:
        self.spark = spark
        self.exact_dir = os.path.join(out_dir, "exact")
        self.corpus_dir = os.path.join(out_dir, "corpus")
        os.makedirs(self.corpus_dir, exist_ok=True)

    # ------------------------------ query A ------------------------------

    def attach_exact(
        self,
        doc_stream: DataFrame,
        checkpoint_dir: str,
        trigger: dict | None = None,
        output_files_per_batch: int | None = None,
    ) -> StreamingQuery:
        """``output_files_per_batch`` coalesces the survivor sink (one
        file per batch keeps query B's batch granularity 1:1 with A's —
        useful for audit/probing; leave None to let the write
        parallelize at scale)."""
        trig = trigger or {"processingTime": "10 seconds"}
        hashed = doc_stream.withColumn(
            "fp",
            F.coalesce(
                F.md5(F.col("text")),
                F.concat(F.lit("null:"), F.col("doc_id").cast("string")),
            ),
        ).select("doc_id", "text", "fp")
        survivors = hashed.groupBy("fp").applyInPandasWithState(
            _exact_keeper,
            outputStructType=_EXACT_OUT,
            stateStructType=_SEEN_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        if output_files_per_batch:
            survivors = survivors.coalesce(output_files_per_batch)
        return (
            survivors.writeStream.format("parquet")
            .option("path", self.exact_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(**trig)
            .start()
        )

    # ------------------------------ query B ------------------------------

    def _band_rows(self, texted: DataFrame) -> DataFrame:
        """(doc_id, text, fp, band_idx, bkey) — the MinHash band
        derivation of ``operators.dedup.minhash_signatures`` (arrow
        remix, 60-bit band keys, NULL keys for shingle-less docs)
        inlined WITH passenger columns: the canonical function projects
        them away, and rejoining them here would be a stream-stream
        self-join — a second stateful operator Spark (rightly) refuses
        next to the band-key one."""
        from weather_monitoring_spark.functions.text import (
            h60_from_md5_sql,
            shingle_hashes_sql,
            shingles_expr,
            tokens_expr,
        )
        from weather_monitoring_spark.operators.dedup import (
            LSH_ROWS,
            MINHASH_K,
            _minhash_arrow_expr,
        )

        keep = [F.col("doc_id"), F.col("text"), F.col("fp")]
        sigs = (
            texted.withColumn("_tk", tokens_expr("text"))
            .withColumn("_sh", shingles_expr("_tk"))
            .select(*keep, F.expr(shingle_hashes_sql("_sh")).alias("_hs"))
            .select(*keep, _minhash_arrow_expr("_hs", MINHASH_K).alias("_mh"))
            .select(
                *keep,
                *[F.col("_mh")[i].alias(f"mh_{i}") for i in range(MINHASH_K)],
            )
        )
        band_cols = []
        for b in range(LSH_BANDS):
            parts = ", ".join(
                f"CAST(mh_{b * LSH_ROWS + r} AS STRING)" for r in range(LSH_ROWS)
            )
            h60 = h60_from_md5_sql(f"md5(concat_ws('-', {parts}))")
            band_cols.append(
                F.expr(
                    f"CASE WHEN mh_0 IS NULL THEN CAST(NULL AS BIGINT) "
                    f"ELSE {h60} END"
                ).alias(f"band_{b}")
            )
        # 60-bit band hash + 4-bit band index pack into ONE long key
        # (wraparound past 2^63 is bijective on the < 2^64 range, so
        # distinct (band_idx, bh) stay distinct); text rides band 0
        # only — the explode must not ship each text LSH_BANDS times
        # through the state-store shuffle
        return (
            sigs.select(*keep, *band_cols)
            .select(
                "doc_id",
                "text",
                "fp",
                F.posexplode(
                    F.array(*[F.col(f"band_{b}") for b in range(LSH_BANDS)])
                ).alias("band_idx", "bh"),
            )
            .select(
                "doc_id",
                F.when(F.col("band_idx") == 0, F.col("text")).alias("text"),
                "fp",
                "band_idx",
                (
                    F.shiftleft(F.col("band_idx").cast("long"), 60)
                    + F.col("bh").cast("long")
                ).alias("bkey"),
            )
        )

    def attach_fuzzy(
        self,
        checkpoint_dir: str,
        trigger: dict | None = None,
        max_files_per_trigger: int | None = None,
    ) -> StreamingQuery:
        """``max_files_per_trigger`` bounds how much of A's sink one
        micro-batch swallows (the standard source-bounding knob)."""
        trig = trigger or {"processingTime": "10 seconds"}
        reader = self.spark.readStream.schema(_EXACT_OUT)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        exact = reader.parquet(self.exact_dir)
        bands = self._band_rows(exact.filter(F.col("text").isNotNull()))
        verdicts = bands.filter(F.col("bkey").isNotNull()).groupBy(
            "bkey"
        ).applyInPandasWithState(
            _band_verdicts,
            outputStructType=_BAND_OUT,
            stateStructType=_SEEN_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        # UNKNOWN-content rows bypass the band state entirely: NULL text
        # (no content to be near) and shingle-less docs (NULL band keys
        # — pooling them under the NULL key would re-collapse every
        # short doc into one survivor, the r12 null-identity class)
        nulltext = exact.filter(F.col("text").isNull()).select(
            "doc_id", "text", "fp"
        )
        shingleless = (
            bands.filter(F.col("bkey").isNull() & (F.col("band_idx") == 0))
            .select("doc_id", "text", "fp")
        )
        nulltext = nulltext.unionByName(shingleless)

        def assemble(batch_df: DataFrame, batch_id: int) -> None:
            # a doc survives iff NO band row is known; its text rides
            # the band_idx=0 row. batch_id-scoped overwrite = the
            # parquet engine's idempotent-replay recipe.
            surv = (
                batch_df.groupBy("doc_id")
                .agg(
                    F.max(F.when(F.col("known"), 1).otherwise(0)).alias("_k"),
                    F.max("text").alias("text"),
                    F.max("fp").alias("fp"),
                )
                .filter(F.col("_k") == 0)
                .select("doc_id", "text", "fp")
            )
            surv.write.mode("overwrite").parquet(
                os.path.join(self.corpus_dir, f"batch_id={batch_id}")
            )

        # null-text docs skip banding: union their rows in with a known
        # verdict of False via a zero-band marker row
        marked_null = nulltext.select(
            "doc_id",
            "text",
            "fp",
            F.lit(0).alias("band_idx"),
            F.lit(False).alias("known"),
        )
        return (
            verdicts.unionByName(marked_null)
            .writeStream.foreachBatch(assemble)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(**trig)
            .start()
        )

    def attach(
        self,
        doc_stream: DataFrame,
        checkpoint_root: str,
        trigger: dict | None = None,
        output_files_per_batch: int | None = None,
        fuzzy_max_files_per_trigger: int | None = None,
    ) -> tuple[StreamingQuery, StreamingQuery]:
        qa = self.attach_exact(
            doc_stream,
            os.path.join(checkpoint_root, "exact"),
            trigger,
            output_files_per_batch,
        )
        qb = self.attach_fuzzy(
            os.path.join(checkpoint_root, "fuzzy"),
            trigger,
            fuzzy_max_files_per_trigger,
        )
        return qa, qb

    def corpus(self) -> DataFrame:
        return self.spark.read.option(
            "basePath", self.corpus_dir
        ).parquet(self.corpus_dir).drop("batch_id")

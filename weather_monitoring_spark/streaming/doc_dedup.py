"""Streaming document deduplication — the LLM-ops x streaming
intersection: an unbounded stream of documents deduplicated against
everything seen so far, exact + fuzzy.

Design (foreachBatch, like every stateful sink in this engine):

1. **exact**: drop batch rows whose content hash already exists in the
   persisted fingerprint store (probe join), and batch-internal duplicates
   (keep min id per hash).
2. **fuzzy**: MinHash band hashes of the remaining rows are probed
   against the persisted band index — a candidate band collision marks
   the doc as a near-dup of the existing corpus and it is dropped — AND
   self-joined within the batch (keep the min doc_id of each colliding
   band group), so two near-dup documents arriving in the same
   micro-batch don't both survive. (Band keys are 60-bit BIGINTs since
   store format 2, so the per-pair band-hash false-positive rate is
   ~1-in-2^60 — still negligible; false negatives follow the LSH
   curve, tunable via K/bands in operators/dedup.py.)
3. survivors + their fingerprints/band hashes land in per-batch DELTA
   directories with overwrite semantics — the replay of a partially
   written batch overwrites its own directories instead of appending
   next to them, so corpus/fp/band stay consistent with NO ordering
   requirement between the three writes.

Store layout (r13 — the LSM shape the r12 verdict asked for; the
previous layout grew one directory per micro-batch forever — 8,640/day
at a 10 s trigger — and sort-merge anti-joins re-shuffled the whole
unbucketed store every batch):

    <store>/<name>/delta/batch_id=N/   per-batch survivor deltas
    <store>/<name>/base/gen=G/         compacted base generation
    <store>/meta.json                  {last_batch_id, base_through, format}

- **Reads** are an explicit path list: the base generation plus the
  delta directories in ``(base_through, current_batch)`` — never a
  recursive root listing, so a crashed attempt's partial directories
  for the CURRENT batch are invisible to its own retry by construction.
- **Probe joins, not shuffle joins.** The store side is the unbounded
  leg; it must never cross an Exchange. Both membership probes run as
  ``store LEFT SEMI broadcast(batch keys)`` (a linear, in-place scan of
  the store that ships only the micro-batch's keys to it), and the
  small hit set broadcasts back for the batch-side anti join. Per-batch
  shuffle volume is therefore O(batch), independent of corpus size; the
  residual per-batch cost is one sequential store scan, which is the
  honest price of exact-against-all-history dedup on immutable columnar
  storage (a point-lookup KV store is the alternative trade, not a
  free win). Micro-batches are assumed executor-memory-small (bound
  them at the source: maxOffsetsPerTrigger / maxFilesPerTrigger).
- **Compaction** every ``compact_every`` applied batches folds the
  accumulated deltas into a new SEALED RUN, repartitioned BY THE PROBE
  KEY into ``n_buckets`` hash-clustered, key-sorted files: bounded file
  count (the probe scan opens ~n_buckets files per run, not 3 x
  batches), and row-group min/max on the sorted key serves selective
  point lookups. Runs are **size-tiered** (the LSM answer to the
  rewrite-the-world trap): whenever more than ``max_runs`` runs exist,
  the two smallest merge into one — so read fan-in is bounded at
  ``max_runs`` runs + ``compact_every`` deltas, while total rewrite
  work amortizes to O(n log n) instead of the O(n^2 / compact_every)
  a single always-rewritten base generation costs (measured: the
  single-generation form's compaction spike grew linearly to 70 s by
  1M accumulated docs). Each run/merge writes to its own deterministic
  ``gen=...`` directory, the meta (which lists the live runs) flips
  atomically afterwards (os.replace), and only then are superseded
  runs and folded deltas swept — a crash at any point leaves either
  the old consistent view (meta unflipped; half-written runs are
  overwritten deterministically on retry) or the new one (leftover
  garbage is swept later, never read because reads are meta-directed).

The meta file's ``last_batch_id`` is only a fast-path skip; idempotency
comes from deterministic overwrite of per-batch delta directories.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from weather_monitoring_spark.operators.dedup import LSH_BANDS, minhash_signatures

#: Persisted-store format version. 3 = r13 LSM layout (delta/ + base/
#: generations, meta-directed reads); 2 = r7-r12 flat batch_id=N
#: directories under each store root; 1 (or absent) = pre-r7 32-char
#: md5 hex band keys. A store written under one format must not be read
#: under another — a format-3 reader would see none of a format-2
#: store's delta directories and silently let every seen document back
#: in — so construction refuses a mismatched store with a clear error
#: instead of degrading.
STORE_FORMAT = 3

#: Fold accumulated deltas into a new sealed run once this many batches
#: have accumulated since the last compaction.
COMPACT_EVERY = 16

#: Hash-clustered files per sealed run (per store).
STORE_BUCKETS = 32

#: Size-tier bound: merge the two smallest runs whenever more than this
#: many exist. Read fan-in stays <= MAX_RUNS runs + compact_every deltas.
MAX_RUNS = 8


class StreamingDocDedup:
    def __init__(
        self,
        spark: SparkSession,
        store_dir: str,
        compact_every: int = COMPACT_EVERY,
        n_buckets: int = STORE_BUCKETS,
        max_runs: int = MAX_RUNS,
    ) -> None:
        self.spark = spark
        self.corpus_dir = os.path.join(store_dir, "corpus")
        self.fp_dir = os.path.join(store_dir, "fingerprints")
        self.bands_dir = os.path.join(store_dir, "bands")
        self._meta = os.path.join(store_dir, "meta.json")
        self.compact_every = compact_every
        self.n_buckets = n_buckets
        self.max_runs = max_runs
        #: probe/cluster key per store — compaction repartitions on it
        self._cluster_key = {
            self.fp_dir: "fp",
            self.bands_dir: "bh",
            self.corpus_dir: "doc_id",
        }
        os.makedirs(store_dir, exist_ok=True)
        if os.path.exists(self._meta):
            fmt = self._load_meta().get("format", 1)
            if fmt != STORE_FORMAT:
                raise ValueError(
                    f"StreamingDocDedup store at {store_dir} was written "
                    f"with store format {fmt}; this build reads/writes "
                    f"format {STORE_FORMAT} (LSM delta/base layout, 60-bit "
                    "BIGINT band keys). Rebuild the store by replaying the "
                    "corpus through a fresh store_dir, or run the matching "
                    "engine version against it."
                )

    # ------------------------------ meta ------------------------------

    def _load_meta(self) -> dict:
        if not os.path.exists(self._meta):
            return {}
        with open(self._meta) as f:
            return json.load(f)

    def _last_applied(self) -> int:
        return self._load_meta().get("last_batch_id", -1)

    def _base_through(self) -> int:
        return self._load_meta().get("base_through", -1)

    def _runs(self) -> list[dict]:
        """Live sealed runs, each ``{"gen": <str>, "rows": <int>}`` —
        the meta's run list IS the authoritative read set."""
        return self._load_meta().get("runs", [])

    # ----------------------------- layout -----------------------------

    def _delta_dir(self, root: str, batch_id: int) -> str:
        return os.path.join(root, "delta", f"batch_id={batch_id}")

    def _gen_dir(self, root: str, gen) -> str:
        return os.path.join(root, "base", f"gen={gen}")

    def _delta_ids(self, root: str, lo: int, hi: int) -> list[int]:
        """Delta batch ids in (lo, hi) — committed after the base
        generation, before the batch being processed."""
        d = os.path.join(root, "delta")
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if name.startswith("batch_id="):
                n = int(name.split("=", 1)[1])
                if lo < n < hi:
                    out.append(n)
        return sorted(out)

    def _read_store(self, root: str, batch_id: int) -> DataFrame | None:
        """Store contents committed by earlier batches only: the meta's
        sealed runs plus delta dirs in (base_through, batch_id) — an
        explicit path list, so a crashed attempt of THIS batch (or a
        half-written run the meta never adopted) is invisible."""
        bt = self._base_through()
        paths = [self._gen_dir(root, r["gen"]) for r in self._runs()]
        paths += [
            self._delta_dir(root, n)
            for n in self._delta_ids(root, bt, batch_id)
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def corpus(self) -> DataFrame:
        df = self._read_store(self.corpus_dir, 1 << 62)
        if df is None:
            raise FileNotFoundError(
                f"StreamingDocDedup corpus store is empty: {self.corpus_dir}"
            )
        return df

    # --------------------------- processing ---------------------------

    @staticmethod
    def _drop_seen(batch: DataFrame, store: DataFrame | None, keys: list[str]) -> DataFrame:
        """Batch rows whose key tuple is absent from the store, computed
        in probe direction: the unbounded store scans IN PLACE against a
        broadcast of the micro-batch's keys, and only the (small) hit
        set broadcasts back for the batch-side anti join. Neither join
        shuffles the store — the previous sort-merge anti join
        re-exchanged the whole store every 10 s trigger. No distinct on
        either leg: the key is UNIQUE in the store by construction
        (only survivors write fingerprints), so the semi-join output is
        already duplicate-free, and the probe broadcast tolerates batch
        dups (the join hash table dedups them) — each distinct would
        cost the plan's only shuffle Exchange (pinned by test)."""
        if store is None:
            return batch
        probe = batch.select(*keys)
        hits = store.join(F.broadcast(probe), keys, "left_semi").select(*keys)
        return batch.join(F.broadcast(hits), keys, "left_anti")

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
        fresh = self._drop_seen(
            fresh, self._read_store(self.fp_dir, batch_id), ["fp"]
        )

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
        # 2b. vs the persisted index: any band collision -> near-dup of
        # the existing corpus -> drop. Probe direction again: collided
        # band keys flow store->batch as a broadcast, then the matched
        # doc_ids anti-join the batch.
        store_bands = self._read_store(self.bands_dir, batch_id)
        if store_bands is not None:
            bkeys = bands.select("band_idx", "bh").distinct()
            hit_keys = (
                store_bands.join(F.broadcast(bkeys), ["band_idx", "bh"], "left_semi")
                .select("band_idx", "bh")
                .distinct()
            )
            neardup_ids = (
                bands.join(F.broadcast(hit_keys), ["band_idx", "bh"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            fresh = fresh.join(F.broadcast(neardup_ids), "doc_id", "left_anti")

        # 3. write survivors + index entries into this batch's delta
        # directories with OVERWRITE semantics: a replay of a partially
        # written batch overwrites its own directories, so the three
        # stores stay mutually consistent with no ordering requirement
        # between the writes. The survivor set MUST have its lineage
        # truncated first: the plans above read the fp/band stores
        # lazily, and writing under those roots auto-invalidates
        # dependent caches (refreshByPath), so a merely-cached plan
        # re-evaluated later could see the batch's own fingerprints and
        # filter out its own survivors. localCheckpoint pins the rows.
        fresh = fresh.localCheckpoint(eager=True)
        # Survivor band rows come from the ALREADY-materialized batch
        # band table by a semi join (survivors are a subset of the
        # exact-surviving docs it covers) — re-running the Arrow MinHash
        # pass here doubled the most expensive per-batch stage.
        survivor_bands = bands.join(
            fresh.select("doc_id"), "doc_id", "left_semi"
        )
        fresh.drop("fp").write.mode("overwrite").parquet(
            self._delta_dir(self.corpus_dir, batch_id)
        )
        fresh.select("fp").write.mode("overwrite").parquet(
            self._delta_dir(self.fp_dir, batch_id)
        )
        survivor_bands.write.mode("overwrite").parquet(
            self._delta_dir(self.bands_dir, batch_id)
        )

        # 4. compact once enough deltas accumulated, then flip the meta.
        base_through = self._base_through()
        compacted = batch_id - base_through >= self.compact_every
        runs = self._runs()
        if compacted:
            runs = self._compact(batch_id)
            base_through = batch_id
        with open(self._meta + ".tmp", "w") as f:
            json.dump(
                {
                    "last_batch_id": batch_id,
                    "base_through": base_through,
                    "runs": runs,
                    "format": STORE_FORMAT,
                },
                f,
            )
        os.replace(self._meta + ".tmp", self._meta)
        if compacted:
            self._sweep({r["gen"] for r in runs}, batch_id)

    # --------------------------- compaction ---------------------------

    def _write_run(self, gen: str, src_paths: dict[str, list[str]]) -> dict:
        """Seal ``src_paths[root]`` into run ``gen`` for every store:
        n_buckets hash-clustered files, sorted by the probe key within
        each file (row-group min/max for point lookups). Deterministic
        overwrite — a crashed attempt's retry rewrites the same dirs.
        Returns the run descriptor (rows = fingerprint rows, the
        document count — corpus matches it, bands are LSH_BANDS x)."""
        for root, key in self._cluster_key.items():
            paths = src_paths[root]
            (
                self.spark.read.parquet(*paths)
                .repartition(self.n_buckets, F.col(key))
                .sortWithinPartitions(key)
                .write.mode("overwrite")
                .parquet(self._gen_dir(root, gen))
            )
        rows = self.spark.read.parquet(
            self._gen_dir(self.fp_dir, gen)
        ).count()  # parquet footer count — no data scan
        return {"gen": gen, "rows": rows}

    def _compact(self, batch_id: int) -> list[dict]:
        """Fold every uncompacted delta into a new sealed run, then
        size-tier: merge the two smallest runs while more than
        ``max_runs`` exist. Runs BEFORE the meta flip; every run/merge
        directory name is a pure function of (batch_id, merge ordinal)
        so a crashed attempt's retry replays the identical plan over
        the identical (still unswept) inputs. Returns the new live-run
        list for the meta."""
        bt = self._base_through()
        runs = list(self._runs())
        fold = self._write_run(
            str(batch_id),
            {
                root: [
                    self._delta_dir(root, n)
                    for n in self._delta_ids(root, bt, batch_id + 1)
                ]
                for root in self._cluster_key
            },
        )
        runs.append(fold)
        merge_ord = 0
        while len(runs) > self.max_runs:
            runs.sort(key=lambda r: r["rows"])
            a, b = runs[0], runs[1]
            merged = self._write_run(
                f"{batch_id}m{merge_ord}",
                {
                    root: [self._gen_dir(root, a["gen"]), self._gen_dir(root, b["gen"])]
                    for root in self._cluster_key
                },
            )
            runs = runs[2:] + [merged]
            merge_ord += 1
        return runs

    def _sweep(self, live_gens: set, through_batch: int) -> None:
        """Post-flip cleanup: run directories the meta no longer lists
        and folded deltas. Pure garbage collection — reads are
        meta-directed, so anything swept here is already unreachable; a
        crash mid-sweep just leaves work for the next sweep."""
        live = {f"gen={g}" for g in live_gens}
        for root in self._cluster_key:
            base_root = os.path.join(root, "base")
            if os.path.isdir(base_root):
                for name in os.listdir(base_root):
                    if name not in live:
                        shutil.rmtree(
                            os.path.join(base_root, name), ignore_errors=True
                        )
            delta_root = os.path.join(root, "delta")
            if os.path.isdir(delta_root):
                for name in os.listdir(delta_root):
                    if (
                        name.startswith("batch_id=")
                        and int(name.split("=", 1)[1]) <= through_batch
                    ):
                        shutil.rmtree(
                            os.path.join(delta_root, name), ignore_errors=True
                        )

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

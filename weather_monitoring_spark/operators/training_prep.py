"""Training-set preparation operators: token-budget shard packing and
benchmark decontamination.

Both are late-pipeline steps of an LLM data pipeline (after dedup /
curation, before the data loader):

- **shard packing**: assign documents, in a deterministic global order,
  to contiguous shards of ~``budget`` tokens each. The hard part at scale
  is the global running total — a bare ``Window.orderBy`` (no partition
  key) collapses the corpus onto ONE task. ``distributed_cumsum`` is the
  scale-correct formulation: range-repartition on the order key, local
  window cumsums per partition, then add broadcast per-partition offsets
  (one row per partition crosses the driver, never data).
- **decontamination**: flag training documents that share >= k word
  3-grams with a held-out benchmark set. Contamination is measured
  against the UNION of benchmark shingles (one distinct set), so the
  join is train-shingles x shingle-set — an equi-join whose cost follows
  shingle overlap, never |train| x |benchmark| pairs.

Reference parity: the reference has no training-prep surface (its corpus
ops end at the ES index — ``ParquetToElasticsearch.java``); these extend
the engine per the builder brief's LLM-pipeline scope, sharing the
engine-portable text primitives of ``functions/text.py`` so both are
fully DuckDB-oracle-checkable.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import shingles_expr, tokens_expr

#: A token counter maps a text column name to a BIGINT count Column.
#: The default (whitespace-class tokens, pure codegen) is what every
#: oracle-checked query budget uses; pass
#: ``operators.tokenize.bpe_token_counter()`` for tokenizer-faithful
#: budgets (Arrow-batched BPE — counts what a trainer's tokenizer
#: counts, at the cost of one Python pass over the text).
TokenCounter = Callable[[str], Column]


def whitespace_token_counter() -> TokenCounter:
    """The default counter: ``size(tokens_expr(c))`` as BIGINT."""
    return lambda text_col: F.size(tokens_expr(text_col)).cast("long")

#: Default shard size for pack_token_budget, in tokens. A doc is assigned
#: by the shard its first token falls in, so true shard totals vary by up
#: to one document length around the budget — the standard contiguous
#: (non-bin-packing) formulation, which keeps assignment a pure function
#: of the running total.
PACK_TOKEN_BUDGET = 20_000

#: Minimum shared distinct shingles for a training doc to be flagged.
CONTAMINATION_MIN_SHARED = 3

#: Defaults for chunk_documents: context-window chunks of CHUNK_TOKENS
#: tokens, consecutive chunks sharing CHUNK_OVERLAP tokens.
CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8


def distributed_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum",
    n_partitions: int | None = None,
    reliable_pin: str | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order_col`` order, without
    ever sorting the dataset on a single task.

    Plan shape: ``repartitionByRange(order_col)`` gives partitions that
    are themselves globally ordered (partition i holds strictly smaller
    keys than partition i+1), so a partition-LOCAL window cumsum plus the
    exclusive sum of the preceding partitions' totals equals the global
    cumsum. The per-partition totals are a ``groupBy`` over at most
    ``n_partitions`` rows; their own running sum happens on that tiny
    frame and is broadcast back. Rows shuffle once (the range exchange);
    the sort is per-partition; nothing quadratic, nothing single-task.

    The result is independent of where the range boundaries land —
    offsets correct the partials for any boundary placement — PROVIDED
    the offsets and the row-level legs see the SAME boundaries. That
    consistency is not free: Spark's RangePartitioner seeds its
    boundary sampling with the RDD id, so two physical instantiations
    of the same repartitionByRange (the offsets leg and the join leg,
    when exchange reuse does not fire; or a manifest job re-running the
    DAG a write job already ran) can land DIFFERENT boundaries — with
    per-partition offsets keyed by ``_pid``, mismatched boundaries
    silently corrupt the running total (caught as manifest/file
    disagreement in the shard writer at local[32]). The post-exchange
    frame is therefore pinned with a lazy ``localCheckpoint``: every
    consumer — offsets, join, and any later action — reads the one
    materialized partitioning. The pinned frame is the NARROW
    (order, value) projection, never documents, so the cost stays a
    few tens of bytes per row at any corpus size.

    Fault-tolerance tradeoff (cluster scale): ``localCheckpoint`` (the
    default pin) stores its blocks on executors only — it is NOT fault
    tolerant, and Spark advises against it under dynamic allocation.
    Losing an executor after materialization fails the job (correctly —
    a recompute could land different boundaries). ``reliable_pin`` is
    the cluster-scale alternative: pass a storage path (HDFS/S3/local
    dir) and the pinned frame (``df``'s columns + ``_pid`` — every
    caller here passes the narrow (order, value) projection, a few tens
    of bytes per row, never documents) is written there as parquet and
    re-read, making the boundary-consistent partitioning durably
    replayable across executor loss. The re-read preserves ``_pid`` as
    a column (not a physical partitioning), which is all correctness
    needs: every leg groups/joins BY the recorded ``_pid``, so where
    the rows physically sit no longer matters. At local[32] and for
    bounded jobs the executor-block pin is the right cost.

    ``order_col`` must be unique (it is a key in every caller here).
    """
    n_parts = n_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    part = df.repartitionByRange(int(n_parts), F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    if reliable_pin is not None:
        part.write.mode("overwrite").parquet(reliable_pin)
        part = df.sparkSession.read.parquet(reliable_pin)
    else:
        part = part.localCheckpoint(eager=False)
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_local", F.sum(value_col).over(local_w).cast("long"))
    totals = part.groupBy("_pid").agg(F.sum(value_col).cast("long").alias("_tot"))
    # Running sum over <= n_partitions rows: the single-partition window
    # is fine HERE because its input is one row per partition, not data.
    off_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "_pid", (F.sum("_tot").over(off_w) - F.col("_tot")).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_pid", "_local", "_off")
    )


def pack_token_budget(
    docs: DataFrame,
    budget: int = PACK_TOKEN_BUDGET,
    id_col: str = "doc_id",
    text_col: str = "text",
    shuffle: bool = False,
    token_counter: TokenCounter | None = None,
    reliable_pin: str | None = None,
) -> DataFrame:
    """Assign documents to contiguous token-budget shards:
    ``shard_id = (cum_tokens - n_tokens) DIV budget`` — i.e. the shard
    containing the document's first token. Returns
    (doc_id, n_tokens, cum_tokens, shard_id), all BIGINT for cross-engine
    type stability.

    ``shuffle=True`` packs in ``md5(id)`` order instead of id order — the
    standard deterministic pre-shuffle so shards don't inherit crawl/source
    locality (adjacent ids are usually correlated documents). Same running-
    total machinery; the order key is just content-addressed.

    ``token_counter`` selects the budget denomination (see
    :data:`TokenCounter`): whitespace tokens by default (oracle-checkable
    codegen), or ``tokenize.bpe_token_counter()`` so shard budgets count
    the tokens the training consumer will actually count."""
    counter = token_counter or whitespace_token_counter()
    counted = docs.select(
        F.col(id_col),
        counter(text_col).alias("n_tokens"),
    )
    order_col = id_col
    if shuffle:
        counted = counted.withColumn("_ord", F.md5(F.col(id_col).cast("string")))
        order_col = "_ord"
    with_cum = distributed_cumsum(counted, order_col, "n_tokens",
                                  out_col="cum_tokens", reliable_pin=reliable_pin)
    return with_cum.select(
        id_col,
        "n_tokens",
        "cum_tokens",
        F.expr(f"CAST((cum_tokens - n_tokens) DIV {int(budget)} AS BIGINT)").alias(
            "shard_id"
        ),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    step that turns a curated corpus into fixed-context training samples.
    Returns (doc_id, chunk_idx, chunk_start, n_tokens, chunk_text);
    chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap, and the last chunk is the first one
    reaching the document's end (no trailing chunk that adds no new
    tokens). Empty documents produce no chunks.

    Scale shape: chunking is a pure per-row projection — tokenize,
    ``sequence`` over the chunk count, ``posexplode``, ``slice`` — all
    inside the scan's whole-stage codegen. No shuffle at any corpus size;
    the row multiplication happens map-side exactly where the data sits,
    which is what makes this safe to run inline before `pack_token_budget`
    or `write_training_shards` on the exploded chunks."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    tk = docs.select(
        F.col(id_col), tokens_expr(text_col).alias("_tk")
    ).withColumn("_n", F.size("_tk").cast("long"))
    # Chunk count: 1 if the doc fits one window, else 1 + ceil((n - chunk)/stride).
    n_chunks = F.expr(
        f"CASE WHEN _n <= {chunk_tokens} THEN CAST(1 AS BIGINT) "
        f"ELSE 1 + (_n - {chunk_tokens} + {stride} - 1) DIV {stride} END"
    )
    return (
        tk.filter(F.col("_n") > 0)
        .withColumn("_nc", n_chunks)
        .select(
            F.col(id_col),
            F.col("_tk"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, CAST(_nc AS INT) - 1),"
                    f" i -> CAST(i * {stride} AS BIGINT))"
                )
            ).alias("chunk_idx", "chunk_start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("chunk_start"),
            F.expr(
                f"CAST(size(slice(_tk, CAST(chunk_start + 1 AS INT), {chunk_tokens})) AS BIGINT)"
            ).alias("n_tokens"),
            F.expr(
                f"concat_ws(' ', slice(_tk, CAST(chunk_start + 1 AS INT), {chunk_tokens}))"
            ).alias("chunk_text"),
        )
    )


def benchmark_shingles(
    benchmark: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The benchmark side of ``contamination_flags`` as a standalone
    one-column (``s``) table: the distinct word 3-grams of the
    evaluation set. A benchmark is CLOSED and static, so compute this
    once and persist/reuse it — the streaming decontamination gate
    (``streaming.curation_stream``) flags every micro-batch against the
    same set, and re-deriving it per batch would be pure waste."""
    return (
        benchmark.withColumn("_tk", tokens_expr(text_col))
        .select(F.explode(shingles_expr("_tk")).alias("s"))
        .distinct()
    )


def contamination_flags(
    train: DataFrame,
    benchmark: DataFrame | None = None,
    min_shared: int = CONTAMINATION_MIN_SHARED,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Per training document: how many of its distinct word 3-grams occur
    anywhere in the benchmark set, and whether that clears ``min_shared``.
    Returns (doc_id, n_shared, contaminated) for EVERY train doc
    (zero-filled — the common case must be an explicit clean verdict).

    Pass either ``benchmark`` (raw eval documents) or ``shingles`` (a
    precomputed ``benchmark_shingles`` table — the repeated-call path).

    The benchmark collapses to one distinct shingle set before the join,
    so cost scales with shingle-level overlap; at 100 TB the benchmark
    side is millions of shingles at most — broadcastable, making the hit
    count a map-side join against an in-memory set."""
    if (benchmark is None) == (shingles is None):
        raise ValueError(
            "contamination_flags: pass exactly one of benchmark= or "
            "shingles="
        )
    bench_sh = (
        benchmark_shingles(benchmark, text_col)
        if benchmark is not None
        else shingles.select("s")
    )
    train_sh = (
        train.withColumn("_tk", tokens_expr(text_col))
        .select(F.col(id_col).alias("id"), F.explode(shingles_expr("_tk")).alias("s"))
    )
    hits = (
        train_sh.join(bench_sh, "s")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        train.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_shared"), F.lit(0).cast("long")).alias("n_shared"),
            (F.coalesce(F.col("n_shared"), F.lit(0)) >= min_shared).alias(
                "contaminated"
            ),
        )
    )


def oversample_sources(
    docs: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Domain-mixing oversampling: emit ``weight`` copies of every row
    (weight an integer column expression; rows with weight < 1 drop).
    Returns (id, source, weight, copy 1..weight) — the copy index keeps
    replicas distinct for downstream content-addressed shuffles
    (``pack_token_budget(shuffle=True)`` would otherwise collapse them).

    Deterministic by construction (no RNG): integer repeat factors model
    the integer part of a mixture weight; the fractional part composes
    with the hash-threshold sampling of ``q60``/``q59``. Scale shape:
    ``explode(sequence(...))`` multiplies rows map-side inside the scan
    projection — no shuffle, no skew beyond the weights themselves."""
    base = docs.select(
        F.col(id_col),
        F.col(source_col),
        weight.cast("long").alias("weight"),
    ).filter(F.col("weight") >= 1)
    return base.select(
        id_col,
        source_col,
        "weight",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("weight"))).alias("copy"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-group subsampling: keep at most ``k`` rows per
    group, chosen by content-addressed order (md5 of the id) — the
    "cap every domain at N documents" mixture-control step. Returns the
    input columns plus ``group_rank`` (1..k within the group).

    Content-addressed ordering makes the kept set a pure function of the
    ids — stable across runs, partitionings, and engines (no RNG, no
    arrival order). Scale shape: one hash-partitioned window per group;
    with a heavy-hitter group the window sort is the cost, bounded by
    WindowGroupLimit pushing the rank filter below the exchange (only
    per-partition top-k rows shuffle)."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("group_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("group_rank") <= k)
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    budget: int = PACK_TOKEN_BUDGET,
    id_col: str = "doc_id",
    text_col: str = "text",
    shuffle: bool = False,
    file_format: str = "parquet",
    token_counter: TokenCounter | None = None,
    emit_token_ids: bool = False,
) -> DataFrame:
    """Materialize the packed corpus as ``shard_id=N/`` partitions
    (``file_format`` "parquet" or "json" — JSONL is what most training
    loaders consume) plus a deterministic manifest, and return the
    manifest.

    ``emit_token_ids=True`` adds an ``input_ids ARRAY<BIGINT>`` column
    (``tokenize.bpe_encode_expr`` — one Arrow pass riding the same write
    job), making the shards loader-ready without a re-tokenization pass.
    Pair it with ``token_counter=bpe_token_counter()`` so the budgeted
    ``n_tokens`` equals ``size(input_ids)`` row-for-row (pinned by
    tests/test_bpe.py::test_shards_with_token_ids).

    The write repartitions BY shard (each shard's documents land in one
    task => one file per shard, no small-files spray) and sorts within
    the shard by the packing order, so a data loader streaming one shard
    reads documents in their global packing order.

    The manifest (written to ``<out_dir>/_manifest``) carries per shard:
    row count, token total, and a content checksum (sum of md5-derived
    64-bit doc hashes mod 2^61 — commutative, so it is independent of
    row order/partitioning and re-derivable from the written files by
    any engine). At 100 TB the manifest is the cheap integrity handle:
    re-run the groupBy over the written shards and diff two tiny tables.
    """
    from weather_monitoring_spark.functions.text import h32_sql

    packed = pack_token_budget(docs, budget=budget, id_col=id_col,
                               text_col=text_col, shuffle=shuffle,
                               token_counter=token_counter)
    data = docs.join(packed.select(id_col, "n_tokens", "cum_tokens", "shard_id"), id_col)
    if emit_token_ids:
        from weather_monitoring_spark.operators.tokenize import bpe_encode_expr

        data = data.withColumn("input_ids", bpe_encode_expr(text_col))
    (
        data.repartition(F.col("shard_id"))
        .sortWithinPartitions("cum_tokens")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .format(file_format)
        .save(out_dir)
    )
    manifest = (
        data.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            (F.sum(F.expr(h32_sql("shard", text_col))) % F.lit(2**61)).cast("long").alias("checksum"),
        )
    )
    manifest.repartition(1).write.mode("overwrite").parquet(out_dir + "/_manifest")
    return manifest


def verify_training_shards(
    spark, out_dir: str, text_col: str = "text", file_format: str = "parquet",
    token_counter: TokenCounter | None = None,
) -> DataFrame:
    """Re-derive the manifest from the written shard files and diff it
    against the stored one. Returns the mismatching rows (empty == the
    shards on disk are exactly what the packer wrote). ``token_counter``
    must match the one the shards were written with."""
    from weather_monitoring_spark.functions.text import h32_sql

    counter = token_counter or whitespace_token_counter()
    written = spark.read.format(file_format).load(out_dir)
    derived = (
        written.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(counter(text_col)).cast("long").alias("n_tokens"),
            (F.sum(F.expr(h32_sql("shard", text_col))) % F.lit(2**61)).cast("long").alias("checksum"),
        )
    )
    stored = spark.read.parquet(out_dir + "/_manifest")
    return derived.exceptAll(stored).unionByName(stored.exceptAll(derived))


def sample_exact_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic exactly-k sample: the k smallest md5(id) values.
    ``sample(fraction)`` gives a binomial-sized result and depends on
    partitioning; hash order gives a uniform-looking, RNG-free, exactly
    sized pick that is a pure function of the ids — the same rows on any
    engine, any partitioning, any run. Plans as TakeOrderedAndProject
    (per-partition heaps of k), so nothing global-sorts."""
    return (
        df.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)).limit(k)
    )


def trim_distribution_tails(
    docs: DataFrame,
    feature,
    lo_pct: int = 5,
    hi_pct: int = 95,
    id_col: str = "doc_id",
) -> DataFrame:
    """Distribution-tail gate (the C4/Gopher "drop the shortest and
    longest" curation step): keep rows whose integer ``feature`` lies
    between the lo_pct- and hi_pct-rank values. Returns the input
    columns plus (f, v_lo, v_hi) so the gate is auditable.

    Bound definition (integer-exact, no interpolation): v_p = the
    smallest feature value whose cumulative count reaches
    ceil(n * p / 100) — the lower-value quantile. Both bounds and the
    comparison are BIGINT arithmetic, bit-stable on any engine.

    Scale shape: the corpus aggregates once into a (value, count)
    histogram — bounded by the feature's value cardinality (document
    lengths, not documents), so the cumulative window over it runs on a
    tiny single-partition frame by construction (the same argument as
    distributed_cumsum's offsets table). The one-row bounds frame
    broadcast-cross-joins back; the corpus itself shuffles zero times
    beyond the histogram's partial aggregation."""
    feat = docs.withColumn("f", feature.cast("long"))
    hist = feat.groupBy("f").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    w = Window.orderBy("f").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_tot = Window.orderBy("f").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # The corpus total comes from the histogram's own counts (a second
    # tiny window over the same value-cardinality frame), not from an
    # eager feat.count() action — which at 100 TB would be a full extra
    # corpus pass before the gate runs. Rank test is rewritten
    # multiplicatively: for integer _cum, _cum >= ceil(n*p/100)
    # <=> 100*_cum >= n*p, so the bound stays BIGINT-exact.
    cum = hist.select(
        "f",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(w_tot).alias("_n"),
    )
    bounds = cum.agg(
        F.min(
            F.when(F.col("_cum") * 100 >= F.col("_n") * lo_pct, F.col("f"))
        ).alias("v_lo"),
        F.min(
            F.when(F.col("_cum") * 100 >= F.col("_n") * hi_pct, F.col("f"))
        ).alias("v_hi"),
    )
    return (
        feat.crossJoin(F.broadcast(bounds))
        .filter((F.col("f") >= F.col("v_lo")) & (F.col("f") <= F.col("v_hi")))
    )


def mixture_weights(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Square-root temperature mixture weights — the alpha-sampling step
    (alpha = 0.5, the multilingual-training default) that turns raw
    per-source token counts into sampling probabilities, up-weighting
    small sources relative to their share:
    ``p_s = sqrt(n_tokens_s) / sum_i sqrt(n_tokens_i)``.

    Returns one row per source: (source, n_docs, n_tokens, w, p,
    boost) where ``w = sqrt(n_tokens)``, ``p`` the sampling probability,
    and ``boost = p / (n_tokens / total_tokens)`` the up/down-weighting
    factor vs proportional sampling (> 1 for small sources).

    Bit-stable cross-engine by construction, which is why alpha is fixed
    at 0.5: ``sqrt`` is a correctly-rounded IEEE op (a general
    ``pow(n, alpha)`` is transcendental and NOT bit-stable), token counts
    are exact BIGINTs, and the two denominators are sequential folds over
    the per-source rows in source order (``array_sort`` + ``aggregate``
    here, ``list(... ORDER BY source)`` + ``list_aggregate`` in the
    oracle) — never a partial-agg double sum, whose combine order is
    partition-dependent.

    Scale shape: the corpus aggregates once into a |sources|-row table;
    everything after (sorted fold, broadcast of the 1-row totals frame,
    final projection) is arithmetic on that tiny frame. The corpus
    itself shuffles only the per-source partial counts."""
    per = (
        docs.select(
            F.col(group_col).alias("source"),
            F.size(tokens_expr(text_col)).cast("long").alias("_toks"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_toks").cast("long").alias("n_tokens"),
        )
        .withColumn("w", F.sqrt(F.col("n_tokens").cast("double")))
    )
    # Deterministic denominators: fold the per-source rows in source
    # order (left fold == DuckDB's list_aggregate over the sorted list).
    totals = per.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "w"))),
            F.lit(0.0),
            lambda acc, x: acc + x["w"],
        ).alias("w_total"),
        F.sum("n_tokens").cast("long").alias("tok_total"),  # BIGINT: order-free
    )
    return per.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "n_tokens",
        "w",
        (F.col("w") / F.col("w_total")).alias("p"),
        (
            (F.col("w") / F.col("w_total"))
            / (
                F.col("n_tokens").cast("double")
                / F.col("tok_total").cast("double")
            )
        ).alias("boost"),
    )


# ---------------- semantic (embedding-axis) decontamination ----------------

SEMANTIC_CONTAM_THRESHOLD = 0.85


#: Bench-size caps for the cross-side GEMM path: the bench matrix ships
#: to every task as a closure, so admission is budgeted in BYTES
#: (rows x dim x 8, the float64 matrix the scorer builds), with a row
#: ceiling on top. r10's row-only cap admitted 100k rows regardless of
#: vector width — ~51 MB at dim 64 but ~800 MB collected to the driver
#: and broadcast at a realistic dim-1024 embedding, exactly the failure
#: the cap exists to prevent (r10 verdict #1). Above either bound,
#: "auto" falls back to the union formulation.
SEMANTIC_CROSS_BENCH_CAP = 100_000
SEMANTIC_CROSS_BENCH_BYTES = 64 << 20


def _semantic_verdicts(
    train_emb: DataFrame, hits: DataFrame | None, id_col: str
) -> DataFrame:
    """THE definition of semantic_decontaminate's output contract —
    (id, contaminated, max_cos, n_bench_hits) for EVERY train row,
    zero-filled clean verdicts — shared by the cross path, the union
    path, and the empty-bench case (``hits=None``), so the bit-equality
    guarantee between methods cannot drift through a schema edit in one
    of them."""
    ids = train_emb.select(id_col)
    if hits is None:
        return ids.select(
            id_col,
            F.lit(False).alias("contaminated"),
            F.lit(None).cast("double").alias("max_cos"),
            F.lit(0).cast("bigint").alias("n_bench_hits"),
        )
    return ids.join(hits, id_col, "left").select(
        id_col,
        F.col("max_cos").isNotNull().alias("contaminated"),
        "max_cos",
        F.coalesce(F.col("n_bench_hits"), F.lit(0)).alias("n_bench_hits"),
    )


def _semantic_cross(
    train_emb: DataFrame,
    bench_rows: list,
    threshold: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Cross-side-only scorer: ONE pass over train with the (tiny) bench
    matrix broadcast as a task closure — GEMM prefilter with the
    guaranteed-recall margin, then the exact sequential-fold re-score on
    the collision-bounded candidates (the cosine_neardup_pairs
    discipline), so results are BIT-EQUAL to the union path. Work is
    O(n_train * n_bench) FLOPs with zero pair-explosion shuffle, vs the
    union self-join's O((n_train + n_bench)^2) block grid — the shape a
    decontamination run actually has (bench << train)."""
    import numpy as np

    from weather_monitoring_spark.operators.similarity import (
        PREFILTER_MARGIN,
        dot_expr,
        norm_expr,
    )

    if not bench_rows:  # empty bench: every train row is explicitly clean
        return _semantic_verdicts(train_emb, None, id_col)
    b_ids = np.asarray([r[0] for r in bench_rows], dtype=np.int64)
    bm = np.asarray([list(r[1]) for r in bench_rows], dtype=np.float64)
    bn = np.sqrt((bm * bm).sum(axis=1))
    thr = threshold - PREFILTER_MARGIN
    # cap the transient score matrix at ~32M cells per chunk
    chunk = max(1, (1 << 25) // max(1, len(b_ids)))

    def find(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            v = np.asarray([list(x) for x in pdf[vec_col]], dtype=np.float64)
            vn = np.sqrt((v * v).sum(axis=1))
            for lo in range(0, len(ids), chunk):
                hi = min(lo + chunk, len(ids))
                with np.errstate(divide="ignore", invalid="ignore"):
                    s = (v[lo:hi] @ bm.T) / np.outer(vn[lo:hi], bn)
                ti, bi = np.nonzero(s >= thr)  # NaN (zero norms) -> False
                if len(ti):
                    yield pd.DataFrame(
                        {id_col: ids[lo:hi][ti], "_bid": b_ids[bi]}
                    )

    cand = train_emb.select(id_col, vec_col).mapInPandas(
        find, f"{id_col} bigint, _bid bigint"
    )
    t = train_emb.select(
        F.col(id_col),
        F.col(vec_col).alias("_tv"),
        norm_expr(vec_col).alias("_tn"),
    )
    b = F.broadcast(
        train_emb.sparkSession.createDataFrame(
            [(int(i), list(map(float, v))) for i, v in bench_rows],
            f"_bid bigint, _bv array<double>",
        ).withColumn("_bn", norm_expr("_bv"))
    )
    hits = (
        cand.join(t, id_col)
        .join(b, "_bid")
        .withColumn(
            "cosine", dot_expr("_tv", "_bv") / (F.col("_tn") * F.col("_bn"))
        )
        .filter(F.col("cosine") >= threshold)
        .groupBy(id_col)
        .agg(
            F.max("cosine").alias("max_cos"),
            F.count("*").cast("bigint").alias("n_bench_hits"),
        )
    )
    return _semantic_verdicts(train_emb, hits, id_col)


def semantic_decontaminate(
    train_emb: DataFrame,
    bench_emb: DataFrame,
    threshold: float = SEMANTIC_CONTAM_THRESHOLD,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """Embedding-axis decontamination — the third axis of the family:
    ``contamination_flags`` is exact n-gram overlap, winnowing gives the
    run-length guarantee, and this flags train documents SEMANTICALLY
    close to an eval item (paraphrased leakage that shares no 3-gram).

    Returns (id, contaminated, max_cos, n_bench_hits) for EVERY train
    row (zero-filled clean verdicts — the contamination_flags contract);
    ``max_cos`` is NULL when nothing cleared ``threshold``.

    ``method`` (r10): ``"auto"`` (default) takes the CROSS-SIDE path
    when bench fits the closure budget — min(SEMANTIC_CROSS_BENCH_CAP
    rows, SEMANTIC_CROSS_BENCH_BYTES as a rows x dim float64 matrix;
    byte-aware since r11 so a wide-embedding bench cannot collect
    hundreds of MB to the driver — admission is decided by two
    vector-free probes before any embedding leaves the cluster): one
    pass over train scoring each batch against the broadcast bench
    matrix — GEMM prefilter with the guaranteed-recall margin, exact
    sequential-fold re-score on the collision-bounded candidates, so
    results are BIT-EQUAL to the union path at O(n_train * n_bench)
    FLOPs instead of the union self-join's O((n_train + n_bench)^2)
    block grid (measured 631 s -> see BASELINE.md at 755k x 64 / 1k
    bench). ``"cross"`` forces it (audit-grade error above the cap);
    any other value ("blocked", ...) runs the original union
    formulation with that value forwarded to ``cosine_neardup_pairs``:
    bench ids map injectively into the NEGATIVE id space, the union
    runs the existing exact machinery, and only cross-side pairs count.

    Train AND bench ids must be non-negative — each checked with one
    narrow min() scan (audit-grade operator; the fit_quality_classifier
    guard precedent): a negative id on either side would alias across
    the sign boundary and silently corrupt the cross-side
    classification."""
    from weather_monitoring_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    lo = train_emb.agg(F.min(id_col).alias("m")).first()["m"]
    if lo is not None and lo < 0:
        raise ValueError(
            f"semantic_decontaminate: train {id_col} must be non-negative "
            f"(min={lo}) — the bench side maps into the negative id space"
        )
    def _bench_guard(blo) -> None:
        # Symmetric guard: a NEGATIVE bench id maps via -id-1 into the
        # non-negative space, would be classified as a TRAIN row by the
        # cross-side filter, and can collide with a real train id —
        # wrong contamination verdicts with no error (and the cross
        # path's id mapping shares the contract). Audit-grade check.
        if blo is not None and blo < 0:
            raise ValueError(
                f"semantic_decontaminate: bench {id_col} must be "
                f"non-negative (min={blo}) — negative ids would alias "
                f"into the train side after the -id-1 mapping"
            )

    if method in ("auto", "cross"):
        # Admission via two VECTOR-FREE probes (r10 advisor: the old
        # single collect shipped up to cap+1 full embedding rows to the
        # driver only to discard them on fallback): one row for the
        # vector width, then an id-only bounded count. Embeddings are
        # collected only once the cross path is certain to run. The
        # byte budget uses the FIRST row's dim as the matrix width —
        # the scorer itself requires rectangular benches. The probes +
        # collect are up to three evaluations of the bench lineage; a
        # caller with an expensive uncached bench should .cache() it —
        # benches are small by definition here (cap = 100k rows/64 MiB),
        # so we do not force a persist on the user's frame.
        d0 = bench_emb.select(F.size(F.col(vec_col)).alias("d")).first()
        if d0 is None:  # empty bench: every train row explicitly clean
            return _semantic_cross(train_emb, [], threshold, id_col, vec_col)
        dim = max(int(d0["d"] or 0), 1)
        row_cap = min(
            SEMANTIC_CROSS_BENCH_CAP, SEMANTIC_CROSS_BENCH_BYTES // (dim * 8)
        )
        n = bench_emb.select(id_col).limit(row_cap + 1).count()
        if n <= row_cap:
            # The collect itself stays LIMIT-bounded (r12 advisor: the
            # probe and the collect are separate jobs, so a
            # non-deterministic or concurrently-growing bench source
            # could hand the unbounded collect more rows than the probe
            # saw — the cap must hold at the moment of collection, not
            # the moment of admission).
            rows = bench_emb.select(id_col, vec_col).limit(row_cap + 1).collect()
            if len(rows) <= row_cap:
                # the full bench is in hand: the min is free — no
                # second frame scan (r10 self-review)
                _bench_guard(min((r[0] for r in rows), default=None))
                return _semantic_cross(
                    train_emb, rows, threshold, id_col, vec_col
                )
            del rows  # bench grew between probe and collect
        if method == "cross":
            raise ValueError(
                f"semantic_decontaminate: bench exceeds the cross-path "
                f"closure cap ({row_cap} rows at dim {dim} = "
                f"min({SEMANTIC_CROSS_BENCH_CAP} rows, "
                f"{SEMANTIC_CROSS_BENCH_BYTES >> 20} MiB as float64)) — "
                f"use method='blocked' (the union formulation) for "
                f"large benches"
            )
        method = "blocked"  # auto fallback: union formulation below
    _bench_guard(bench_emb.agg(F.min(id_col).alias("m")).first()["m"])
    bench = bench_emb.select(
        (-F.col(id_col) - 1).alias(id_col), F.col(vec_col)
    )
    union = train_emb.select(id_col, vec_col).unionAll(bench)
    pairs = cosine_neardup_pairs(
        union, threshold=threshold, id_col=id_col, vec_col=vec_col,
        method=method,
    )
    cross = pairs.filter(
        (F.col("id_a") < 0) != (F.col("id_b") < 0)
    ).select(
        F.when(F.col("id_a") >= 0, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias(id_col),
        "cosine",
    )
    hits = cross.groupBy(id_col).agg(
        F.max("cosine").alias("max_cos"),
        F.count("*").cast("bigint").alias("n_bench_hits"),
    )
    return _semantic_verdicts(train_emb, hits, id_col)

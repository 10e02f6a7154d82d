"""Winnowing fingerprints — windowed rightmost-min selection over k-gram
hashes (the MOSS local fingerprinting algorithm, Schleimer/Wilkerson/
Aiken SIGMOD'03 — public literature).

A different near-dup family from MinHash/SimHash: *position-aware* and
*locally complete*. The winnowing guarantee is that every window of ``w``
consecutive k-gram hashes contributes at least one selected fingerprint,
so any shared run of at least ``w + k - 1`` tokens between two documents
is guaranteed to produce a shared fingerprint — no probabilistic recall
argument needed (MinHash trades exactly that guarantee for a fixed-size
signature). The price is a fingerprint set proportional to document
length (~2/(w+1) of the grams), which is why both families coexist in
real pipelines: winnowing for guaranteed overlap *detection* (plagiarism,
license-text tracing, contamination audits), MinHash for corpus-scale
clustering.

Determinism: gram hashes are the shared md5-derived h32 family
(functions/text.py) and tie-breaks select the RIGHTMOST minimal hash in
the window (the standard density-optimal rule) — no RNG, no engine hash,
fully oracle-checkable.

Scale shape:

- ``winnow_fingerprints`` is pure per-row array algebra (tokens → gram
  hashes → per-window rightmost-min structs → distinct) inside one scan
  projection — ZERO shuffle at any corpus size; the explode emits the
  per-document fingerprint rows a production pipeline would persist as
  its fingerprint index.
- ``winnow_matches`` is the inverted-index join over that table (the
  q32 shape): cost follows fingerprint co-occurrence, never n²; the
  hot-fingerprint guard drops boilerplate fingerprints BEFORE the join
  (df cutoff derived from corpus size, same policy as
  ``dedup.shingle_df_cutoff``).

Reference parity: the reference has no fingerprinting surface; this
extends the engine per the builder brief's LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import h32_sql, tokens_expr
from weather_monitoring_spark.operators.dedup import SHINGLE_DF_FRAC, SHINGLE_DF_MIN

#: Gram length in tokens (noise threshold: shared runs shorter than this
#: are never reported).
WINNOW_K = 4

#: Window of consecutive gram hashes per selection (guarantee threshold:
#: shared runs of >= WINNOW_W + WINNOW_K - 1 tokens always match).
WINNOW_W = 4

#: Report pairs sharing at least this many distinct fingerprints.
WINNOW_MIN_SHARED = 2


def _fps_sql(k: int, w: int) -> tuple[str, str]:
    """Spark SQL: distinct (pos, fp) winnowing selections over ``_tk``.

    ``pos`` is the 1-based token index where the selected gram starts.
    Rightmost-min: with the window slice s = _gh[j .. j+w-1] (1-based),
    the selected in-window offset is w - array_position(reverse(s),
    array_min(s)) + 1, hence global pos = j + w - array_position(...)."""
    gram = h32_sql("wn", f"array_join(slice(_tk, i, {k}), ' ')")
    gh = f"transform(sequence(1, size(_tk) - {k} + 1), i -> {gram})"
    win = f"slice(_gh, j, {w})"
    return (
        f"array_distinct(transform(sequence(1, size(_gh) - {w} + 1), j -> "
        f"struct(CAST(j + {w} - array_position(reverse({win}), "
        f"array_min({win})) AS BIGINT) AS pos, array_min({win}) AS fp)))"
    ), gh


def winnow_fingerprints(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document winnowing fingerprint rows (id, pos, fp), distinct
    per (pos-of-selected-gram, hash). Documents shorter than
    ``k + w - 1`` tokens have no complete window and contribute no rows
    (explicit filter — Spark's ``sequence(1, 0)`` is [1, 0], not [])."""
    fps, gh = _fps_sql(k, w)
    return (
        docs.select(F.col(id_col), tokens_expr(text_col).alias("_tk"))
        .filter(F.size("_tk") >= k + w - 1)
        .select(id_col, F.expr(gh).alias("_gh"))
        .select(id_col, F.explode(F.expr(fps)).alias("_s"))
        .select(id_col, "_s.pos", "_s.fp")
    )


def _distinct_doc_fps(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct (id, fp) pairs with ZERO shuffle.

    Every document is a single input row, so its distinct fingerprint
    set can be computed ROW-LOCALLY (``array_distinct`` over the
    winnowed selections' hashes) and exploded — the result is globally
    distinct per (id, fp) because ``id_col`` is unique per row (the
    corpus id contract). The previous formulation exploded (id, pos,
    fp) and ran a global ``distinct()``: a full-corpus exchange whose
    hash aggregate crossed into disk spill between 2M and 5M docs at
    the 25x probe (r6 verdict finding #2c) — for an operation that
    never needed to leave the row."""
    fps, gh = _fps_sql(k, w)
    fpset = f"array_distinct(transform({fps}, s -> s.fp))"
    return (
        docs.select(F.col(id_col).alias("id"), tokens_expr(text_col).alias("_tk"))
        .filter(F.size("_tk") >= k + w - 1)
        .select("id", F.expr(gh).alias("_gh"))
        .select("id", F.explode(F.expr(fpset)).alias("fp"))
    )


def winnow_matches(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    min_shared: int = WINNOW_MIN_SHARED,
    max_fp_df: int | str | None = "auto",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document pairs sharing winnowed fingerprints:
    (id_a, id_b, n_shared), ``id_a < id_b``, ``n_shared`` = distinct
    shared fingerprint hashes (BIGINT), pairs with >= ``min_shared``.

    ``max_fp_df``: ``"auto"`` derives a hot-fingerprint document-
    frequency cutoff from corpus size (boilerplate guard — one
    license-header fingerprint across 1M docs must not drive a df²
    join), an int pins it, ``None`` disables (oracle cross-checks only).
    """
    # distinct (id, fp) computed row-locally — no global distinct
    # exchange; multiplicity within a doc is irrelevant to matching.
    dfp = _distinct_doc_fps(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    return _match_pairs(docs, dfp, min_shared, max_fp_df)


def _match_pairs(
    docs: DataFrame,
    dfp: DataFrame,
    min_shared: int,
    max_fp_df: int | str | None,
) -> DataFrame:
    if max_fp_df == "auto":
        # Lazy corpus-size-derived cutoff (same shape as
        # dedup._filtered_shingles): the n_docs aggregate is a broadcast
        # 1-row frame inside the job, not an eager docs.count() action —
        # which at 100 TB would be a second full corpus pass. Formula
        # mirrors shingle_df_cutoff() and the oracle's `cut` CTE.
        cut = docs.agg(
            F.greatest(
                F.lit(SHINGLE_DF_MIN).cast("long"),
                F.ceil(F.lit(SHINGLE_DF_FRAC) * F.count(F.lit(1))),
            ).alias("_cut")
        )
        hot = (
            dfp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .crossJoin(F.broadcast(cut))
            .filter(F.col("df") > F.col("_cut"))
        )
        dfp = dfp.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    elif max_fp_df is not None:
        hot = (
            dfp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_fp_df)
        )
        dfp = dfp.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    dfp = dfp.localCheckpoint(eager=False)
    a = dfp.select(F.col("id").alias("id_a"), "fp")
    b = dfp.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def winnow_contamination(
    train: DataFrame,
    bench: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination WITH A GUARANTEE: flag every training
    document sharing winnowed fingerprints with the held-out eval set.
    Returns (id, n_hits, contaminated) for EVERY train document,
    ``n_hits`` = distinct shared fingerprint hashes (BIGINT).

    By the winnowing guarantee, any train document overlapping any eval
    document on a run of >= ``w + k - 1`` tokens MUST be flagged — the
    property an eval-integrity audit actually needs, where the shingle-
    count heuristic (``training_prep.contamination_flags``) only argues
    probabilistically. The price is the length-proportional fingerprint
    index; run the heuristic for routine sweeps, this for the audit.

    Scale shape: both fingerprint extractions are zero-shuffle
    projections; the hit join carries (fp, id) pairs against the
    (typically tiny, broadcast-eligible) eval fingerprint set; the flag
    join returns one row per train doc."""
    # per-doc distinct is row-local (_distinct_doc_fps) — zero shuffle
    tf = _distinct_doc_fps(train, k=k, w=w, id_col=id_col, text_col=text_col)
    bf = (
        winnow_fingerprints(bench, k=k, w=w, id_col=id_col, text_col=text_col)
        .select("fp")
        .distinct()
    )
    hits = (
        tf.join(bf, "fp")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        train.select(F.col(id_col))
        .join(hits, train[id_col] == hits.id, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            F.col("n_hits").isNotNull().alias("contaminated"),
        )
    )


def contamination_spans(
    train: DataFrame,
    bench: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LOCALIZE eval-set contamination: for each flagged training
    document, the token ranges overlapping the eval set —
    (id, span_start, span_end, n_hits), 1-based inclusive gram-start
    coordinates, all BIGINT. The actionable follow-up to
    ``winnow_contamination``'s verdict: these spans are what an audit
    excises (or a span-masking pass removes — compose with
    ``spans.strip_dup_spans``-style masking downstream).

    Precision note: winnowing selects ~2/(w+1) of gram positions, so a
    contiguous shared run surfaces as hit positions spaced <= w apart;
    hits merge while gaps are <= w + k - 1 and each span extends k - 1
    tokens past its last hit. Localization is therefore exact to within
    w tokens at span edges — the guarantee (every >= w+k-1-token
    overlap produces >= 1 hit inside the span) is what matters for the
    audit; edge slack is bounded and documented.

    Scale shape: both fingerprint passes are zero-shuffle projections;
    the hit join ships (fp, id, pos) against the eval fingerprint set;
    the merge windows over per-document hit positions only."""
    tf = winnow_fingerprints(train, k=k, w=w, id_col=id_col, text_col=text_col)
    bf = (
        winnow_fingerprints(bench, k=k, w=w, id_col=id_col, text_col=text_col)
        .select("fp")
        .distinct()
    )
    hits = tf.join(bf, "fp").select(id_col, "pos").distinct()
    ww = Window.partitionBy(id_col).orderBy("pos")
    new_span = F.when(
        F.lag("pos").over(ww).isNull()
        | (F.col("pos") - F.lag("pos").over(ww) > w + k - 1),
        1,
    ).otherwise(0)
    sess = hits.select(id_col, "pos", new_span.alias("_nf")).select(
        id_col,
        "pos",
        F.sum("_nf").over(Window.partitionBy(id_col).orderBy("pos")).alias("_span"),
    )
    return (
        sess.groupBy(id_col, "_span")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k - 1).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_hits"),
        )
        .select(id_col, "span_start", "span_end", "n_hits")
    )


def fingerprint_index(
    docs: DataFrame,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The (fp, id) fingerprint table of a corpus — the persisted
    artifact incremental dedup joins new batches against. In production
    this is written once per corpus snapshot via
    ``storage.bucketing.write_bucketed(index, table, ["fp"])`` and only
    APPENDED to as batches are accepted; extraction itself is the
    zero-shuffle winnow projection — INCLUDING the per-document distinct,
    which is computed row-locally (``_distinct_doc_fps``) so the index
    build has no exchange at all. (The previous global ``distinct()``
    was the 25x probe's third spill row — 101→664 s between 2M and 5M
    docs — for a dedup the row already guaranteed.)"""
    return _distinct_doc_fps(
        docs, k=k, w=w, id_col=id_col, text_col=text_col
    ).select("fp", "id")


#: Batch-fingerprint count above which dedup_against_index stops forcing
#: a broadcast join: ~5e7 (fp bigint, id) rows is roughly a 1 GiB hash
#: relation — past Spark's executor-side broadcast comfort zone. Larger
#: batches fall back to a shuffle join where a fp-bucketed index
#: (storage.bucketing.write_bucketed) still avoids shuffling the history.
BROADCAST_FP_LIMIT = 50_000_000


def dedup_against_index(
    new_docs: DataFrame,
    index: DataFrame,
    min_shared: int = WINNOW_MIN_SHARED,
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int | None = BROADCAST_FP_LIMIT,
) -> DataFrame:
    """Incremental dedup: verdicts for a new batch of documents against
    an EXISTING corpus's fingerprint index (``fingerprint_index``) —
    the daily-crawl-vs-historical-corpus shape, where re-fingerprinting
    or self-joining the whole corpus per batch is exactly what a 100 TB
    pipeline cannot afford. Returns (id, n_hits, is_dup) for EVERY new
    document: ``n_hits`` = distinct fingerprint hashes shared with ANY
    indexed document (BIGINT), ``is_dup`` = n_hits >= min_shared.
    Inherits the winnowing guarantee: a new document overlapping any
    indexed document on >= ``w + k - 1`` consecutive tokens MUST share
    a fingerprint.

    Scale shape — the asymmetry IS the design: the index (TBs, the
    whole history) is scanned in place and NEVER shuffled; the new
    batch's fingerprint set (the small side by construction) ships as a
    broadcast into a map-side SEMI join against the index. Two-step
    semi-join formulation, because ``n_hits`` only needs fingerprint
    EXISTENCE in the index, never per-index-document matches:

    1. ``matched_fps`` = index fps present in the batch — a broadcast
       left-semi over the streaming index scan, then a map-side-combined
       distinct (each task emits each fp once, so even a boilerplate
       fingerprint shared by 1M index docs crosses the exchange as one
       row per task);
    2. per-batch-doc counts — batch fps semi-joined against the (tiny,
       broadcast) matched set.

    The previous inner-join + count_distinct formulation materialized
    df_index(fp) x df_batch(fp) rows per fingerprint before the
    aggregate collapsed them — a mass-boilerplate fp in 1M index docs
    shared by 10k batch docs meant 10^10 intermediate rows. No step
    here multiplies the two dfs.

    The broadcast hint is GATED, not unconditional: an unbounded batch
    would ride the hint past Spark's autoBroadcast size guard and OOM
    executors. The batch's distinct fingerprints are pinned
    (localCheckpoint) and probed with an early-exit
    ``limit(broadcast_limit + 1).count()``; at or under the limit the
    hint applies (map-side joins, index untouched), above it the hint
    is dropped and AQE picks the strategy — against a fp-bucketed index
    the history side still avoids its shuffle. ``broadcast_limit=None``
    skips the probe and never hints."""
    nf = (
        _distinct_doc_fps(new_docs, k=k, w=w, id_col=id_col, text_col=text_col)
        .select(F.col("id").alias("_nid"), "fp")
        # Pinned: the size probe and both joins reuse one evaluation.
        # (per-doc distinct is row-local — no exchange to get here.)
        .localCheckpoint(eager=False)
    )
    batch_fps = nf.select("fp").distinct()
    hint = (
        broadcast_limit is not None
        and nf.limit(broadcast_limit + 1).count() <= broadcast_limit
    )
    if hint:
        batch_fps = F.broadcast(batch_fps)
    matched_fps = (
        index.select("fp").join(batch_fps, "fp", "left_semi").distinct()
    )
    if hint:
        matched_fps = F.broadcast(matched_fps)
    hits = (
        nf.join(matched_fps, "fp", "left_semi")
        .groupBy("_nid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    return (
        new_docs.select(F.col(id_col))
        .join(hits, new_docs[id_col] == hits._nid, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0).cast("long")) >= min_shared).alias(
                "is_dup"
            ),
        )
    )

"""Line-level corpus cleaning: intra-document duplicate-line removal and
corpus-level boilerplate-line stripping.

Standard curation stages between language ID and document dedup (the
CCNet / RefinedWeb / Dolma pipeline shape): a crawled document repeats
its own navigation lines, and the same header/footer/cookie-banner lines
recur across millions of pages. Both transforms here are line-exact and
deterministic (no RNG, no engine-specific hashing), so they are fully
DuckDB-oracle-checkable.

Scale shapes (the part that matters at 100 TB):

- **dedup_lines** is a pure per-row array projection — the corpus never
  shuffles. The first-occurrence filter is an index lambda
  (``filter(l, (x, i) -> array_position(l, x) = i + 1)``) rather than
  ``array_distinct`` because first-occurrence ORDER is part of the
  contract and the lambda states it explicitly on both engines
  (DuckDB's ``list_distinct`` gives no order guarantee). Cost is
  O(L^2) per document in line count — line counts are bounded by
  document size, not corpus size, so this stays data-parallel scan work.
- **strip_boilerplate** shuffles only (line -> doc-frequency) pairs,
  never documents. The hot-line set is bounded above by
  ``total_lines / min_docs`` (a line needs ``min_docs`` distinct
  documents to qualify), so it is broadcastable by construction at any
  corpus size for reasonable thresholds; the corpus side then filters
  its line arrays map-side against the broadcast set (one-row
  crossJoin — no explode, no re-assembly shuffle). The explode +
  anti-join + re-group formulation (``broadcast_hot=False``) exists for
  the regime where the hot set outgrows executor memory.

Reference parity: the reference has no text-curation surface (its
pipeline ends at the ES index — ``ParquetToElasticsearch.java``); these
extend the engine per the builder brief's LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: A line qualifies as boilerplate when it appears in at least this many
#: distinct documents.
BOILERPLATE_MIN_DOCS = 50

#: Canonical line delimiter for re-assembled text.
LINE_DELIM = "\n"

#: Canonical paragraph delimiter for re-assembled text.
PARA_DELIM = "\n\n"


def _first_occurrence_sql(lines: str) -> str:
    """Spark SQL: keep each line's first occurrence, preserving order."""
    return f"filter({lines}, (x, i) -> array_position({lines}, x) = i + 1)"


def dedup_lines(
    docs: DataFrame, id_col: str = "doc_id", lines_col: str = "lines"
) -> DataFrame:
    """Remove duplicate lines WITHIN each document, keeping the first
    occurrence of every line in its original position order.

    Input needs an ``array<string>`` column of lines; returns
    (id, n_lines, n_kept, text_clean) with counts BIGINT and
    ``text_clean`` the kept lines re-joined by ``LINE_DELIM``.

    Zero shuffle at any corpus size — one whole-stage-codegen projection.
    """
    kept = _first_occurrence_sql(lines_col)
    return docs.select(
        F.col(id_col),
        F.size(lines_col).cast("long").alias("n_lines"),
        F.expr(f"CAST(size({kept}) AS BIGINT)").alias("n_kept"),
        F.expr(f"array_join({kept}, '{LINE_DELIM}')").alias("text_clean"),
    )


def line_doc_freq(
    docs: DataFrame, id_col: str = "doc_id", lines_col: str = "lines"
) -> DataFrame:
    """Document frequency per distinct line: (line, n_docs).

    ``array_distinct`` runs map-side before the explode so each document
    contributes each line once; the groupBy then shuffles (line, 1)
    pairs with partial aggregation — never documents."""
    return (
        docs.select(F.explode(F.array_distinct(F.col(lines_col))).alias("line"))
        .groupBy("line")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def strip_boilerplate(
    docs: DataFrame,
    min_docs: int = BOILERPLATE_MIN_DOCS,
    id_col: str = "doc_id",
    lines_col: str = "lines",
    broadcast_hot: bool = True,
    hot_lines: DataFrame | None = None,
) -> DataFrame:
    """Remove lines that occur in >= ``min_docs`` distinct documents
    (headers, footers, cookie banners). Returns
    (id, n_lines, n_kept, text_clean), kept lines in original order.

    ``broadcast_hot=True`` (default): the hot-line set — bounded by
    total_lines / min_docs — is collapsed to ONE array row and
    broadcast-crossJoined; each document filters its own line array
    map-side. The corpus is never exploded and never shuffled.

    ``broadcast_hot=False``: explode + left_anti join on the line +
    re-group, for a hot set too large to broadcast; documents cross the
    wire twice (explode shuffle + re-assembly groupBy).

    ``hot_lines``: caller-supplied hot set (a DataFrame with a ``line``
    column) replacing the computed document-frequency table. The default
    detector aggregates EVERY distinct line (full line-universe
    shuffle); when the line universe itself is the bottleneck, compute
    the hot set with ``sketches.heavy_hitters_threshold`` over the
    doc-distinct exploded lines — its Misra-Gries candidate pass
    shuffles partitions x k rows instead, and its exact second pass
    makes the resulting hot set IDENTICAL to the default detector's
    (equivalence pinned in tests/test_sketches.py). The caller chooses
    k / min_frac from its known corpus scale — this operator will not
    guess them with an extra counting action."""
    if hot_lines is not None:
        hot = hot_lines.select("line")
    else:
        hot = line_doc_freq(docs, id_col=id_col, lines_col=lines_col).filter(
            F.col("n_docs") >= min_docs
        )
    if broadcast_hot:
        hot_row = hot.agg(F.sort_array(F.collect_list("line")).alias("_hot"))
        kept = f"filter({lines_col}, x -> NOT array_contains(_hot, x))"
        return docs.crossJoin(F.broadcast(hot_row)).select(
            F.col(id_col),
            F.size(lines_col).cast("long").alias("n_lines"),
            F.expr(f"CAST(size({kept}) AS BIGINT)").alias("n_kept"),
            F.expr(f"array_join({kept}, '{LINE_DELIM}')").alias("text_clean"),
        )
    exploded = docs.select(
        F.col(id_col).alias("_id"),
        F.size(lines_col).cast("long").alias("_n"),
        F.posexplode_outer(F.col(lines_col)).alias("_pos", "line"),
    )
    # LEFT join + marker (not anti): a document whose every line is
    # boilerplate must still come back with n_kept = 0.
    marked = exploded.join(
        hot.select("line", F.lit(True).alias("_hot")), "line", "left"
    )
    keep_struct = (
        "CASE WHEN _hot IS NULL AND line IS NOT NULL THEN struct(_pos, line) END"
    )
    return (
        marked.groupBy("_id", "_n")
        .agg(
            F.sum(
                F.when(F.col("_hot").isNull() & F.col("line").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_kept"),
            F.expr(
                f"array_join(transform(array_sort(collect_list({keep_struct})),"
                f" s -> s.line), '{LINE_DELIM}')"
            ).alias("text_clean"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").alias("n_lines"),
            "n_kept",
            "text_clean",
        )
    )


def dedup_paragraphs(
    docs: DataFrame, id_col: str = "doc_id", paras_col: str = "paras"
) -> DataFrame:
    """Corpus-WIDE paragraph dedup (the Dolma pipeline's paragraph
    stage): every distinct paragraph keeps exactly ONE copy — its first
    occurrence in (doc_id, position) order — and every other copy, in
    any document, is dropped. Subsumes intra-document paragraph dedup
    (a repeat inside one document is also a later occurrence).

    Input needs an ``array<string>`` column of paragraphs; returns
    (id, n_paras, n_kept, text_clean) with kept paragraphs re-joined by
    ``PARA_DELIM`` in original order.

    Scale shape — the dedup decision is made on digests alone:

    1. map-side: explode to (id, pos, md5(para)) — 16-byte digests;
    2. one digest-keyed aggregate picks each paragraph's keeper
       min-struct(id, pos);
    3. the (id, pos, fp) rows join the keeper table on fp (digest-only
       shuffle), and surviving positions re-aggregate to one
       sorted-positions array per document — a row per document, tiny;
    4. the original docs join that positions table on id and slice
       their own paragraph arrays map-side
       (``transform(keep, i -> paras[i])``).

    Document text crosses the wire exactly ONCE (step 4's equi-join on
    id hash-exchanges the corpus unless it is already bucketed by id —
    at 100 TB store the corpus bucketBy(id) and the join is
    shuffle-free on the text side). The explode/election/position legs
    move only digests and integers; the per-paragraph explode-join
    alternative would shuffle paragraph text twice.

    Distinct from strip_boilerplate: no threshold — EVERY duplicate
    beyond the first copy goes, and one copy always survives.
    """
    fps = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(paras_col)).alias("_pos", "_para"),
    ).select("_id", "_pos", F.md5(F.col("_para")).alias("_fp"))
    keepers = fps.groupBy("_fp").agg(
        F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_k")
    )
    kept_pos = (
        fps.join(keepers, "_fp")
        .filter((F.col("_k._id") == F.col("_id")) & (F.col("_k._pos") == F.col("_pos")))
        .groupBy("_id")
        .agg(F.sort_array(F.collect_list("_pos")).alias("_keep"))
    )
    joined = docs.join(
        kept_pos, docs[id_col] == kept_pos["_id"], "left"
    ).withColumn("_keep", F.coalesce(F.col("_keep"), F.array()))
    kept_paras = F.expr(f"transform(_keep, i -> {paras_col}[i])")
    return joined.select(
        F.col(id_col),
        F.size(paras_col).cast("long").alias("n_paras"),
        F.size("_keep").cast("long").alias("n_kept"),
        F.array_join(kept_paras, PARA_DELIM).alias("text_clean"),
    )

"""Corpus-level duplicated-span detection and masking: substring-granular
deduplication at word n-gram resolution.

Document-level dedup (``operators/dedup.py``) drops whole near-identical
documents; line-level cleaning (``operators/lines.py``) drops exact
repeated lines. Between them sits the span regime — a paragraph quoted
across thousands of pages, a license header, a syndicated news lede —
where the *documents* differ but long token runs repeat verbatim. Masking
those spans (keeping one canonical copy) is the substring-dedup stage of
an LLM training pipeline; memorization studies attribute outsized
duplication to exactly these shared substrings.

Semantics (all deterministic, both engines):

- tokens per ``functions/text.py`` (lower, split ``[^a-z0-9]+``);
- a *duplicated gram* is a token ``n``-gram occurring in at least
  ``min_docs`` distinct documents;
- occurrences merge into maximal *spans*: flagged start positions
  ``p < q`` in one document merge when ``q - p <= n`` (their token
  ranges overlap or touch);
- with ``keep_first=True`` the lowest ``doc_id`` containing a gram is
  its *keeper* and is not flagged for it — one copy of every duplicated
  gram survives the mask (dedup semantics); ``keep_first=False`` flags
  every occurrence (audit / boilerplate-removal semantics).

Scale shape (the 100 TB story):

- Gram extraction is a map-side projection inside the scan — documents
  never shuffle to produce grams.
- The duplicate-gram table shuffles (gram_key, doc_id) pairs once with
  map-side partial aggregation — the gram key is an 8-byte packed md5
  (``_gram_key_positions``), never the n-token gram string; its output
  is bounded by the number of *repeated* grams (1,115 of 23k at
  sf0.001 — typically orders of magnitude below corpus token count),
  so the keys→flags join is broadcast-eligible and AQE picks that up
  at runtime.
- Span merging windows over flagged positions only — a per-document
  handful of (pos) rows, never tokens.
- Masking re-joins the (doc_id, starts-array) table against the corpus:
  the only time full documents cross the wire, and only when the flagged
  side is too big to broadcast. The mask itself is a token-index lambda
  (no explode, no re-assembly shuffle) — same pattern as
  ``lines.strip_boilerplate``'s broadcast path.

Reference parity: the reference has no substring surface (its pipeline
ends at the ES index — ``ParquetToElasticsearch.java``); this extends the
engine per the builder brief's LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import h60_from_md5_sql, tokens_expr

#: Span gram length, in tokens. Long enough that natural language almost
#: never repeats it by chance (30-word vocab → 30^8 possible grams), short
#: enough to catch quoted paragraphs. Substring-dedup literature uses
#: 50-token windows on web corpora; testdata documents average ~55 tokens,
#: so the default is scaled to stay meaningful there.
DUP_SPAN_N = 8

#: A gram is duplicated when it appears in at least this many documents.
DUP_SPAN_MIN_DOCS = 2


def gram_positions(
    docs: DataFrame,
    n: int = DUP_SPAN_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, gram) for every token ``n``-gram; ``pos`` is the 1-based
    start token index (1-based on both engines — DuckDB lists are
    1-based, so the oracle shares the coordinate system).

    Documents shorter than ``n`` tokens contribute no rows (explicit
    filter: Spark's ``sequence(1, 0)`` is the *descending* [1, 0], not
    empty, so the guard is load-bearing)."""
    return (
        docs.select(F.col(id_col), tokens_expr(text_col).alias("_tk"))
        .filter(F.size("_tk") >= n)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_tk) - {n} + 1),"
                    f" i -> struct(CAST(i AS BIGINT) AS pos,"
                    f" array_join(slice(_tk, i, {n}), ' ') AS gram))"
                )
            ).alias("_g"),
        )
        .select(id_col, "_g.pos", "_g.gram")
    )


def _gram_key_rows(
    docs: DataFrame,
    n: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, _gs array<struct<pos, gk>>) — one row per document carrying
    its gram starts as 60-bit BIGINT keys (``md5('sg:' || gram)`` packed
    per functions/text.h60_from_md5_sql) instead of gram strings.

    This un-exploded form is what the span-detection internals pin and
    derive both legs from: the duplicate-gram leg takes the row-LOCAL
    distinct of ``gk`` (so its aggregate is a plain count over distinct
    (gk, id) pairs — no count_distinct expand, the construction that
    still spilled 24 GB at the 5M-doc probe), and the flag leg explodes
    the structs for positions. An 8-byte key per occurrence crosses any
    exchange instead of the ~n-token text (the r6 25x probe's span row
    spilled at 5M docs shuffling full 8-gram strings — 96.7→649 s).
    Key equality stands in for gram equality at a 60-bit collision rate
    (~occurrences²/2^61 — orders below the corpus's real duplication),
    and the DuckDB oracles hash the same bytes, so cross-engine results
    stay EXACTLY equal."""
    gram = f"array_join(slice(_tk, i, {n}), ' ')"
    gk = h60_from_md5_sql(f"md5(concat('sg', ':', {gram}))")
    return (
        docs.select(F.col(id_col), tokens_expr(text_col).alias("_tk"))
        .filter(F.size("_tk") >= n)
        .select(
            id_col,
            F.expr(
                f"transform(sequence(1, size(_tk) - {n} + 1),"
                f" i -> struct(CAST(i AS BIGINT) AS pos, {gk} AS gk))"
            ).alias("_gs"),
        )
    )


def duplicated_grams(
    docs: DataFrame,
    n: int = DUP_SPAN_N,
    min_docs: int = DUP_SPAN_MIN_DOCS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(gram, n_docs, keeper) for grams in >= ``min_docs`` distinct
    documents; ``keeper`` is the lowest holding doc_id. (The audit view
    keeps gram STRINGS; the masking internals use packed keys.)

    Per-document gram distinct is computed row-locally before the
    explode, so the aggregate counts pre-deduplicated (gram, id) pairs
    with a plain count — no count_distinct expand (the
    ``_flagged_positions`` rationale)."""
    gram = f"array_join(slice(_tk, i, {n}), ' ')"
    return (
        docs.select(F.col(id_col), tokens_expr(text_col).alias("_tk"))
        .filter(F.size("_tk") >= n)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"array_distinct(transform("
                    f"sequence(1, size(_tk) - {n} + 1), i -> {gram}))"
                )
            ).alias("gram"),
        )
        .groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(id_col).alias("keeper"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def _flagged_positions(
    docs: DataFrame,
    n: int,
    min_docs: int,
    keep_first: bool,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, pos) of duplicated-gram starts; keeper occurrences excluded
    when ``keep_first``.

    The per-document gram-key ARRAY feeds both the duplicate
    aggregation and the flag join, so it is pinned un-exploded
    (localCheckpoint, lazy; one row per doc) — without the pin the
    tokenize pass over the full corpus runs twice (same pattern as
    ``textops.bigram_lm``'s pair table). The duplicate leg explodes the
    row-LOCAL distinct of the keys, so distinct (gk, id) pairs reach
    the aggregate pre-deduplicated and ``n_docs`` is a plain count —
    the previous ``count_distinct(doc_id)`` planned a two-phase
    distinct expand over every occurrence, the last construction still
    spilling at the 5M-doc probe after the key packing."""
    grams = _gram_key_rows(
        docs, n=n, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=False)
    dup = (
        grams.select(
            F.col(id_col),
            F.explode(F.expr("array_distinct(transform(_gs, s -> s.gk))")).alias(
                "gk"
            ),
        )
        .groupBy("gk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(id_col).alias("keeper"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    flagged = (
        grams.select(F.col(id_col), F.explode("_gs").alias("_g"))
        .select(id_col, "_g.pos", "_g.gk")
        .join(dup.select("gk", "keeper"), "gk")
    )
    if keep_first:
        flagged = flagged.filter(F.col(id_col) != F.col("keeper"))
    return flagged.select(id_col, "pos")


def dup_spans(
    docs: DataFrame,
    n: int = DUP_SPAN_N,
    min_docs: int = DUP_SPAN_MIN_DOCS,
    keep_first: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal duplicated spans per document:
    (id, span_start, span_end, span_tokens), token indices 1-based
    inclusive, all BIGINT. Default ``keep_first=False`` reports every
    occurrence (the audit view)."""
    flagged = _flagged_positions(docs, n, min_docs, keep_first, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    new_span = F.when(
        F.lag("pos").over(w).isNull() | (F.col("pos") - F.lag("pos").over(w) > n), 1
    ).otherwise(0)
    sess = flagged.select(
        id_col, "pos", new_span.alias("_nf")
    ).select(
        id_col,
        "pos",
        F.sum("_nf").over(Window.partitionBy(id_col).orderBy("pos")).alias("_span"),
    )
    return (
        sess.groupBy(id_col, "_span")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + n - 1).cast("long").alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias("span_tokens"),
        )
    )


def strip_dup_spans(
    docs: DataFrame,
    n: int = DUP_SPAN_N,
    min_docs: int = DUP_SPAN_MIN_DOCS,
    keep_first: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Mask every token covered by a duplicated span:
    (id, n_tokens, n_masked, text_clean), counts BIGINT, ``text_clean``
    the surviving tokens joined by single spaces. With the default
    ``keep_first=True`` a gram's keeper occurrence is never flagged for
    that gram, so one copy survives — unless a *different* duplicated
    gram's span overlaps it inside the keeper document (the standard
    substring-dedup caveat; guaranteed-exactly-one would need global
    occurrence ordering).

    Every document appears in the output (left join against the flagged
    set); the mask is a per-row token-index lambda over the collected
    start positions — no explode of the corpus, no re-assembly shuffle.
    """
    flagged = _flagged_positions(docs, n, min_docs, keep_first, id_col, text_col)
    starts = flagged.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("_starts")
    )
    kept = (
        f"filter(_tk, (x, i) -> NOT exists(_starts,"
        f" s -> s <= i + 1 AND i + 1 <= s + {n} - 1))"
    )
    return (
        docs.select(F.col(id_col), tokens_expr(text_col).alias("_tk"))
        .join(starts, id_col, "left")
        .withColumn(
            "_starts", F.coalesce("_starts", F.expr("CAST(array() AS array<bigint>)"))
        )
        .select(
            id_col,
            F.size("_tk").cast("long").alias("n_tokens"),
            F.expr(f"CAST(size(_tk) - size({kept}) AS BIGINT)").alias("n_masked"),
            F.expr(f"array_join({kept}, ' ')").alias("text_clean"),
        )
    )

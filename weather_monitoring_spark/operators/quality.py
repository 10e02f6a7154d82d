"""Repetition-quality signals and PII redaction for training-data curation.

Two annotation families a corpus pipeline applies between dedup and
packing:

- **repetition signals** (Gopher-style): top-unigram share, top-bigram
  share, duplicate-token fraction. The scale-correct Spark shape is
  zero-shuffle: sort the per-document token array and take the longest
  equal-run via ``aggregate()`` (max run length in a sorted array ==
  max term frequency), so the whole pass stays inside one
  whole-stage-codegen projection — never explode-and-groupBy the corpus
  for a per-document statistic. Cost is O(n log n) per document, data
  parallel, no shuffle at any corpus size.
- **PII redaction**: e-mail / IPv4 / phone patterns counted and masked
  with ``regexp_count`` / ``regexp_replace``. Patterns are restricted to
  the RE2 ∩ Java-regex common subset (character classes, bounded
  repeats, ``\\b`` — no backreferences, no lookaround) so the DuckDB
  oracle runs the *identical* pattern strings.

Reference parity: the reference has no text-curation surface (its
pipeline ends at the ES index — ``ParquetToElasticsearch.java``); these
extend the engine per the builder brief's LLM-pipeline scope.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import tokens_expr

# ---------------- PII patterns (RE2 ∩ Java subset, shared verbatim) ------

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RE = "\\b[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b"

#: (name, pattern, mask) — redaction applies in this order; the patterns
#: are mutually non-overlapping (the phone pattern requires hyphens, the
#: IP pattern dots), so counts are independent of apply order.
REDACTIONS: tuple[tuple[str, str, str], ...] = (
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ips", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
)


def _redaction_cols(text_col: str) -> dict[str, Column]:
    clean = F.col(text_col)
    cols: dict[str, Column] = {}
    for name, pat, mask in REDACTIONS:
        cols[f"n_{name}"] = (
            F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, mask)
    cols["clean_text"] = clean.alias("clean_text")
    return cols


def o_redaction_cols(text_col: str) -> dict[str, str]:
    """DuckDB fragments computing the identical counts + masked text."""
    clean = text_col
    cols: dict[str, str] = {}
    for name, pat, mask in REDACTIONS:
        cols[f"n_{name}"] = f"CAST(len(regexp_extract_all({text_col}, '{pat}')) AS BIGINT)"
        clean = f"regexp_replace({clean}, '{pat}', '{mask}', 'g')"
    cols["clean_text"] = clean
    return cols


def pii_redaction(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Mask e-mail/IPv4/phone occurrences and count them per document.

    One projection — at 100 TB this is a scan-speed pass; the regex work
    is JVM-side codegen, no Python boundary."""
    cols = _redaction_cols(text_col)
    return docs.select(
        F.col(id_col),
        cols["clean_text"],
        cols["n_emails"],
        cols["n_ips"],
        cols["n_phones"],
    )


# ---------------- repetition signals -------------------------------------


def _max_run_sql(arr: str) -> str:
    """Spark SQL: longest run of equal adjacent elements after sorting
    ``arr`` — i.e. the maximum multiplicity of any element. Pure array
    fold, no shuffle."""
    step = "IF(t <=> s.prev, s.run + 1, CAST(1 AS BIGINT))"
    return (
        f"aggregate(array_sort({arr}), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT), "
        "'best', CAST(0 AS BIGINT)), "
        f"(s, t) -> named_struct('prev', t, 'run', {step}, "
        f"'best', GREATEST(s.best, {step})), "
        "s -> s.best)"
    )


BIGRAMS_SQL = (
    "transform(sequence(1, greatest(size({tk}) - 1, 0)),"
    " i -> concat({tk}[i-1], ' ', {tk}[i]))"
)


def _repetition_cols(tk: str) -> dict[str, Column]:
    bg = BIGRAMS_SQL.format(tk=tk)
    n_tok = F.size(tk).cast("bigint")
    n_bg = F.greatest(F.size(tk) - 1, F.lit(0)).cast("bigint")
    top_tok = F.expr(_max_run_sql(tk))
    top_bg = F.expr(_max_run_sql(bg))
    n_distinct = F.size(F.array_distinct(F.col(tk))).cast("bigint")
    zero = F.lit(0.0)
    return {
        "n_tokens": n_tok.alias("n_tokens"),
        "top_token_share": F.when(n_tok == 0, zero)
        .otherwise(top_tok.cast("double") / n_tok.cast("double"))
        .alias("top_token_share"),
        "top_bigram_share": F.when(n_bg == 0, zero)
        .otherwise(top_bg.cast("double") / n_bg.cast("double"))
        .alias("top_bigram_share"),
        "dup_token_frac": F.when(n_tok == 0, zero)
        .otherwise((n_tok - n_distinct).cast("double") / n_tok.cast("double"))
        .alias("dup_token_frac"),
    }


def o_repetition_cols(tk: str) -> dict[str, str]:
    """DuckDB fragments: same statistics via per-element multiplicity
    (list comprehension — the oracle needs correctness, not the
    zero-shuffle shape)."""
    bg = f"list_transform(range(1, greatest(len({tk}) - 1, 0) + 1), i -> {tk}[i] || ' ' || {tk}[i+1])"
    top = "list_max(list_transform(list_distinct({a}), u -> CAST(len(list_filter({a}, x -> x = u)) AS BIGINT)))"
    return {
        "n_tokens": f"CAST(len({tk}) AS BIGINT)",
        "top_token_share": (
            f"CASE WHEN len({tk}) = 0 THEN 0.0 ELSE "
            f"CAST({top.format(a=tk)} AS DOUBLE) / CAST(len({tk}) AS DOUBLE) END"
        ),
        "top_bigram_share": (
            f"CASE WHEN greatest(len({tk}) - 1, 0) = 0 THEN 0.0 ELSE "
            f"CAST({top.format(a=bg)} AS DOUBLE)"
            f" / CAST(greatest(len({tk}) - 1, 0) AS DOUBLE) END"
        ),
        "dup_token_frac": (
            f"CASE WHEN len({tk}) = 0 THEN 0.0 ELSE "
            f"CAST(len({tk}) - len(list_distinct({tk})) AS DOUBLE)"
            f" / CAST(len({tk}) AS DOUBLE) END"
        ),
    }


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition statistics (token count, top-unigram share,
    top-bigram share, duplicate-token fraction) in one zero-shuffle
    projection."""
    df = docs.withColumn("_tk", tokens_expr(text_col))
    cols = _repetition_cols("_tk")
    return df.select(F.col(id_col), *cols.values())


def quality_annotations(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction + repetition signals composed into ONE projection —
    annotation families never join the corpus against itself."""
    df = docs.withColumn("_tk", tokens_expr(text_col))
    red = _redaction_cols(text_col)
    rep = _repetition_cols("_tk")
    return df.select(
        F.col(id_col),
        red["clean_text"],
        red["n_emails"],
        red["n_ips"],
        red["n_phones"],
        *rep.values(),
    )


#: zlib level for compression_signals — the standard default; the signal
#: is a ratio, insensitive to small level changes.
ZLIB_LEVEL = 6


def compression_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Compression-ratio quality signal (Gopher/Dolma family): highly
    repetitive or templated text compresses far better than natural
    prose, and near-random noise compresses worse. Returns
    (id, n_bytes, n_compressed, compression_ratio) with
    ``compression_ratio = n_bytes / n_compressed`` (higher = more
    redundant).

    This is the one curation signal that genuinely needs Python (zlib
    has no JVM-expression equivalent), so it runs as an Arrow-batched
    ``pandas_udf`` — one projection, zero shuffle, the same
    filter-before-Python discipline as the multimodal operators. No
    DuckDB oracle on purpose: the ratio is a property of the compressor,
    not a relational semantic; tests pin the orderings that matter
    (repetitive > prose > noise) instead of byte counts."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _zlen(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), ZLIB_LEVEL))
            if t is not None
            else None
        )

    n_bytes = F.octet_length(F.col(text_col)).cast("long")
    out = docs.select(
        F.col(id_col),
        n_bytes.alias("n_bytes"),
        _zlen(F.col(text_col)).alias("n_compressed"),
    )
    return out.withColumn(
        "compression_ratio",
        F.when(
            F.col("n_compressed").isNull() | (F.col("n_compressed") == 0), None
        ).otherwise(F.col("n_bytes").cast("double") / F.col("n_compressed").cast("double")),
    )


def blocklist_filter(
    docs: DataFrame,
    patterns: tuple[str, ...],
    max_hits: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pattern-blocklist gate (the C4-style banned-terms filter): count
    matches of each blocklist regex per document and flag documents whose
    total exceeds ``max_hits``. Returns the input columns plus
    (n_blocked_hits, blocked) — every document gets an explicit verdict;
    the caller filters on ``blocked`` (dropping silently would hide the
    gate's effect from audits).

    Patterns must stay in the RE2 ∩ Java-regex common subset (same rule
    as the PII patterns) so the DuckDB oracle runs the identical strings.
    One zero-shuffle projection — regex counting is JVM codegen, stacked
    per pattern inside the scan."""
    hits = None
    for pat in patterns:
        h = F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint")
        hits = h if hits is None else (hits + h)
    if hits is None:
        hits = F.lit(0).cast("bigint")
    return docs.select(
        "*",
        hits.alias("n_blocked_hits"),
        (hits > max_hits).alias("blocked"),
    )


#: curate_corpus gate defaults.
CURATE_MAX_DUP_FRAC = 0.9
CURATE_MIN_TOKENS = 5


def curate_corpus(
    docs: DataFrame,
    blocklist: tuple[str, ...] = (),
    max_block_hits: int = 0,
    max_dup_token_frac: float = CURATE_MAX_DUP_FRAC,
    min_tokens: int = CURATE_MIN_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The curation front door as ONE call: normalize the text, compute
    the gate signals, and attach a per-document verdict — ``kept``, or
    the name of the FIRST failing gate (``too_short``, ``repetitive``,
    ``blocked``). Returns (id, text_norm, n_tokens, dup_token_frac,
    n_blocked_hits, verdict); callers filter ``verdict = 'kept'`` and
    publish the verdict distribution with the data drop (dropping
    silently hides the gates' effect from audits).

    Everything here is column algebra over one pass — normalization,
    tokenization, repetition fold, and blocklist counting stack into a
    single zero-shuffle projection (the test asserts no Exchange in the
    physical plan), so the full gate runs at parquet-scan speed at any
    corpus size."""
    from weather_monitoring_spark.operators.textops import normalize_text

    normed = normalize_text(docs, id_col=id_col, text_col=text_col).select(
        id_col, "text_norm"
    )
    df = normed.withColumn("_tk", tokens_expr("text_norm"))
    rep = _repetition_cols("_tk")
    hits = None
    for pat in blocklist:
        h = F.regexp_count(F.col("text_norm"), F.lit(pat)).cast("bigint")
        hits = h if hits is None else (hits + h)
    if hits is None:
        hits = F.lit(0).cast("bigint")
    staged = df.select(
        F.col(id_col),
        F.col("text_norm"),
        rep["n_tokens"],
        rep["dup_token_frac"],
        hits.alias("n_blocked_hits"),
    )
    verdict = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("dup_token_frac") > max_dup_token_frac, F.lit("repetitive"))
        .when(F.col("n_blocked_hits") > max_block_hits, F.lit("blocked"))
        .otherwise(F.lit("kept"))
    )
    return staged.withColumn("verdict", verdict)

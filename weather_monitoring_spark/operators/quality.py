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


# ---------------- Gopher document-quality rules --------------------------
#
# The full heuristic rule set from Rae et al. 2021 ("Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher",
# arXiv:2112.11446, Appendix A1.1) — the published filter stack the
# Dolma / RefinedWeb / FineWeb pipelines all re-implement. Thresholds
# are the paper's published defaults, exposed as keyword arguments.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2

#: The paper's required-stopword list (>= GOPHER_MIN_STOPWORDS distinct
#: must appear, evidence the text is running English prose).
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)

#: Whitespace "word" splitter — Gopher words keep their punctuation
#: (unlike ``tokens_expr``), so symbol ratios and mean word length see
#: the raw surface forms. Explicit class, not ``\\s``: Java counts
#: ``\\x0B`` as ``\\s``, RE2 does not — the explicit class is the
#: RE2 ∩ Java common subset both engines interpret identically.
GOPHER_WS_RE = "[ \\t\\n\\r\\f]+"

#: Line-start characters counted as bullets.
GOPHER_BULLETS: tuple[str, ...] = ("•", "-", "*")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = GOPHER_MIN_WORDS,
    max_words: int = GOPHER_MAX_WORDS,
    min_mean_word_len: float = GOPHER_MIN_MEAN_WORD_LEN,
    max_mean_word_len: float = GOPHER_MAX_MEAN_WORD_LEN,
    max_symbol_ratio: float = GOPHER_MAX_SYMBOL_RATIO,
    max_bullet_frac: float = GOPHER_MAX_BULLET_FRAC,
    max_ellipsis_frac: float = GOPHER_MAX_ELLIPSIS_FRAC,
    min_alpha_frac: float = GOPHER_MIN_ALPHA_FRAC,
    min_stopwords: int = GOPHER_MIN_STOPWORDS,
    carry: tuple = (),
) -> DataFrame:
    """The complete Gopher quality rule set as ONE zero-shuffle
    projection: per document, every signal the paper's Appendix-A1.1
    heuristics gate on, plus a first-failing-rule verdict (the
    ``curate_corpus`` precedence discipline — every document gets
    ``kept`` or the name of the first rule it failed, so the verdict
    distribution is publishable with the data drop).

    Signals: ``n_words`` (whitespace words, punctuation attached),
    ``mean_word_len``, ``frac_alpha_words`` (words containing an ASCII
    letter), ``symbol_ratio`` (``#`` / ``...`` / ``…`` occurrences per
    word), ``frac_bullet_lines`` / ``frac_ellipsis_lines`` (over
    non-blank trimmed lines), ``n_stopwords`` (distinct required
    stopwords present).

    Cross-engine exactness: word/line statistics are exact BIGINTs; each
    ratio is ONE IEEE division of identical operands (bit-stable — the
    repetition_signals discipline), so the whole frame hash-matches the
    DuckDB oracle. Patterns ride the Column API, never SQL string
    literals (the htmlops escaping discipline — Spark's SQL parser
    rewrites unknown backslash escapes). Scale shape: pure column
    algebra inside the scan's whole-stage codegen — no shuffle, no
    Python, at any corpus size.

    ``carry`` threads extra input columns through to the output
    unchanged, so a caller gating a corpus (pipelines.curate_crawl)
    can filter on ``verdict`` and keep its payload columns in ONE
    projection instead of joining the verdict back — the gate stays
    shuffle-free end to end. Carry names must not collide with the
    fixed output columns (or ``id_col``) — the projection would emit
    duplicate/ambiguous names — so collisions raise up front."""
    reserved = {
        id_col,
        "n_words",
        "mean_word_len",
        "frac_alpha_words",
        "symbol_ratio",
        "frac_bullet_lines",
        "frac_ellipsis_lines",
        "n_stopwords",
        "verdict",
    }
    clash = [c for c in carry if c in reserved]
    if clash:
        raise ValueError(
            f"gopher_rules: carry column(s) {clash} collide with the "
            f"output columns {sorted(reserved)} — rename before carrying"
        )
    txt = F.coalesce(F.col(text_col), F.lit(""))
    df = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.filter(F.split(txt, GOPHER_WS_RE), lambda x: x != F.lit("")).alias(
            "_w"
        ),
        F.filter(
            F.transform(F.split(txt, "\\n"), lambda l: F.trim(l)),
            lambda l: l != F.lit(""),
        ).alias("_l"),
        tokens_expr(text_col).alias("_tk"),
        (
            F.regexp_count(txt, F.lit("#"))
            + F.regexp_count(txt, F.lit("\\.\\.\\."))
            + F.regexp_count(txt, F.lit("…"))
        ).cast("bigint").alias("_sym"),
    )
    nw = F.size("_w").cast("bigint")
    nl = F.size("_l").cast("bigint")
    zero = F.lit(0.0)
    chars = F.aggregate(
        "_w", F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    alpha = F.size(
        F.filter("_w", lambda x: x.rlike("[A-Za-z]"))
    ).cast("bigint")
    bul = F.size(
        F.filter(
            "_l", lambda l: F.substring(l, 1, 1).isin(list(GOPHER_BULLETS))
        )
    ).cast("bigint")
    ell = F.size(
        F.filter("_l", lambda l: l.like("%...") | l.like("%…"))
    ).cast("bigint")
    nstop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(F.col("_tk"), s),
        )
    ).cast("bigint")
    sig = df.select(
        id_col,
        *carry,
        nw.alias("n_words"),
        F.when(nw == 0, zero)
        .otherwise(chars.cast("double") / nw.cast("double"))
        .alias("mean_word_len"),
        F.when(nw == 0, zero)
        .otherwise(alpha.cast("double") / nw.cast("double"))
        .alias("frac_alpha_words"),
        F.when(nw == 0, zero)
        .otherwise(F.col("_sym").cast("double") / nw.cast("double"))
        .alias("symbol_ratio"),
        F.when(nl == 0, zero)
        .otherwise(bul.cast("double") / nl.cast("double"))
        .alias("frac_bullet_lines"),
        F.when(nl == 0, zero)
        .otherwise(ell.cast("double") / nl.cast("double"))
        .alias("frac_ellipsis_lines"),
        nstop.alias("n_stopwords"),
    )
    verdict = (
        F.when(F.col("n_words") < min_words, F.lit("too_few_words"))
        .when(F.col("n_words") > max_words, F.lit("too_many_words"))
        .when(
            (F.col("mean_word_len") < min_mean_word_len)
            | (F.col("mean_word_len") > max_mean_word_len),
            F.lit("word_length"),
        )
        .when(F.col("symbol_ratio") > max_symbol_ratio, F.lit("symbol_ratio"))
        .when(F.col("frac_bullet_lines") > max_bullet_frac, F.lit("bullet_lines"))
        .when(
            F.col("frac_ellipsis_lines") > max_ellipsis_frac,
            F.lit("ellipsis_lines"),
        )
        .when(F.col("frac_alpha_words") < min_alpha_frac, F.lit("non_alpha_words"))
        .when(F.col("n_stopwords") < min_stopwords, F.lit("stopwords"))
        .otherwise(F.lit("kept"))
    )
    return sig.withColumn("verdict", verdict)


def o_gopher_rules_sql(source: str = "documents") -> str:
    """Full DuckDB mirror of ``gopher_rules`` at the default thresholds:
    same whitespace class, same line trimming, same single-division
    ratios, same verdict precedence — shared-verbatim constants."""
    from weather_monitoring_spark.functions.text import o_tokens

    bullets = ", ".join(f"'{b}'" for b in GOPHER_BULLETS)
    stops = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
        WITH base AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(coalesce(text, ''),
                       '{GOPHER_WS_RE}'), x -> x <> '') AS w,
                   list_filter(list_transform(
                       regexp_split_to_array(coalesce(text, ''), '\\n'),
                       l -> trim(l)), l -> l <> '') AS l,
                   {o_tokens("coalesce(text, '')")} AS tk,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '#'))
                      + len(regexp_extract_all(coalesce(text, ''), '\\.\\.\\.'))
                      + len(regexp_extract_all(coalesce(text, ''), '…'))
                     AS BIGINT) AS sym
            FROM {source}
        ), sig AS (
            SELECT doc_id,
                   CAST(len(w) AS BIGINT) AS n_words,
                   CASE WHEN len(w) = 0 THEN 0.0 ELSE
                     CAST(coalesce(list_sum(list_transform(w,
                         x -> CAST(len(x) AS BIGINT))), 0) AS DOUBLE)
                     / CAST(len(w) AS DOUBLE) END AS mean_word_len,
                   CASE WHEN len(w) = 0 THEN 0.0 ELSE
                     CAST(len(list_filter(w,
                         x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                     / CAST(len(w) AS DOUBLE) END AS frac_alpha_words,
                   CASE WHEN len(w) = 0 THEN 0.0 ELSE
                     CAST(sym AS DOUBLE) / CAST(len(w) AS DOUBLE)
                   END AS symbol_ratio,
                   CASE WHEN len(l) = 0 THEN 0.0 ELSE
                     CAST(len(list_filter(l,
                         x -> substr(x, 1, 1) IN ({bullets}))) AS DOUBLE)
                     / CAST(len(l) AS DOUBLE) END AS frac_bullet_lines,
                   CASE WHEN len(l) = 0 THEN 0.0 ELSE
                     CAST(len(list_filter(l,
                         x -> x LIKE '%...' OR x LIKE '%…')) AS DOUBLE)
                     / CAST(len(l) AS DOUBLE) END AS frac_ellipsis_lines,
                   CAST(len(list_filter([{stops}],
                       s -> list_contains(tk, s))) AS BIGINT) AS n_stopwords
            FROM base
        )
        SELECT *,
               CASE
                 WHEN n_words < {GOPHER_MIN_WORDS} THEN 'too_few_words'
                 WHEN n_words > {GOPHER_MAX_WORDS} THEN 'too_many_words'
                 WHEN mean_word_len < {GOPHER_MIN_MEAN_WORD_LEN}
                   OR mean_word_len > {GOPHER_MAX_MEAN_WORD_LEN}
                   THEN 'word_length'
                 WHEN symbol_ratio > {GOPHER_MAX_SYMBOL_RATIO} THEN 'symbol_ratio'
                 WHEN frac_bullet_lines > {GOPHER_MAX_BULLET_FRAC}
                   THEN 'bullet_lines'
                 WHEN frac_ellipsis_lines > {GOPHER_MAX_ELLIPSIS_FRAC}
                   THEN 'ellipsis_lines'
                 WHEN frac_alpha_words < {GOPHER_MIN_ALPHA_FRAC}
                   THEN 'non_alpha_words'
                 WHEN n_stopwords < {GOPHER_MIN_STOPWORDS} THEN 'stopwords'
                 ELSE 'kept'
               END AS verdict
        FROM sig
    """


# ---------------- C4 rule set (Raffel et al. 2020, JMLR) ------------------
#
# The C4 cleaning heuristics are LINE-level (keep a line only if it looks
# like prose) plus four PAGE-level drops — a different axis than the
# doc-level Gopher signals above, and the two compose: real pipelines run
# C4-style line cleaning FIRST (it rewrites the text), then doc gates.
# The paper's remaining step, three-sentence span dedup, is the span
# family (operators/spans.py::x_dup_spans / x_strip_dup_spans).

C4_MIN_SENTENCES = 5
C4_MIN_LINE_WORDS = 3
C4_TERMINAL_RE = "[.!?\"”’]$"  # period/bang/question/closing quote
C4_SENTENCE_RE = "[.!?]"
# The published filter uses the external LDNOOBW word list; the list is
# caller-supplied DATA (like the BPE merge table) — this default is a
# small inoffensive placeholder so the operator is runnable/testable.
C4_BAD_WORDS: tuple[str, ...] = ("nsfw", "xxx")

#: intra-line word/whitespace classes — GOPHER_WS_RE minus \n (a split
#: line cannot contain one), so the regex count below is EXACTLY the
#: split-on-whitespace word count.
_C4_W = "[^ \\t\\r\\f]+"
_C4_S = "[ \\t\\r\\f]+"


def _c4_min_words_re(k: int) -> str:
    """Pattern matching iff a line has >= k whitespace-separated words —
    ONE regexp probe instead of split + filter + size per line (measured
    12x on the line gate: 8.3 s -> 0.7 s at 200k six-line docs)."""
    if k <= 1:
        return _C4_W
    return f"{_C4_W}(?:{_C4_S}{_C4_W}){{{k - 1}}}"


def c4_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_sentences: int = C4_MIN_SENTENCES,
    min_line_words: int = C4_MIN_LINE_WORDS,
    bad_words: tuple[str, ...] = C4_BAD_WORDS,
    carry: tuple = (),
) -> DataFrame:
    """The C4 cleaning rule set (Raffel et al. 2020, section 2.2) as ONE
    zero-shuffle projection. Per document: trim lines, KEEP a line only
    if it ends in terminal punctuation (period / ! / ? / closing quote),
    has >= ``min_line_words`` whitespace words, and does not mention
    "javascript" (case-insensitive); rebuild ``text_clean`` from the
    kept lines. Page verdict (first-failing precedence, on the RAW
    text, matching the paper's page-level drops): ``brace`` if the page
    contains ``{``, ``lorem_ipsum`` if it contains the phrase,
    ``bad_words`` if any token is on the supplied word list, then
    ``too_few_sentences`` if the CLEANED text has fewer than
    ``min_sentences`` sentence-terminal marks, else ``kept``.

    Outputs: (id, text_clean, n_lines BIGINT non-blank, n_lines_kept
    BIGINT, n_sentences BIGINT, verdict) — counts are exact BIGINTs and
    the strings are byte-built, so the whole frame hash-matches the
    DuckDB oracle with no IEEE concern at all.

    Scale shape: pure array algebra (split -> nested filter -> join)
    inside the scan's whole-stage codegen — no shuffle, no Python, at
    any corpus size; patterns ride the Column API (htmlops escaping
    discipline). ``carry`` threads payload columns through unchanged
    (gopher_rules contract, same collision guard)."""
    reserved = {
        id_col,
        "text_clean",
        "n_lines",
        "n_lines_kept",
        "n_sentences",
        "verdict",
    }
    clash = [c for c in carry if c in reserved]
    if clash:
        raise ValueError(
            f"c4_rules: carry column(s) {clash} collide with the output "
            f"columns {sorted(reserved)} — rename before carrying"
        )
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(
        F.transform(F.split(txt, "\\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    min_words_re = _c4_min_words_re(min_line_words)

    def _keep(l: Column) -> Column:
        return (
            l.rlike(C4_TERMINAL_RE)
            & l.rlike(min_words_re)
            & ~F.lower(l).contains("javascript")
        )

    # Staged projections: each expensive intermediate (_l, _k,
    # text_clean, n_sentences) becomes a column BEFORE anything
    # references it twice — measured 2.5x vs computing them inline in
    # one select (33.5 s -> 13.6 s / 400k six-line docs).
    s1 = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        txt.alias("_t"),
        lines.alias("_l"),
        tokens_expr(f"coalesce({text_col}, '')").alias("_tk"),
    )
    s2 = s1.select(
        id_col,
        *carry,
        "_t",
        "_tk",
        F.size("_l").cast("bigint").alias("n_lines"),
        F.filter("_l", _keep).alias("_k"),
    )
    s3 = s2.select(
        id_col,
        *carry,
        "_t",
        "_tk",
        "n_lines",
        F.array_join("_k", "\n").alias("text_clean"),
        F.size("_k").cast("bigint").alias("n_lines_kept"),
    )
    s4 = s3.select(
        id_col,
        *carry,
        "_t",
        "_tk",
        "text_clean",
        "n_lines",
        "n_lines_kept",
        F.regexp_count("text_clean", F.lit(C4_SENTENCE_RE))
        .cast("bigint")
        .alias("n_sentences"),
    )
    # bad_words=() short-circuits to FALSE: F.array() has no element
    # type, so arrays_overlap(array<string>, array<void>) would fail
    # with an opaque analysis error instead of meaning "no word list".
    bad_hit = (
        F.arrays_overlap("_tk", F.array(*[F.lit(w) for w in bad_words]))
        if bad_words
        else F.lit(False)
    )
    verdict = (
        F.when(F.col("_t").contains("{"), F.lit("brace"))
        .when(F.lower("_t").contains("lorem ipsum"), F.lit("lorem_ipsum"))
        .when(bad_hit, F.lit("bad_words"))
        .when(F.col("n_sentences") < min_sentences, F.lit("too_few_sentences"))
        .otherwise(F.lit("kept"))
    )
    return s4.select(
        id_col,
        *carry,
        "text_clean",
        "n_lines",
        "n_lines_kept",
        "n_sentences",
        verdict.alias("verdict"),
    )


def o_c4_rules_sql(source: str = "documents") -> str:
    """Full DuckDB mirror of ``c4_rules`` at the default thresholds —
    shared-verbatim pattern constants, same line trimming, same keep
    predicate, same verdict precedence."""
    from weather_monitoring_spark.functions.text import o_tokens

    bad = ", ".join(f"'{w}'" for w in C4_BAD_WORDS)
    keep_ln = (
        f"regexp_matches(ln, '{C4_TERMINAL_RE}') "
        f"AND regexp_matches(ln, '{_c4_min_words_re(C4_MIN_LINE_WORDS)}') "
        f"AND NOT contains(lower(ln), 'javascript')"
    )
    return f"""
        WITH base AS (
            SELECT doc_id,
                   coalesce(text, '') AS t,
                   list_filter(list_transform(
                       regexp_split_to_array(coalesce(text, ''), '\\n'),
                       l -> trim(l)), l -> l <> '') AS l,
                   {o_tokens("coalesce(text, '')")} AS tk
            FROM {source}
        ), kept AS (
            SELECT doc_id, t, l, tk,
                   list_filter(l, ln -> {keep_ln}) AS k
            FROM base
        ), sig AS (
            -- array_to_string([]) is NULL in DuckDB but '' in Spark
            SELECT doc_id, t, tk,
                   coalesce(array_to_string(k, chr(10)), '') AS text_clean,
                   CAST(len(l) AS BIGINT) AS n_lines,
                   CAST(len(k) AS BIGINT) AS n_lines_kept,
                   CAST(len(regexp_extract_all(
                       coalesce(array_to_string(k, chr(10)), ''),
                       '{C4_SENTENCE_RE}')) AS BIGINT) AS n_sentences
            FROM kept
        )
        SELECT doc_id, text_clean, n_lines, n_lines_kept, n_sentences,
               CASE
                 WHEN contains(t, '{{') THEN 'brace'
                 WHEN contains(lower(t), 'lorem ipsum') THEN 'lorem_ipsum'
                 WHEN list_has_any(tk, [{bad}]) THEN 'bad_words'
                 WHEN n_sentences < {C4_MIN_SENTENCES} THEN 'too_few_sentences'
                 ELSE 'kept'
               END AS verdict
        FROM sig
    """


# ---------------- Gopher repetition rules (Rae et al. Table A1, A1.2) ------
#
# The second half of the published Gopher filter: repetition-based removal.
# gopher_rules above is the A1.1 heuristics; this is the A1.2 table —
# duplicate line/paragraph fractions, duplicate line/paragraph CHARACTER
# fractions, the top-{2,3,4}-gram character fraction, and the duplicated-
# {5..10}-gram character fraction — with the paper's thresholds as the
# first-failing verdict.

PARA_SPLIT_RE = "\\n{2,}"

#: (signal, threshold) in the paper's Table-A1 order.
GOPHER_REP_THRESHOLDS: tuple[tuple[str, float], ...] = (
    ("frac_dup_lines", 0.30),
    ("frac_dup_paragraphs", 0.30),
    ("frac_chars_dup_lines", 0.20),
    ("frac_chars_dup_paragraphs", 0.20),
    ("frac_chars_top_2gram", 0.20),
    ("frac_chars_top_3gram", 0.18),
    ("frac_chars_top_4gram", 0.16),
    ("frac_chars_dup_5gram", 0.15),
    ("frac_chars_dup_6gram", 0.14),
    ("frac_chars_dup_7gram", 0.13),
    ("frac_chars_dup_8gram", 0.12),
    ("frac_chars_dup_9gram", 0.11),
    ("frac_chars_dup_10gram", 0.10),
)

_REP_TOP_NS = (2, 3, 4)
_REP_DUP_NS = (5, 6, 7, 8, 9, 10)


def _rep_grams_sql(tk: str, n: int) -> str:
    """Spark SQL: word n-grams of the ``tk`` array (space-joined, so a
    gram's token chars are ``length(gram) - (n-1)``). The ``size >= n``
    guard matters: Spark's sequence(1, 0) is the DESCENDING [1, 0]."""
    return (
        f"CASE WHEN size({tk}) >= {n} THEN "
        f"transform(sequence(1, size({tk}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({tk}, i, {n}))) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def _rep_top_chars_sql(g: str, n: int) -> str:
    """Spark SQL: token chars covered by the MOST FREQUENT n-gram —
    count(top gram) * (length(top gram) - (n-1)) — via one fold over the
    sorted gram array (max-multiplicity = longest equal-adjacent run,
    the _max_run_sql discipline). Tie-break: among max-count grams, the
    largest char length (mirrored verbatim by the oracle)."""
    sep = n - 1
    run = "IF(t <=> s.prev, s.run + 1, CAST(1 AS BIGINT))"
    cl = f"CAST(length(t) - {sep} AS BIGINT)"
    better = f"({run} > s.br OR ({run} = s.br AND {cl} > s.bc))"
    return (
        f"aggregate(array_sort({g}), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT), "
        "'br', CAST(0 AS BIGINT), 'bc', CAST(0 AS BIGINT)), "
        f"(s, t) -> named_struct('prev', t, 'run', {run}, "
        f"'br', IF({better}, {run}, s.br), "
        f"'bc', IF({better}, {cl}, s.bc)), "
        "s -> IF(s.br >= 2, s.br * s.bc, CAST(0 AS BIGINT)))"
    )


def _rep_dup_chars_sql(tk: str, g: str, n: int) -> str:
    """Spark SQL: token chars covered by ANY duplicated n-gram (overlaps
    counted once — position coverage, the published semantics), in
    O(G log G) row-local work:

    1. sort (gram, position) structs — duplicates become adjacent;
    2. one fold collects the positions of every gram whose run length
       is >= 2 (no per-position membership probe against a dup set —
       that would be O(G * dups));
    3. one fold over the sorted dup positions unions the covered
       intervals [p, p+n-1] and sums token lengths via slice()."""
    sp = (
        f"array_sort(transform(sequence(1, size({g})), "
        f"i -> named_struct('gr', element_at({g}, i), 'p', CAST(i AS BIGINT))))"
    )
    same = "t.gr <=> s.pg"
    acc = (
        f"IF({same}, IF(s.pin, concat(s.acc, array(t.p)), "
        f"concat(s.acc, array(s.pp, t.p))), s.acc)"
    )
    dup_pos = (
        f"aggregate({sp}, "
        "named_struct('pg', CAST(NULL AS STRING), 'pp', CAST(0 AS BIGINT), "
        "'pin', false, 'acc', CAST(array() AS array<bigint>)), "
        f"(s, t) -> named_struct('pg', t.gr, 'pp', t.p, 'pin', {same}, "
        f"'acc', {acc}), "
        "s -> s.acc)"
    )
    add = (
        f"IF(p + {n} - 1 >= greatest(p, s.last + 1), "
        f"aggregate(slice({tk}, CAST(greatest(p, s.last + 1) AS INT), "
        f"CAST(p + {n} - 1 - greatest(p, s.last + 1) + 1 AS INT)), "
        "CAST(0 AS BIGINT), (a, w) -> a + length(w)), CAST(0 AS BIGINT))"
    )
    return (
        f"IF(size({g}) = 0, CAST(0 AS BIGINT), "
        f"aggregate(array_sort({dup_pos}), "
        "named_struct('last', CAST(0 AS BIGINT), 'ch', CAST(0 AS BIGINT)), "
        f"(s, p) -> named_struct('last', greatest(s.last, p + {n} - 1), "
        f"'ch', s.ch + {add}), "
        "s -> s.ch))"
    )


_REP_SIG_FIELDS = (
    "n_tokens bigint, frac_dup_lines double, frac_dup_paragraphs double, "
    "frac_chars_dup_lines double, frac_chars_dup_paragraphs double, "
    + ", ".join(f"frac_chars_top_{n}gram double" for n in _REP_TOP_NS)
    + ", "
    + ", ".join(f"frac_chars_dup_{n}gram double" for n in _REP_DUP_NS)
)


def _rep_signals_py(s: str) -> dict:
    """Driver/executor-side Python replay of the expr-path definitions —
    BIT-EQUAL by construction: every numerator/denominator is an exact
    int and each fraction is one IEEE double division of the same
    operands. Two exact prunings keep it O(T) on low-repetition text:
    a gram can only occur twice if its FIRST token occurs twice (so the
    Counter passes only visit candidate positions), and gram char
    lengths come from token-length prefix sums (no string joins).
    Kept module-level so tests can replay it directly."""
    import re
    from collections import Counter

    from weather_monitoring_spark.functions.text import TOKEN_SPLIT_RE

    s = s or ""
    toks = [t for t in re.split(TOKEN_SPLIT_RE, s.lower()) if t]
    ln = [x for x in (l.strip(" ") for l in s.split("\n")) if x]
    pg = [x for x in (p.strip(" ") for p in re.split("\n{2,}", s)) if x]

    def dup_frac(a: list) -> float:
        return 0.0 if not a else (len(a) - len(set(a))) / len(a)

    def chars(a) -> int:
        return sum(len(x) for x in a)

    def dup_chars_frac(a: list) -> float:
        tot = chars(a)
        return 0.0 if tot == 0 else (tot - chars(set(a))) / tot

    T = len(toks)
    pre = [0] * (T + 1)  # prefix sums of token char lengths
    for i, t in enumerate(toks):
        pre[i + 1] = pre[i] + len(t)
    tc = pre[T]
    tok_counts = Counter(toks)
    # positions whose token repeats — the only spots a repeated gram can start
    cand = [i for i, t in enumerate(toks) if tok_counts[t] >= 2]
    out = {
        "n_tokens": T,
        "frac_dup_lines": dup_frac(ln),
        "frac_dup_paragraphs": dup_frac(pg),
        "frac_chars_dup_lines": dup_chars_frac(ln),
        "frac_chars_dup_paragraphs": dup_chars_frac(pg),
    }
    for n in _REP_TOP_NS:
        v = 0.0
        if T >= n and tc:
            c = Counter(
                tuple(toks[i : i + n]) for i in cand if i + n <= T
            )
            mx = max(c.values(), default=0)
            if mx >= 2:
                best = max(
                    pre[i + n] - pre[i]
                    for i in cand
                    if i + n <= T and c[tuple(toks[i : i + n])] == mx
                )
                v = (mx * best) / tc
        out[f"frac_chars_top_{n}gram"] = v
    for n in _REP_DUP_NS:
        v = 0.0
        if T >= n and tc:
            c = Counter(
                tuple(toks[i : i + n]) for i in cand if i + n <= T
            )
            covered, last = 0, 0
            for i in cand:
                if i + n <= T and c[tuple(toks[i : i + n])] >= 2:
                    p = i + 1  # 1-based, matching the expr fold
                    frm, to = max(p, last + 1), p + n - 1
                    if to >= frm:
                        covered += pre[to] - pre[frm - 1]
                    last = to
            v = covered / tc
        out[f"frac_chars_dup_{n}gram"] = v
    return out


def _gopher_repetition_arrow(
    docs: DataFrame, id_col: str, text_col: str, carry: tuple
) -> DataFrame:
    """Arrow-batched signal computation (Counter-based, O(T) per doc per
    n). The expr path's 13 fold expressions in one projection overflow
    the whole-stage-codegen method limit and fall back to INTERPRETED
    evaluation (~560 us/doc measured at 20k docs); this path replays the
    identical integer definitions in Python and is the scale default —
    the minhash/simhash method="arrow" precedent, bit-equality pinned by
    tests. (Residual caveat: str.lower() vs Spark lower() can differ on
    exotic unicode case mappings; identical on ASCII and normal text.)"""
    from pyspark.sql.functions import pandas_udf

    names = _REP_SIG_FIELDS.replace(" bigint", "").replace(" double", "").split(", ")

    def _sig(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_rep_signals_py(s) for s in col], columns=names
        )

    udf = pandas_udf(_sig, _REP_SIG_FIELDS)
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        udf(F.coalesce(F.col(text_col), F.lit(""))).alias("_s"),
    ).select(id_col, *carry, "_s.*")



def gopher_repetition_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: tuple[tuple[str, float], ...] = GOPHER_REP_THRESHOLDS,
    method: str = "arrow",
    carry: tuple = (),
) -> DataFrame:
    """The complete Gopher REPETITION rule set (Rae et al. 2021, Table
    A1 section A1.2) as one zero-shuffle projection chain: per document,

    - ``frac_dup_lines`` / ``frac_dup_paragraphs``: occurrences beyond
      the first, over non-blank trimmed lines / blank-line-separated
      paragraphs;
    - ``frac_chars_dup_lines`` / ``frac_chars_dup_paragraphs``: chars in
      those repeated occurrences over total line/paragraph chars;
    - ``frac_chars_top_{2,3,4}gram``: token chars covered by the most
      frequent n-gram (count x gram token chars) over total token chars
      — zero unless that gram occurs at least twice (a count-1 gram is
      not repetition; without the guard every short natural sentence
      flags on its longest bigram);
    - ``frac_chars_dup_{5..10}gram``: token chars covered by ANY n-gram
      occurring more than once — position coverage, overlaps counted
      once (the interval-union fold in _rep_dup_chars_sql);

    plus the paper's thresholds as a first-failing ``verdict``.

    Cross-engine exactness: every numerator/denominator is an exact
    BIGINT and each fraction is ONE IEEE division (the repetition_signals
    discipline), so the frame hash-matches the DuckDB oracle, which
    replays the same definitions as O(n^2) list comprehensions
    (correctness, not shape — o_repetition_cols precedent).

    Scale shape: ZERO SHUFFLE on both paths — the corpus never moves.
    ``method="arrow"`` (default): one Arrow-batched pandas_udf replaying
    the identical integer definitions (Counter per n, interval-union
    coverage) — the scale path, because the expr path's 13 fold
    expressions in one projection overflow the codegen method limit and
    fall back to interpreted evaluation (measured 25x slower; see
    _gopher_repetition_arrow). ``method="expr"``: pure row-local array
    algebra — sort-adjacency duplicate detection (O(G log G), never a
    G x dups membership probe), interval-union coverage folds —
    bit-equal to the arrow path (pinned by tests) and to the oracle.
    Intermediate arrays are materialized as projection-stage columns so
    CollapseProject cannot re-inline their builders (the curate_crawl
    25x lesson)."""
    if method not in ("arrow", "expr"):
        raise ValueError(f"unknown repetition method: {method!r}")
    names = [s for s, _ in thresholds]
    reserved = {id_col, "n_tokens", "verdict", *names}
    clash = [c for c in carry if c in reserved]
    if clash:
        raise ValueError(
            f"gopher_repetition_rules: carry column(s) {clash} collide "
            f"with the output columns {sorted(reserved)} — rename first"
        )
    if method == "arrow":
        sig = _gopher_repetition_arrow(docs, id_col, text_col, carry)
        return _rep_attach_verdict(sig, thresholds)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    s1 = docs.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        # tokenize the coalesced text: a NULL document must yield an
        # EMPTY token array (NULL would poison every downstream size/fold)
        tokens_expr(f"coalesce({text_col}, '')").alias("_tk"),
        F.filter(
            F.transform(F.split(txt, "\\n"), lambda l: F.trim(l)),
            lambda l: l != F.lit(""),
        ).alias("_ln"),
        F.filter(
            F.transform(F.split(txt, PARA_SPLIT_RE), lambda p: F.trim(p)),
            lambda p: p != F.lit(""),
        ).alias("_pg"),
    )
    s2 = s1.select(
        id_col,
        *carry,
        "_tk",
        "_ln",
        "_pg",
        *[
            F.expr(_rep_grams_sql("_tk", n)).alias(f"_g{n}")
            for n in (*_REP_TOP_NS, *_REP_DUP_NS)
        ],
    )

    def _dup_frac(arr: str) -> Column:
        n = F.size(arr).cast("bigint")
        nd = F.size(F.array_distinct(F.col(arr))).cast("bigint")
        return (
            F.when(n == 0, F.lit(0.0))
            .otherwise((n - nd).cast("double") / n.cast("double"))
        )

    def _chars(arr: str) -> Column:
        return F.aggregate(
            arr, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
        )

    def _dup_chars_frac(arr: str) -> Column:
        tot = _chars(arr)
        dist = F.aggregate(
            F.array_distinct(F.col(arr)),
            F.lit(0).cast("bigint"),
            lambda a, x: a + F.length(x),
        )
        return (
            F.when(tot == 0, F.lit(0.0))
            .otherwise((tot - dist).cast("double") / tot.cast("double"))
        )

    tok_chars = _chars("_tk")
    zero = F.lit(0.0)

    def _gram_frac(expr_sql: str) -> Column:
        return (
            F.when(tok_chars == 0, zero)
            .otherwise(
                F.expr(expr_sql).cast("double") / tok_chars.cast("double")
            )
        )

    sig = s2.select(
        id_col,
        *carry,
        F.size("_tk").cast("bigint").alias("n_tokens"),
        _dup_frac("_ln").alias("frac_dup_lines"),
        _dup_frac("_pg").alias("frac_dup_paragraphs"),
        _dup_chars_frac("_ln").alias("frac_chars_dup_lines"),
        _dup_chars_frac("_pg").alias("frac_chars_dup_paragraphs"),
        *[
            _gram_frac(_rep_top_chars_sql(f"_g{n}", n)).alias(
                f"frac_chars_top_{n}gram"
            )
            for n in _REP_TOP_NS
        ],
        *[
            _gram_frac(_rep_dup_chars_sql("_tk", f"_g{n}", n)).alias(
                f"frac_chars_dup_{n}gram"
            )
            for n in _REP_DUP_NS
        ],
    )
    return _rep_attach_verdict(sig, thresholds)


def _rep_attach_verdict(
    sig: DataFrame, thresholds: tuple[tuple[str, float], ...]
) -> DataFrame:
    verdict = None
    for name, thr in thresholds:
        cond = F.when(F.col(name) > thr, F.lit(name))
        verdict = cond if verdict is None else verdict.when(
            F.col(name) > thr, F.lit(name)
        )
    verdict = (
        verdict.otherwise(F.lit("kept")) if verdict is not None else F.lit("kept")
    )
    return sig.withColumn("verdict", verdict)


def o_gopher_repetition_sql(source: str = "documents") -> str:
    """Full DuckDB mirror of ``gopher_repetition_rules`` at the default
    thresholds: same trimmed-line / paragraph splits, same gram
    construction, same most-frequent-gram tie-break (max count, then max
    char length), same position-coverage duplicated-gram semantics —
    replayed as O(n^2) list comprehensions (the o_repetition_cols
    precedent: the oracle buys correctness, not the zero-shuffle
    shape). Every numerator/denominator is an exact BIGINT; each
    fraction is ONE IEEE division of identical operands."""
    from weather_monitoring_spark.functions.text import o_tokens

    def chars(a: str) -> str:
        return (
            f"coalesce(list_sum(list_transform({a}, "
            f"el -> CAST(length(el) AS BIGINT))), 0)"
        )

    def dup_frac(a: str) -> str:
        return (
            f"CASE WHEN len({a}) = 0 THEN 0.0 ELSE "
            f"CAST(len({a}) - len(list_distinct({a})) AS DOUBLE)"
            f" / CAST(len({a}) AS DOUBLE) END"
        )

    def dup_chars_frac(a: str) -> str:
        tot, dist = chars(a), chars(f"list_distinct({a})")
        return (
            f"CASE WHEN {tot} = 0 THEN 0.0 ELSE "
            f"CAST({tot} - {dist} AS DOUBLE) / CAST({tot} AS DOUBLE) END"
        )

    def top_frac(g: str, n: int) -> str:
        mx = (
            f"list_max(list_transform(list_distinct({g}), "
            f"u -> CAST(len(list_filter({g}, x -> x = u)) AS BIGINT)))"
        )
        bestcl = (
            f"list_max(list_transform(list_filter(list_distinct({g}), "
            f"u -> CAST(len(list_filter({g}, x -> x = u)) AS BIGINT) = {mx}), "
            f"u -> CAST(length(u) - {n - 1} AS BIGINT)))"
        )
        return (
            f"CASE WHEN tc = 0 OR coalesce({mx}, 0) < 2 THEN 0.0 ELSE "
            f"CAST(coalesce({mx} * {bestcl}, 0) AS DOUBLE)"
            f" / CAST(tc AS DOUBLE) END"
        )

    def dup_gram_frac(g: str, n: int) -> str:
        covered = (
            f"coalesce(list_sum(list_transform(range(1, len(tk) + 1), "
            f"j -> CASE WHEN len(list_filter("
            f"range(greatest(1, j - {n} + 1), least(j, len({g})) + 1), "
            f"i -> len(list_filter({g}, x -> x = {g}[i])) >= 2)) > 0 "
            f"THEN CAST(length(tk[j]) AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)), 0)"
        )
        return (
            f"CASE WHEN tc = 0 THEN 0.0 ELSE "
            f"CAST({covered} AS DOUBLE) / CAST(tc AS DOUBLE) END"
        )

    gram_defs = ", ".join(
        f"list_transform(range(1, greatest(len(tk) - {n} + 1, 0) + 1), "
        f"i -> array_to_string(tk[i:i+{n - 1}], ' ')) AS g{n}"
        for n in (*_REP_TOP_NS, *_REP_DUP_NS)
    )
    sig_cols = [
        "CAST(len(tk) AS BIGINT) AS n_tokens",
        f"{dup_frac('ln')} AS frac_dup_lines",
        f"{dup_frac('pg')} AS frac_dup_paragraphs",
        f"{dup_chars_frac('ln')} AS frac_chars_dup_lines",
        f"{dup_chars_frac('pg')} AS frac_chars_dup_paragraphs",
        *[
            f"{top_frac(f'g{n}', n)} AS frac_chars_top_{n}gram"
            for n in _REP_TOP_NS
        ],
        *[
            f"{dup_gram_frac(f'g{n}', n)} AS frac_chars_dup_{n}gram"
            for n in _REP_DUP_NS
        ],
    ]
    verdict = " ".join(
        f"WHEN {name} > {thr} THEN '{name}'"
        for name, thr in GOPHER_REP_THRESHOLDS
    )
    return f"""
        WITH base AS (
            SELECT doc_id,
                   {o_tokens("coalesce(text, '')")} AS tk,
                   list_filter(list_transform(
                       regexp_split_to_array(coalesce(text, ''), '\\n'),
                       l -> trim(l)), l -> l <> '') AS ln,
                   list_filter(list_transform(
                       regexp_split_to_array(coalesce(text, ''),
                           '{PARA_SPLIT_RE}'),
                       p -> trim(p)), p -> p <> '') AS pg
            FROM {source}
        ), grams AS (
            SELECT *, {chars('tk')} AS tc, {gram_defs}
            FROM base
        ), sig AS (
            SELECT doc_id, {', '.join(sig_cols)}
            FROM grams
        )
        SELECT *, CASE {verdict} ELSE 'kept' END AS verdict
        FROM sig
    """

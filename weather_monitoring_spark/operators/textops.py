"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, fingerprinting.

All pure column algebra over the shared deterministic tokenization
(functions/text.py) — each operator is one projection (no shuffle at all),
so at 100 TB these run at parquet-scan speed and stack into a single
whole-stage-codegen pass when composed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import h32_sql, tokens_expr

#: Tiny per-language stopword lexicons for the n-gram-free heuristic
#: language identifier. Order = deterministic tie-break priority.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "es": ("el", "la", "de", "que", "y", "los", "es"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "les", "des", "et", "une", "est", "que"),
}

#: Simplified byte-pair-ish token pattern: letter runs, digit runs, or
#: single non-space symbols — a deterministic proxy for BPE token counts.
#: (Single-backslash form — what the regex engine must see. Spark SQL
#: string literals consume one level of backslash escaping, DuckDB's do
#: not, so Spark-side embeddings double the backslashes first.)
BPE_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
BPE_TOKEN_RE_SPARK_SQL = BPE_TOKEN_RE.replace("\\", "\\\\")

#: CJK detection (zh heuristic): any Han-block codepoint.
HAN_RE_SPARK_SQL = "[\\\\x{4e00}-\\\\x{9fff}]"


def _lex_hits(tokens_col: str, lang: str) -> str:
    lex = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
    return f"size(filter({tokens_col}, t -> t IN ({lex})))"


def _lang_pred_cond(text_ref: str) -> Column:
    """The language-vote CASE over hits_<lang> columns + Han detection on
    ``text_ref`` — shared by lang_id and lang_fingerprints."""
    cond = F.when(F.expr(f"{text_ref} RLIKE '{HAN_RE_SPARK_SQL}'"), F.lit("zh"))
    langs = list(LANG_LEXICONS)
    zero_all = None
    for lang in langs:
        c = F.col(f"hits_{lang}") == 0
        zero_all = c if zero_all is None else (zero_all & c)
    cond = cond.when(zero_all, F.lit("und"))
    for i, lang in enumerate(langs):
        geq = None
        for other in langs[i + 1 :]:
            c = F.col(f"hits_{lang}") >= F.col(f"hits_{other}")
            geq = c if geq is None else (geq & c)
        cond = cond.when(geq if geq is not None else F.lit(True), F.lit(lang))
    return cond


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: Han characters -> zh, else the language with
    the most stopword hits (priority order breaks ties), 'und' if none.

    (id, pred_lang, plus the per-language hit counts for debuggability.)"""
    df = docs.withColumn("_tk", tokens_expr(text_col))
    hit_cols = {
        lang: F.expr(_lex_hits("_tk", lang)).cast("bigint").alias(f"hits_{lang}")
        for lang in LANG_LEXICONS
    }
    df = df.select(F.col(id_col), F.col(text_col).alias("_text"), *hit_cols.values())
    return df.select(
        F.col(id_col),
        _lang_pred_cond("_text").alias("pred_lang"),
        *[F.col(f"hits_{lang}") for lang in LANG_LEXICONS],
    )


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, token counts, char-class ratios,
    stopword ratio. One projection, no shuffle."""
    df = docs.withColumn("_tk", tokens_expr(text_col))
    n_chars = F.length(text_col).cast("bigint")
    n_tokens = F.size("_tk").cast("bigint")
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).cast("bigint")
    digits = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")).cast("bigint")
    spaces = F.length(F.regexp_replace(F.col(text_col), "[^ ]", "")).cast("bigint")
    en_hits = F.expr(_lex_hits("_tk", "en")).cast("bigint")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        alpha.alias("n_alpha"),
        digits.alias("n_digit"),
        (n_chars - alpha - digits - spaces).alias("n_symbol"),
        (alpha * F.lit(1.0) / n_chars).alias("alpha_ratio"),
        (F.length(F.array_join(F.col("_tk"), "")) * F.lit(1.0) / n_tokens).alias(
            "avg_token_len"
        ),
        (en_hits * F.lit(1.0) / n_tokens).alias("stopword_ratio"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (the budget metric
    for LLM training pipelines)."""
    return docs.select(
        F.col(id_col),
        F.size(F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')"))
        .cast("bigint")
        .alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '{BPE_TOKEN_RE_SPARK_SQL}', 0)"))
        .cast("bigint")
        .alias("bpe_tokens"),
    )


def text_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality-scoring features + token budgets in ONE projection (the
    composition of text_stats and token_counts without a join — at 100 TB
    annotation passes should stack into a single whole-stage-codegen scan,
    never self-join the corpus)."""
    df = docs.withColumn("_tk", tokens_expr(text_col))
    n_chars = F.length(text_col).cast("bigint")
    n_tokens = F.size("_tk").cast("bigint")
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).cast("bigint")
    digits = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")).cast("bigint")
    spaces = F.length(F.regexp_replace(F.col(text_col), "[^ ]", "")).cast("bigint")
    en_hits = F.expr(_lex_hits("_tk", "en")).cast("bigint")
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        alpha.alias("n_alpha"),
        digits.alias("n_digit"),
        (n_chars - alpha - digits - spaces).alias("n_symbol"),
        (alpha * F.lit(1.0) / n_chars).alias("alpha_ratio"),
        (F.length(F.array_join(F.col("_tk"), "")) * F.lit(1.0) / n_tokens).alias(
            "avg_token_len"
        ),
        (en_hits * F.lit(1.0) / n_tokens).alias("stopword_ratio"),
        F.size(F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')"))
        .cast("bigint")
        .alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '{BPE_TOKEN_RE_SPARK_SQL}', 0)"))
        .cast("bigint")
        .alias("bpe_tokens"),
    )


def lang_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document metadata annotation: language ID votes + the three
    fingerprints, again as one projection (no join between the two
    annotation families)."""
    df = docs.withColumn("_tk", tokens_expr(text_col))
    hit_cols = {
        lang: F.expr(_lex_hits("_tk", lang)).cast("bigint").alias(f"hits_{lang}")
        for lang in LANG_LEXICONS
    }
    rolling = F.expr(
        f"aggregate(_tk, CAST(0 AS BIGINT),"
        f" (acc, t) -> pmod(acc * 31 + {h32_sql('fp', 't')}, 2147483647))"
    )
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("_text"),
        F.col("_tk"),
        *hit_cols.values(),
    )
    return staged.select(
        F.col(id_col),
        _lang_pred_cond("_text").alias("pred_lang"),
        *[F.col(f"hits_{lang}") for lang in LANG_LEXICONS],
        F.md5(F.col("_text")).alias("fp_exact"),
        F.md5(F.array_join(F.col("_tk"), " ")).alias("fp_normalized"),
        rolling.alias("fp_rolling"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of raw text (exact identity), md5 of the
    normalized token stream (whitespace/punct-insensitive identity), and a
    31-polynomial rolling hash of the token hash stream (order-sensitive,
    cheap to update incrementally)."""
    df = docs.withColumn("_tk", tokens_expr(text_col))
    rolling = F.expr(
        f"aggregate({'_tk'}, CAST(0 AS BIGINT),"
        f" (acc, t) -> pmod(acc * 31 + {h32_sql('fp', 't')}, 2147483647))"
    )
    return df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("fp_exact"),
        F.md5(F.array_join(F.col("_tk"), " ")).alias("fp_normalized"),
        rolling.alias("fp_rolling"),
    )


def doc_annotations(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The full metadata annotation pass — quality features, token
    budgets, language votes, and all three fingerprints — in ONE
    projection. At 100 TB every annotation family stacks into the same
    whole-stage-codegen scan; the corpus is read once and never joined
    against itself."""
    df = docs.withColumn("_tk", tokens_expr(text_col))
    n_chars = F.length(text_col).cast("bigint")
    n_tokens = F.size("_tk").cast("bigint")
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).cast("bigint")
    digits = F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")).cast("bigint")
    spaces = F.length(F.regexp_replace(F.col(text_col), "[^ ]", "")).cast("bigint")
    en_hits = F.expr(_lex_hits("_tk", "en")).cast("bigint")
    hit_cols = {
        lang: F.expr(_lex_hits("_tk", lang)).cast("bigint").alias(f"hits_{lang}")
        for lang in LANG_LEXICONS
    }
    rolling = F.expr(
        f"aggregate(_tk, CAST(0 AS BIGINT),"
        f" (acc, t) -> pmod(acc * 31 + {h32_sql('fp', 't')}, 2147483647))"
    )
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("_text"),
        F.col("_tk"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        alpha.alias("n_alpha"),
        digits.alias("n_digit"),
        (n_chars - alpha - digits - spaces).alias("n_symbol"),
        (alpha * F.lit(1.0) / n_chars).alias("alpha_ratio"),
        (F.length(F.array_join(F.col("_tk"), "")) * F.lit(1.0) / n_tokens).alias(
            "avg_token_len"
        ),
        (en_hits * F.lit(1.0) / n_tokens).alias("stopword_ratio"),
        F.size(F.expr(f"filter(split({text_col}, '\\\\s+'), t -> t != '')"))
        .cast("bigint")
        .alias("ws_tokens"),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), '{BPE_TOKEN_RE_SPARK_SQL}', 0)"))
        .cast("bigint")
        .alias("bpe_tokens"),
        *hit_cols.values(),
        rolling.alias("fp_rolling"),
    )
    return staged.select(
        F.col(id_col),
        "n_chars",
        "n_tokens",
        "n_alpha",
        "n_digit",
        "n_symbol",
        "alpha_ratio",
        "avg_token_len",
        "stopword_ratio",
        "ws_tokens",
        "bpe_tokens",
        _lang_pred_cond("_text").alias("pred_lang"),
        *[F.col(f"hits_{lang}") for lang in LANG_LEXICONS],
        F.md5(F.col("_text")).alias("fp_exact"),
        F.md5(F.array_join(F.col("_tk"), " ")).alias("fp_normalized"),
        F.col("fp_rolling"),
    )


#: Top-k terms to keep per document in tfidf_topk.
TFIDF_TOP_K = 5


def tfidf_topk(
    docs: DataFrame,
    k: int = TFIDF_TOP_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k terms by TF-IDF. Returns
    (doc_id, token, tf, df, score, term_rank), term_rank 1..k.

    Scoring definition (engine-portable): ``score = tf * (N / df)`` with
    N = corpus document count — the raw inverse document frequency, NOT
    ``log(N/df)``: transcendental functions are not bit-stable across
    engines (libm vs Java Math differ in the last ulp) while IEEE-754
    divide/multiply are correctly rounded everywhere, so this definition
    is exactly reproducible on any engine. Ties rank deterministically by
    (score desc, token asc).

    Scale shape: one shuffle to (doc, token) term counts (map-side
    partials collapse repeats), one vocabulary aggregation, an equi-join
    back on token, and a per-document window whose partitions are a
    document's distinct tokens — never larger than the document. The
    vocabulary join stays a shuffle join on purpose: a web-scale corpus
    vocabulary (typos, numbers) is NOT reliably broadcastable; AQE may
    still convert it when the measured vocab is small."""
    from pyspark.sql import Window

    # N rides the job as a broadcast 1-row aggregate (same policy as the
    # dedup/winnow df cutoffs): an eager docs.count() here would be an
    # extra full corpus pass before the real work at 100 TB. The oracle's
    # scalar subquery (SELECT count(*) FROM documents) is likewise lazy.
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_expr(text_col)).alias("token")
    )
    # Pin the term-count table: both the vocabulary aggregation and the
    # scored join consume it — without the pin the tokenize+explode+agg
    # pass over the full corpus runs twice.
    tf = (
        tok.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("_n_docs") / F.col("df").cast("double")),
        )
        .drop("_n_docs")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= k)
        .select("doc_id", "token", "tf", "df", "score", "term_rank")
    )


def corpus_report(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-source corpus report — the summary artifact a pipeline
    publishes with every data drop: document/token/char volumes,
    language spread, and the largest document, one row per source.

    One aggregation over one scan (token counts are computed inside the
    scan projection; the group count is the number of sources, so the
    shuffle moves a handful of partial rows per task). The mean is a
    division of two exact BIGINTs — correctly rounded IEEE, bit-stable
    cross-engine."""
    sized = docs.select(
        F.col(group_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.length(text_col).cast("long").alias("_chars"),
        F.size(tokens_expr(text_col)).cast("long").alias("_toks"),
    )
    return sized.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_chars").cast("long").alias("n_chars"),
        F.sum("_toks").cast("long").alias("n_tokens"),
        F.count_distinct("lang").cast("long").alias("n_langs"),
        F.max("_toks").cast("long").alias("max_doc_tokens"),
        (
            F.sum("_chars").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("chars_per_doc"),
    )


#: Drop bigrams seen fewer than this many times in bigram_lm (noise floor;
#: 1 keeps everything).
BIGRAM_MIN_COUNT = 1


def bigram_lm(
    docs: DataFrame,
    min_count: int = BIGRAM_MIN_COUNT,
    text_col: str = "text",
) -> DataFrame:
    """Corpus bigram language-model count table (the KenLM-style artifact
    behind perplexity-based quality filtering): for every adjacent token
    pair, its corpus count, its context count, and the conditional MLE
    probability. Returns (w1, w2, c_pair, c_ctx, p) with counts BIGINT
    and ``p = c_pair / c_ctx`` — a single IEEE divide of two exact
    integers, so the table is bit-identical on any engine (no log-space
    smoothing here for exactly that reason; downstream scorers can take
    logs in their own numeric domain).

    Scale shape: pairs explode map-side inside the scan projection; ONE
    shuffle aggregates (w1, w2) with map-side partial counts. The context
    count is a reaggregation OF THE PAIR TABLE (vocab-bounded, tiny next
    to the corpus), joined back on w1 — a shuffle join on purpose, since
    a web-scale vocabulary is not reliably broadcastable; AQE converts it
    when the measured side is small."""
    pairs = (
        docs.select(tokens_expr(text_col).alias("_tk"))
        .filter(F.size("_tk") > 1)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_tk) - 1),"
                    " i -> struct(_tk[i-1] AS w1, _tk[i] AS w2))"
                )
            ).alias("s")
        )
        .select("s.w1", "s.w2")
    )
    # Pin the pair table: both the context reaggregation and the final
    # join consume it — without the pin the tokenize+explode+agg pass
    # over the full corpus runs twice (same pattern as tfidf_topk's tf
    # table).
    c_pair = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_pair"))
        .localCheckpoint(eager=False)
    )
    c_ctx = c_pair.groupBy("w1").agg(F.sum("c_pair").cast("long").alias("c_ctx"))
    return (
        c_pair.join(c_ctx, "w1")
        .filter(F.col("c_pair") >= min_count)
        .select(
            "w1",
            "w2",
            "c_pair",
            "c_ctx",
            (F.col("c_pair").cast("double") / F.col("c_ctx").cast("double")).alias("p"),
        )
    )


def lm_score(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a bigram LM count table (``bigram_lm``'s
    output, typically built on a held-out reference corpus): the
    perplexity-filter stage of corpus curation, kept in exact integer
    arithmetic so it's bit-identical cross-engine. Per document:

    - ``n_bigrams``  — adjacent token pairs, with multiplicity (BIGINT);
    - ``n_known``    — pairs present in the LM table (BIGINT);
    - ``known_frac`` — ``n_known / n_bigrams``, ONE IEEE divide of two
      exact integers (correctly rounded, hence bit-stable — the reason
      this scores coverage instead of summing log-probs, which would
      accumulate order-dependent float error);
    - ``c_evidence`` — total corpus count mass behind the document's
      known pairs (BIGINT; higher = more conventional text).

    Low ``known_frac`` ≈ high perplexity: gibberish, boilerplate markup,
    or out-of-domain text. Documents with < 2 tokens have no bigrams and
    are excluded (mirror of ``bigram_lm``'s own filter).

    Scale shape: bigrams explode map-side inside the scan; ONE shuffle
    join on (w1, w2) against the vocab-bounded LM table (AQE broadcasts
    it when small — a web-scale vocabulary is not reliably
    broadcastable, so the plan declares a plain equi-join); the per-doc
    aggregation shuffles (doc_id, 1, flag, count) tuples with map-side
    partials — documents themselves never cross the wire."""
    bi = (
        docs.select(F.col(id_col), tokens_expr(text_col).alias("_tk"))
        .filter(F.size("_tk") > 1)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_tk) - 1),"
                    " i -> struct(_tk[i-1] AS w1, _tk[i] AS w2))"
                )
            ).alias("_b"),
        )
        .select(id_col, "_b.w1", "_b.w2")
    )
    scored = bi.join(lm.select("w1", "w2", "c_pair"), ["w1", "w2"], "left")
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.count("c_pair").cast("long").alias("n_known"),
        (
            F.count("c_pair").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("known_frac"),
        F.sum(F.coalesce("c_pair", F.lit(0))).cast("long").alias("c_evidence"),
    )


#: Control characters stripped by normalize_text: C0 controls except
#: tab/newline/carriage-return (which are whitespace-normalized instead),
#: plus DEL. Hex escapes are in the RE2 ∩ Java-regex common subset, so
#: the DuckDB oracle runs the identical pattern string.
CTRL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

#: Horizontal whitespace runs (spaces/tabs) collapse to one space;
#: CR and CRLF normalize to LF first.
HWS_RUN_RE = "[ \\t]+"


def _unicode_normalize_udf(unicode_form: str):
    """Arrow-batched pandas_udf applying ``unicodedata.normalize``.

    Built lazily (only the opt-in path pays the pandas import); the form
    name is validated eagerly so a typo fails before any job runs."""
    import unicodedata

    import pandas  # noqa: F401 — resolves the annotations below

    from pyspark.sql.functions import pandas_udf

    # Validate the form name eagerly (must be non-empty text: CPython
    # short-circuits empty strings before checking the form).
    unicodedata.normalize(unicode_form, "a")

    def _norm(s: "pandas.Series") -> "pandas.Series":
        return s.map(
            lambda x: unicodedata.normalize(unicode_form, x)
            if x is not None
            else None
        )

    _norm.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    return pandas_udf(_norm, "string")


# NOTE (r12, measured): the charset-routing gate (null the udf input
# for pure-ASCII rows, which are invariant under every normalization
# form) was tried here and measured a WASH at 0.96x on a 1.5 GB
# 90%-ASCII corpus (interleaved best-of-5, local[32]):
# unicodedata.normalize's no-change path is already a C-fast
# quick-check, so the JVM rlike('[^\\x00-\\x7F]') full-text scan costs
# exactly what the skipped Arrow byte shipping saves. Gate only
# crossings whose Python side does real per-row work on clean rows
# (charset ladder: 1.38x; mojibake full repair: 1.31x).


def normalize_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unicode_form: str | None = None,
) -> DataFrame:
    """Crawl-text normalization — the first transform a raw corpus sees:
    strip C0/DEL control characters, normalize CR/CRLF to LF, collapse
    horizontal-whitespace runs to one space, trim line edges and document
    edges. Returns (id, text_norm, n_chars_raw, n_chars_norm), counts
    BIGINT. Line structure (LF) is preserved for the downstream line
    operators (operators/lines.py).

    Unicode canonicalization is OFF by default: no JVM-side builtin
    exposes it, so it costs an Arrow-batched pandas_udf on the hottest
    path in the pipeline — the default regex passes stay whole-stage
    codegen, one projection, zero shuffle at any corpus size. A real
    crawl pipeline usually wants NFC, so ``unicode_form="NFC"`` (or
    NFKC/NFD/NFKD) opts in: the canonicalization runs FIRST (combining
    marks can otherwise straddle the regex passes), vectorized per Arrow
    batch, and ``n_chars_raw`` still counts the pre-normalization text.
    """
    t = F.col(text_col)
    if unicode_form is not None:
        t = _unicode_normalize_udf(unicode_form)(t)
    cleaned = F.regexp_replace(t, "\\r\\n|\\r", "\n")
    cleaned = F.regexp_replace(cleaned, CTRL_RE, "")
    cleaned = F.regexp_replace(cleaned, HWS_RUN_RE, " ")
    # trim around line breaks, then the document ends
    cleaned = F.regexp_replace(cleaned, " ?\\n ?", "\n")
    cleaned = F.trim(cleaned)
    return docs.select(
        F.col(id_col),
        cleaned.alias("text_norm"),
        F.length(F.col(text_col)).cast("long").alias("n_chars_raw"),
        F.length(cleaned).cast("long").alias("n_chars_norm"),
    )


def o_normalize_text(text_col: str = "text") -> str:
    """DuckDB fragment computing the identical normalization (same
    pattern strings, global replace)."""
    c = f"regexp_replace({text_col}, '\\r\\n|\\r', chr(10), 'g')"
    c = f"regexp_replace({c}, '{CTRL_RE}', '', 'g')"
    c = f"regexp_replace({c}, '{HWS_RUN_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, ' ?\\n ?', chr(10), 'g')"
    return f"trim({c})"


# ---------------- mojibake repair (encoding-damage cleanup) ----------------
#
# Crawl corpora are full of UTF-8 text that was decoded as windows-1252
# somewhere upstream ("â€™" where "’" was meant — 'mojibake'). The repair
# is mechanical: the damaged form IS the target's UTF-8 bytes read through
# the WHATWG windows-1252 table, so the replacement table is GENERATED
# from the target characters — it cannot drift from the encoding math.

#: WHATWG windows-1252: the five bytes cp1252 leaves undefined map to the
#: matching C1 controls (what browsers — the usual corruption site — do).
_W1252_HOLES = {0x81: "\x81", 0x8D: "\x8d", 0x8F: "\x8f", 0x90: "\x90", 0x9D: "\x9d"}


def _w1252(bs: bytes) -> str:
    out = []
    for b in bs:
        out.append(_W1252_HOLES.get(b) or bytes([b]).decode("cp1252"))
    return "".join(out)


#: The characters whose mojibake forms dominate real crawls: curly quotes,
#: dashes, ellipsis, bullet, euro/pound, (c)/(r)/degree/middot, nbsp, and
#: the common Latin-1 letters. 3-byte damage (E2/E2-80 row) sorts first so
#: a 2-byte rule can never split it.
MOJIBAKE_TARGETS: tuple[str, ...] = (
    "’", "‘", "“", "”", "–", "—",
    "…", "•", "€", "™",
    "é", "è", "á", "à", "ó", "í",
    "ú", "ñ", "ü", "ö", "ä", "ç",
    "ß", "£", "©", "®", "°", "·",
    " ",
)

#: (damaged, repaired) pairs, longest damaged form first.
MOJIBAKE_TABLE: tuple[tuple[str, str], ...] = tuple(
    sorted(
        ((_w1252(t.encode("utf-8")), t) for t in MOJIBAKE_TARGETS),
        key=lambda kv: (-len(kv[0]), kv[0]),
    )
)


def fix_mojibake(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "table",
) -> DataFrame:
    """Repair windows-1252 mojibake. Returns (id, text_fixed, changed).

    ``mode="table"`` (default): one JVM-side chain of plain ``replace``
    calls over MOJIBAKE_TABLE — whole-stage codegen, zero Python, zero
    shuffle at any corpus size, and exactly mirrored by the DuckDB
    oracle (string literals shared verbatim from the generated table).

    ``mode="full"``: Arrow-batched pandas_udf that finds suspect runs
    (a regex over the windows-1252 images of UTF-8 lead/continuation
    bytes) and repairs each run by the actual byte round-trip
    encode(w1252) -> decode(utf-8), leaving the run untouched unless
    the bytes are valid UTF-8 — handles ANY damaged code point
    (CJK, emoji, combining marks), not just the table. No SQL form
    (the unicode_form / entities="full" precedent), so it is
    pytest-guaranteed, not oracle-checked; the default path stays
    zero-Python on the hot pipeline."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    fixed = mojibake_fixed_col(raw, mode=mode)
    return docs.select(
        F.col(id_col),
        fixed.alias("text_fixed"),
        (fixed != raw).alias("changed"),
    )


def mojibake_fixed_col(raw: Column, mode: str = "table") -> Column:
    """The repair as a composable Column (pipelines.curate_crawl applies
    it in place of a join-back): see fix_mojibake for the two modes."""
    if mode not in ("table", "full"):
        raise ValueError(f"mode must be 'table' or 'full', got {mode!r}")
    if mode == "table":
        fixed = raw
        for bad, good in MOJIBAKE_TABLE:
            fixed = F.replace(fixed, F.lit(bad), F.lit(good))
        return fixed
    # Two-phase (the r12 charset-routing pattern): the full repair can
    # only change text containing a RUN LEAD character — the cp1252
    # image of a UTF-8 lead byte C2-F4, which maps identically to
    # U+00C2-U+00F4 (cp1252 is identity over C0-FF). Text without one
    # is returned unchanged by the regex sub, so a JVM codegen
    # predicate routes it around the Arrow crossing entirely; only
    # suspect rows' bytes reach Python. Byte-identical by construction
    # (differential-pinned in tests).
    suspect = raw.rlike("[\\xC2-\\xF4]")
    return F.coalesce(_fix_mojibake_udf()(F.when(suspect, raw)), raw)


def _fix_mojibake_udf():
    """Arrow-batched full repair: see fix_mojibake(mode='full')."""
    import re

    from pyspark.sql.functions import pandas_udf

    # windows-1252 images of: UTF-8 lead bytes C2-F4 then continuation
    # bytes 80-BF (through the WHATWG table, incl. the C1 holes).
    lead = "".join(_w1252(bytes([b])) for b in range(0xC2, 0xF5))
    cont = "".join(_w1252(bytes([b])) for b in range(0x80, 0xC0))
    run_re = re.compile(f"[{re.escape(lead)}][{re.escape(cont)}]" "{1,3}")

    def _enc(s: str) -> bytes:
        return bytes(
            0x81 if c == "\x81" else 0x8D if c == "\x8d" else
            0x8F if c == "\x8f" else 0x90 if c == "\x90" else
            0x9D if c == "\x9d" else c.encode("cp1252")[0]
            for c in s
        )

    def _repair_run(m: "re.Match[str]") -> str:
        s = m.group(0)
        try:
            return _enc(s).decode("utf-8")
        except (UnicodeDecodeError, UnicodeEncodeError):
            return s

    def _fix(col):
        return col.map(lambda s: run_re.sub(_repair_run, s) if s else s)

    return pandas_udf(_fix, "string")


def o_fix_mojibake(text_col: str = "text") -> str:
    """DuckDB mirror of fix_mojibake(mode='table') — the same generated
    replacement chain, longest damaged form first."""
    c = f"coalesce({text_col}, '')"
    for bad, good in MOJIBAKE_TABLE:
        b = bad.replace("'", "''")
        g = good.replace("'", "''")
        c = f"replace({c}, '{b}', '{g}')"
    return c

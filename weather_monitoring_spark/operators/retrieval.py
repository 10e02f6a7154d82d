"""BM25 ranked retrieval — the reference's Elasticsearch search surface
(documents are bulk-indexed for search: ``ParquetToElasticsearch.java``,
``CentralStationServer.java``'s query endpoints) re-expressed as a
Spark-native operator over the corpus itself: score every document
against a term query and return the global top-k.

Scale shape: per-document statistics (token array, length, per-term
frequencies) are ONE zero-shuffle projection; the corpus-level stats the
formula needs (N, avgdl, per-term document frequencies) are ONE tiny
aggregate producing a single row that broadcasts back (the trim_tails
"bounds broadcast back" discipline) — the corpus itself never shuffles.
The top-k plans as TakeOrderedAndProject (per-partition heaps, no global
sort), deterministic via the (score DESC, doc_id) tie-break.

IDF variants (cross-engine exactness vs search-engine fidelity):

- ``idf="log"`` (default) — the Lucene/ES BM25 weighting
  ``ln(1 + (N - df + 0.5) / (df + 0.5))``, which equals
  ``ln(2N + 2) - ln(2df + 1)``: BOTH log arguments are exact BIGINTs,
  so ``ln`` over integers becomes a QUANTIZED literal-table function
  (the DSIR quantized-ln discipline): write k = m * 2^b with
  b = bitlength(k) - 1, floor the mantissa to BM25_LN_BUCKETS
  buckets, and look up ln(1 + i/BUCKETS) and b*ln(2) in two
  driver-built DECIMAL(28,18) literal arrays shared verbatim with the
  DuckDB oracle. Monotone in k by construction (floor preserves
  order), absolute error <= ln(1 + 1/BUCKETS) ~ 4.9e-4 — part of the
  declared score definition, and the per-engine transcendental ``ln``
  (which differs in the last ulp across engines ~1% of the time —
  measured in the DSIR work) never runs.
- ``idf="raw"`` — the ratio ``(N - df + 0.5) / (df + 0.5)`` without
  the log: per-term monotone and table-free, but CROSS-term weighting
  differs from what an ES user expects (rare terms are over-weighted
  relative to log-IDF; a multi-term top-k can order differently —
  pinned by ``test_bm25_log_vs_raw_order_differs``). Kept as the
  exactness fallback and the pre-r10 behavior.

Every other factor is an IEEE operation of exact BIGINTs in a FIXED
order, mirrored operation-for-operation by the DuckDB oracle, so
scores hash-match bit-for-bit in both variants.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import o_tokens, tokens_expr

BM25_K1 = 1.2
BM25_B = 0.75

#: Mantissa buckets for the quantized integer-ln (idf="log"): k = m*2^b,
#: m floored to 1/2048ths. Error bound ln(1 + 1/2048) ~ 4.9e-4 absolute.
BM25_LN_BUCKETS = 2048

#: Exact carrier for the quantized logs — the dsir.py LOG_DEC discipline.
_LOG_DEC = "decimal(28,18)"


def ln_mantissa_strings() -> list[str]:
    """``ln(1 + i/BUCKETS)`` for i = 0..BUCKETS-1, quantized to 18
    decimals — the mantissa half of the integer-ln table, built ONCE in
    Python so both engines consume identical literals."""
    return [
        f"{math.log(1 + i / BM25_LN_BUCKETS):.18f}"
        for i in range(BM25_LN_BUCKETS)
    ]


def ln2_multiple_strings() -> list[str]:
    """``b * ln(2)`` for b = 0..62 (every BIGINT bit position), each
    product quantized ONCE in Python — table lookup instead of a
    cross-engine decimal multiplication (whose precision/scale rules
    differ between engines)."""
    return [f"{b * math.log(2):.18f}" for b in range(63)]


def _lnq_sql(k_sql: str, mant_col: str = "_mant", ln2_col: str = "_ln2") -> str:
    """Quantized ln of the BIGINT expression ``k_sql`` (>= 1) as a Spark
    SQL fragment over the two table columns: b = length(bin(k)) - 1,
    t = (k * BUCKETS) DIV 2^b in [BUCKETS, 2*BUCKETS-1], result =
    ln2_table[b] + mantissa_table[t - BUCKETS] in exact DECIMAL."""
    b = BM25_LN_BUCKETS
    return (
        f"(element_at({ln2_col}, CAST(length(bin({k_sql})) AS INT))"
        f" + element_at({mant_col}, CAST(({k_sql}) * {b}"
        f" DIV shiftleft(CAST(1 AS BIGINT), length(bin({k_sql})) - 1)"
        f" - {b - 1} AS INT)))"
    )


def _o_lnq_sql(k_sql: str) -> str:
    """DuckDB mirror of ``_lnq_sql`` over the ``lt`` CTE's list columns
    (same literal strings, 1-based list indexing, ``//`` and ``<<``)."""
    b = BM25_LN_BUCKETS
    return (
        f"(lt.l2[CAST(length(bin({k_sql})) AS INT)]"
        f" + lt.m[CAST(({k_sql}) * {b}"
        f" // (CAST(1 AS BIGINT) << (length(bin({k_sql})) - 1))"
        f" - {b - 1} AS INT)])"
    )


def bm25_topk(
    docs: DataFrame,
    query: tuple[str, ...],
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    checkpoint: bool = True,
    idf: str = "log",
) -> DataFrame:
    """Top-``top_k`` documents for ``query`` (lowercase terms) by BM25
    (module docstring; ``idf`` selects the log/raw weighting). Returns
    (id, score, n_tokens) ordered by (score DESC, id) — only documents
    matching at least one term. Query terms must be tokens of the
    corpus tokenizer (lowercase alphanumeric); anything else can never
    match and raises.

    ``checkpoint`` (default on) pins the per-document stats frame
    (id, dl, tf_*) — NARROW integer rows, no text — so the corpus is
    scanned and tokenized ONCE: both the stats aggregate and the scoring
    pass read the pinned frame instead of re-running the tokenizer (the
    bigram_lm pin discipline). Pass False to stay fully lazy."""
    import re

    from weather_monitoring_spark.functions.text import TOKEN_SPLIT_RE

    if not query:
        raise ValueError("bm25_topk: empty query")
    if idf not in ("log", "raw"):
        raise ValueError(f"bm25_topk: idf must be 'log' or 'raw', got {idf!r}")
    bad = [t for t in query if re.search(TOKEN_SPLIT_RE, t) or not t]
    if bad:
        raise ValueError(
            f"bm25_topk: query terms {bad} are not single lowercase "
            f"alphanumeric tokens — they can never match"
        )
    # constants pre-folded in Python so both engines see the same doubles
    k1p1 = k1 + 1.0
    one_m_b = 1.0 - b

    def _tf(term: str):
        # a plain 1-arg lambda: F.filter treats a second parameter as
        # the element index, so the usual t=t default-capture trick
        # silently changes the signature
        return lambda x: x == F.lit(term)

    base = docs.select(
        F.col(id_col),
        tokens_expr(f"coalesce({text_col}, '')").alias("_tk"),
    ).select(
        id_col,
        F.size("_tk").cast("bigint").alias("dl"),
        *[
            F.size(F.filter("_tk", _tf(t))).cast("bigint").alias(f"tf_{i}")
            for i, t in enumerate(query)
        ],
    )
    if checkpoint:
        base = base.localCheckpoint(eager=True)
    stats = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint"))
            .cast("bigint")
            .alias(f"df_{i}")
            for i in range(len(query))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    if idf == "log":
        # the two literal tables ride the plan ONCE as constant array
        # columns; every per-term idf indexes them
        mant_arr = "array(" + ", ".join(
            f"CAST('{s}' AS {_LOG_DEC})" for s in ln_mantissa_strings()
        ) + ")"
        ln2_arr = "array(" + ", ".join(
            f"CAST('{s}' AS {_LOG_DEC})" for s in ln2_multiple_strings()
        ) + ")"
        scored = scored.withColumn("_mant", F.expr(mant_arr)).withColumn(
            "_ln2", F.expr(ln2_arr)
        )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    dlr = F.col("dl").cast("double") / avgdl

    def term_idf(i: int) -> Column:
        if idf == "raw":
            df = F.col(f"df_{i}").cast("double")
            return (
                (F.col("n_docs") - F.col(f"df_{i}")).cast("double")
                + F.lit(0.5)
            ) / (df + F.lit(0.5))
        # ln(1 + (N-df+0.5)/(df+0.5)) = ln(2N+2) - ln(2df+1): both
        # arguments exact BIGINTs -> quantized table ln, exact DECIMAL
        # subtraction, ONE correctly-rounded string->double conversion
        dec = F.expr(
            f"{_lnq_sql('n_docs * CAST(2 AS BIGINT) + 2')}"
            f" - {_lnq_sql(f'df_{i} * CAST(2 AS BIGINT) + 1')}"
        )
        return dec.cast("string").cast("double")

    def term_score(i: int) -> Column:
        tf = F.col(f"tf_{i}").cast("double")
        denom = tf + F.lit(k1) * (F.lit(one_m_b) + F.lit(b) * dlr)
        return term_idf(i) * ((tf * F.lit(k1p1)) / denom)

    score = term_score(0)
    for i in range(1, len(query)):
        score = score + term_score(i)
    matched = sum(F.col(f"tf_{i}") for i in range(len(query)))
    return (
        scored.withColumn("score", score)
        .filter(matched > 0)
        .select(
            id_col,
            "score",
            F.col("dl").alias("n_tokens"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_k)
    )


def o_bm25_topk(
    query: tuple[str, ...],
    top_k: int = 10,
    source: str = "documents",
    k1: float = BM25_K1,
    b: float = BM25_B,
    idf: str = "log",
) -> str:
    """DuckDB mirror — identical operation order, constants pre-folded by
    the same Python arithmetic; ``idf="log"`` consumes the SAME literal
    decimal tables via a 1-row ``lt`` CTE."""
    if idf not in ("log", "raw"):
        raise ValueError(f"o_bm25_topk: idf must be 'log' or 'raw', got {idf!r}")
    k1p1, one_m_b = k1 + 1.0, 1.0 - b
    tf_cols = ", ".join(
        f"CAST(len(list_filter(tk, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(query)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(query))
    )
    if idf == "raw":
        def idf_sql(i: int) -> str:
            return (
                f"((CAST(n_docs - df_{i} AS DOUBLE) + 0.5)"
                f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
            )
        lt_cte = ""
        lt_src = ""
    else:
        def idf_sql(i: int) -> str:
            num = _o_lnq_sql("n_docs * CAST(2 AS BIGINT) + 2")
            den = _o_lnq_sql(f"df_{i} * CAST(2 AS BIGINT) + 1")
            return f"CAST(CAST(({num} - {den}) AS VARCHAR) AS DOUBLE)"
        m_list = "[" + ", ".join(
            f"CAST('{s}' AS {_LOG_DEC})" for s in ln_mantissa_strings()
        ) + "]"
        l_list = "[" + ", ".join(
            f"CAST('{s}' AS {_LOG_DEC})" for s in ln2_multiple_strings()
        ) + "]"
        lt_cte = f", lt AS (SELECT {m_list} AS m, {l_list} AS l2)"
        lt_src = ", lt"
    terms = " + ".join(
        f"({idf_sql(i)}"
        f" * ((CAST(tf_{i} AS DOUBLE) * {k1p1!r})"
        f" / (CAST(tf_{i} AS DOUBLE) + {k1!r} * ({one_m_b!r} + {b!r}"
        f" * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))))"
        for i in range(len(query))
    )
    matched = " + ".join(f"tf_{i}" for i in range(len(query)))
    return f"""
        WITH tok AS (
            SELECT doc_id, {o_tokens("coalesce(text, '')")} AS tk
            FROM {source}
        ), base AS (
            SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, {tf_cols}
            FROM tok
        ), stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS sum_dl, {df_cols}
            FROM base
        ){lt_cte}
        SELECT doc_id, {terms} AS score, dl AS n_tokens
        FROM base, stats{lt_src}
        WHERE {matched} > 0
        ORDER BY score DESC, doc_id
        LIMIT {top_k}
    """

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

Cross-engine exactness: ln() is not bit-stable across engines (measured
in the DSIR work), so the scoring uses the RAW-IDF variant
``(N - df + 0.5) / (df + 0.5)`` — the tfidf_topk raw-IDF precedent.
Per-term weighting therefore differs from log-IDF BM25 across multi-term
queries (monotone per term, not across terms); a caller needing the
log-weighted variant quantizes idf through a literal table (the DSIR
trick). Every other factor is an IEEE operation of exact BIGINTs in a
FIXED order, mirrored operation-for-operation by the DuckDB oracle, so
scores hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import o_tokens, tokens_expr

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query: tuple[str, ...],
    top_k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    checkpoint: bool = True,
) -> DataFrame:
    """Top-``top_k`` documents for ``query`` (lowercase terms) by the
    raw-IDF BM25 score (module docstring). Returns (id, score, n_tokens)
    ordered by (score DESC, id) — only documents matching at least one
    term. Query terms must be tokens of the corpus tokenizer (lowercase
    alphanumeric); anything else can never match and raises.

    ``checkpoint`` (default on) pins the per-document stats frame
    (id, dl, tf_*) — NARROW integer rows, no text — so the corpus is
    scanned and tokenized ONCE: both the stats aggregate and the scoring
    pass read the pinned frame instead of re-running the tokenizer (the
    bigram_lm pin discipline). Pass False to stay fully lazy."""
    import re

    from weather_monitoring_spark.functions.text import TOKEN_SPLIT_RE

    if not query:
        raise ValueError("bm25_topk: empty query")
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
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    dlr = F.col("dl").cast("double") / avgdl

    def term_score(i: int) -> Column:
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = ((F.col("n_docs") - F.col(f"df_{i}")).cast("double") + F.lit(0.5)) / (
            df + F.lit(0.5)
        )
        denom = tf + F.lit(k1) * (F.lit(one_m_b) + F.lit(b) * dlr)
        return idf * ((tf * F.lit(k1p1)) / denom)

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
) -> str:
    """DuckDB mirror — identical operation order, constants pre-folded by
    the same Python arithmetic."""
    k1p1, one_m_b = k1 + 1.0, 1.0 - b
    tf_cols = ", ".join(
        f"CAST(len(list_filter(tk, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(query)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(query))
    )
    terms = " + ".join(
        f"(((CAST(n_docs - df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5))"
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
        )
        SELECT doc_id, {terms} AS score, dl AS n_tokens
        FROM base, stats
        WHERE {matched} > 0
        ORDER BY score DESC, doc_id
        LIMIT {top_k}
    """

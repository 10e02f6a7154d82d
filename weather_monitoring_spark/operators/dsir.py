"""DSIR-style data selection via importance resampling (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling",
arXiv:2302.03169) — score raw-corpus documents by how target-like they
are under hashed n-gram bag-of-words models, then select the top-k.

Model (the paper's construction, made engine-exact):

- features: word unigrams + bigrams, ALL occurrences (counts, not
  sets), over the engine's shared token definition
  (``functions/text.tokens_expr``);
- each gram hashes into one of ``DSIR_BUCKETS`` buckets via the
  md5-derived ``h32`` family (cross-engine exact, no RNG);
- target and raw bucket-count models with add-one smoothing; counts
  CLIPPED at ``DSIR_COUNT_CLIP`` (count clipping is standard for
  hashed LMs, and here it also closes the log domain — see below);
- per raw document, the log importance weight
  ``log w(x) = sum_grams [ln(c_t(b)+1) - ln(c_r(b)+1)]`` up to a
  GLOBAL additive constant per gram: the smoothing normalizers
  ``-(ln(N_t+B) - ln(N_r+B))`` are identical for every document, so
  dropping them changes no ranking and no resampling — documented as
  part of the score's definition. ``avg_log_weight`` (per-gram) is the
  length-normalized form selection should use.

Cross-engine exactness (why this is oracle-checkable while ``ln`` is
not): measured on this host, Spark's and DuckDB's ``ln`` disagree in
the last ulp on ~1% of integer inputs — a transcendental is not a
cross-engine function. The clip closes the domain to 1..CLIP+1, so the
logs become a 1001-entry LITERAL TABLE: ``ln(k)`` evaluated once in
Python and quantized to 18 decimal places (DECIMAL(28,18)). Both
engines index the SAME literal array and SUM in exact decimal
(order-free, partial-aggregation-safe — the functions/exact.py
discipline), then convert via the correctly-rounded decimal->string->
double cast. The 1e-18 quantization is part of the declared score
definition; at ln-magnitudes ~7 it is ~1e-19 relative — noise wholly
below any selection decision.

Scale shape (100 TB): grams explode map-side inside the scan; each
model is ONE aggregation bounded at ``DSIR_BUCKETS`` rows (map-side
partials, then a tiny exchange) and joins back as a broadcast; the
per-document aggregation shuffles (doc_id, decimal, count) tuples with
map-side partials. Documents never cross the wire; nothing scales with
corpus size except the two bounded model aggregates and digest-width
rows. The log-table lives in the plan as a folded literal — no join,
no broadcast variable, no Python in the hot path.

Reference parity: no selection surface in the reference; extends the
engine per the builder brief's LLM-pipeline scope (the mixture /
decontamination family in operators/training_prep.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import h32_sql, tokens_expr

#: Hashed feature-space size. 8192 keeps both models broadcast-trivial
#: (<= 8192 rows each) at ANY corpus size while leaving hash collisions
#: rare for the vocabulary sizes n-gram models care about.
DSIR_BUCKETS = 8192

#: Bucket counts clip here; closes the log domain to a literal table.
DSIR_COUNT_CLIP = 1000

#: Exact carrier for quantized logs (1 integer digit + 18 decimals).
LOG_DEC = "decimal(28,18)"


def log_table_strings() -> list[str]:
    """``ln(k)`` for k = 1..CLIP+1, quantized to 18 decimal places —
    the ONE list of constants both engines consume (and the Python
    replay in tests sums the same strings via ``decimal.Decimal``)."""
    return [f"{math.log(k):.18f}" for k in range(1, DSIR_COUNT_CLIP + 2)]


def _spark_log_array() -> str:
    vals = ", ".join(f"CAST('{s}' AS {LOG_DEC})" for s in log_table_strings())
    return f"array({vals})"


def _grams_df(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, bucket) — one row per gram OCCURRENCE (unigrams + bigrams),
    bucketed. Pure map-side explode."""
    return (
        docs.select(F.col(id_col), tokens_expr(text_col).alias("_tk"))
        .select(
            id_col,
            F.explode(
                # CASE guard, not greatest(): Spark's sequence(1, 0)
                # counts DOWN to [1, 0] and would fabricate bigrams on
                # single-token docs.
                F.expr(
                    "concat(_tk, CASE WHEN size(_tk) >= 2"
                    " THEN transform(sequence(1, size(_tk) - 1),"
                    " i -> concat(_tk[i-1], ' ', _tk[i]))"
                    " ELSE array() END)"
                )
            ).alias("_g"),
        )
        .select(
            id_col,
            F.expr(f"{h32_sql('dsir', '_g')} % {DSIR_BUCKETS}").alias("bucket"),
        )
    )


def dsir_model(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(bucket, c) — the hashed n-gram count model, <= DSIR_BUCKETS
    rows at any corpus size (counts clipped at DSIR_COUNT_CLIP)."""
    return (
        _grams_df(docs, id_col, text_col)
        .groupBy("bucket")
        .agg(
            F.least(F.count(F.lit(1)), F.lit(DSIR_COUNT_CLIP))
            .cast("long")
            .alias("c")
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per raw document: (doc_id, n_grams, log_weight, avg_log_weight).

    ``log_weight`` is the exact-decimal sum of quantized per-gram log
    count ratios (see module doc: equals the DSIR log importance weight
    up to a selection-invariant global constant); ``avg_log_weight``
    its per-gram mean (ONE IEEE division of bit-identical operands —
    the cross-engine-stable normalization). Every raw doc gets a row:
    gram-less documents carry n_grams = 0, log_weight = 0.0 and a NULL
    average (an explicit no-evidence verdict, the contamination_flags
    precedent)."""
    t_model = dsir_model(target, id_col, text_col).withColumnRenamed("c", "_ct")
    r_model = dsir_model(raw, id_col, text_col).withColumnRenamed("c", "_cr")
    arr = _spark_log_array()
    per_gram = (
        _grams_df(raw, id_col, text_col)
        .join(F.broadcast(t_model), "bucket", "left")
        .join(F.broadcast(r_model), "bucket", "left")
        .select(
            id_col,
            F.expr(
                f"element_at({arr}, CAST(coalesce(_ct, 0) + 1 AS INT))"
                f" - element_at({arr}, CAST(coalesce(_cr, 0) + 1 AS INT))"
            ).alias("_dl"),
        )
    )
    scored = per_gram.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum("_dl").cast("string").cast("double").alias("log_weight"),
    )
    return (
        raw.select(F.col(id_col).alias("_id"))
        .join(scored.withColumnRenamed(id_col, "_id"), "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
            F.when(
                F.col("n_grams") > 0,
                F.col("log_weight") / F.col("n_grams").cast("double"),
            ).alias("avg_log_weight"),
        )
    )


def dsir_topk(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic DSIR selection: the k most target-like raw docs by
    ``avg_log_weight`` (doc_id tiebreak — fully deterministic, no
    Gumbel noise: the paper's sampled variant exists to diversify
    near-ties, which a reproducible pipeline trades away deliberately).
    Plans as TakeOrderedAndProject — per-partition k-heaps, no global
    sort."""
    w = dsir_weights(raw, target, id_col, text_col)
    return (
        w.filter(F.col("avg_log_weight").isNotNull())
        .orderBy(F.col("avg_log_weight").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------- DuckDB oracle fragments (1:1 mirror) ---------------


def _o_log_list() -> str:
    vals = ", ".join(f"CAST('{s}' AS {LOG_DEC})" for s in log_table_strings())
    return f"[{vals}]"


def o_dsir_weights_sql(raw_pred: str = "TRUE", target_pred: str = "TRUE") -> str:
    """Full DuckDB mirror of ``dsir_weights`` over the ``documents``
    view: raw = rows matching ``raw_pred``, target = rows matching
    ``target_pred``. Same literal log table, same exact-decimal sum,
    same string->double final cast."""
    from weather_monitoring_spark.functions.text import o_tokens

    grams = (
        "SELECT doc_id, unnest(list_concat(t, list_transform(range(1, len(t)),"
        " i -> t[i] || ' ' || t[i+1]))) AS g FROM tk"
    )
    return f"""
        WITH tk_raw AS (
            SELECT doc_id, {o_tokens('text')} AS t FROM documents WHERE {raw_pred}
        ), tk_target AS (
            SELECT doc_id, {o_tokens('text')} AS t FROM documents WHERE {target_pred}
        ), g_raw AS (
            SELECT doc_id, {o_h32_dsir('g')} % {DSIR_BUCKETS} AS bucket
            FROM ({grams.replace('FROM tk', 'FROM tk_raw')})
        ), g_target AS (
            SELECT doc_id, {o_h32_dsir('g')} % {DSIR_BUCKETS} AS bucket
            FROM ({grams.replace('FROM tk', 'FROM tk_target')})
        ), m_t AS (
            SELECT bucket, least(count(*), {DSIR_COUNT_CLIP}) AS ct
            FROM g_target GROUP BY bucket
        ), m_r AS (
            SELECT bucket, least(count(*), {DSIR_COUNT_CLIP}) AS cr
            FROM g_raw GROUP BY bucket
        ), per_gram AS (
            SELECT g.doc_id,
                   ({_o_log_list()})[CAST(coalesce(m_t.ct, 0) + 1 AS INT)]
                 - ({_o_log_list()})[CAST(coalesce(m_r.cr, 0) + 1 AS INT)] AS dl
            FROM g_raw g
            LEFT JOIN m_t ON g.bucket = m_t.bucket
            LEFT JOIN m_r ON g.bucket = m_r.bucket
        ), scored AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(CAST(sum(dl) AS VARCHAR) AS DOUBLE) AS log_weight
            FROM per_gram GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(s.n_grams, 0) AS n_grams,
               coalesce(s.log_weight, 0.0) AS log_weight,
               CASE WHEN coalesce(s.n_grams, 0) > 0
                    THEN s.log_weight / CAST(s.n_grams AS DOUBLE) END
                   AS avg_log_weight
        FROM (SELECT doc_id FROM documents WHERE {raw_pred}) d
        LEFT JOIN scored s USING (doc_id)
    """


def o_h32_dsir(col: str) -> str:
    return f"CAST(('0x' || substr(md5('dsir' || ':' || {col}), 1, 8)) AS BIGINT)"


# ---------------- corpus divergence (drift observability) ----------------


def corpus_divergence(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distributional distance between two corpora over the SAME hashed
    n-gram feature space the DSIR models use — the drift-observability
    number a mixture pipeline watches per ingest batch ("has this
    source's language shifted since the weights were tuned?").

    Returns ONE row: (n_buckets, mass_a, mass_b, n_active_a, n_active_b,
    tv_distance, chi2_divergence) where the distributions are the
    add-one-smoothed clipped bucket models p_i = (c_i + 1) / (Σc + B),
    ``tv_distance`` = ½·Σ|p_i − q_i| (total variation, in [0, 1]) and
    ``chi2_divergence`` = Σ(p_i − q_i)²/q_i (Pearson χ², the KL
    second-order approximation).

    Why TV and χ² rather than KL: a KL over arbitrary totals needs
    ``ln(N)`` for unbounded N — a transcendental outside the literal
    log-table construction, and ``ln`` is NOT cross-engine bit-stable
    (module doc). TV and χ² are pure +,−,×,÷ of identical operands, so
    with one fixed summation order they are bit-exact on both engines:
    each per-bucket term is IEEE arithmetic on two exact divisions, and
    the total is a SEQUENTIAL fold over the full B-bucket list in
    bucket order (the mixture_weights discipline — never a partial-agg
    double sum).

    Scale shape: each corpus aggregates once into a ≤B-row model
    (map-side partials); everything after — the B-row join, the 1-row
    mass frame, the sorted fold — is arithmetic on bounded frames.
    Documents never cross the wire; cost is independent of corpus size
    beyond the two model scans."""
    spark = corpus_a.sparkSession
    ma = dsir_model(corpus_a, id_col, text_col).withColumnRenamed("c", "ca")
    mb = dsir_model(corpus_b, id_col, text_col).withColumnRenamed("c", "cb")
    buckets = spark.range(DSIR_BUCKETS).select(
        F.col("id").cast("long").alias("bucket")
    )
    j = (
        buckets.join(F.broadcast(ma), "bucket", "left")
        .join(F.broadcast(mb), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
    )
    mass = j.agg(
        (F.sum("ca") + F.lit(DSIR_BUCKETS)).cast("long").alias("mass_a"),
        (F.sum("cb") + F.lit(DSIR_BUCKETS)).cast("long").alias("mass_b"),
    )
    pa = (F.col("ca") + 1).cast("double") / F.col("mass_a").cast("double")
    pb = (F.col("cb") + 1).cast("double") / F.col("mass_b").cast("double")
    terms = j.crossJoin(F.broadcast(mass)).select(
        "bucket",
        "ca",
        "cb",
        "mass_a",
        "mass_b",
        F.abs(pa - pb).alias("t_tv"),
        ((pa - pb) * (pa - pb) / pb).alias("t_chi"),
    )
    acc = terms.agg(
        F.array_sort(
            F.collect_list(F.struct("bucket", "t_tv", "t_chi"))
        ).alias("_arr"),
        F.min("mass_a").alias("mass_a"),
        F.min("mass_b").alias("mass_b"),
        F.sum((F.col("ca") > 0).cast("long")).alias("n_active_a"),
        F.sum((F.col("cb") > 0).cast("long")).alias("n_active_b"),
    )
    return acc.select(
        F.lit(DSIR_BUCKETS).cast("long").alias("n_buckets"),
        "mass_a",
        "mass_b",
        "n_active_a",
        "n_active_b",
        (
            F.aggregate(
                "_arr", F.lit(0.0), lambda a, x: a + x["t_tv"]
            )
            * F.lit(0.5)
        ).alias("tv_distance"),
        F.aggregate("_arr", F.lit(0.0), lambda a, x: a + x["t_chi"]).alias(
            "chi2_divergence"
        ),
    )


def o_corpus_divergence_sql(
    pred_a: str = "doc_id % 2 = 0", pred_b: str = "doc_id % 2 = 1"
) -> str:
    """Full DuckDB mirror of ``corpus_divergence`` over the ``documents``
    view split by two predicates: same gram construction, same clipped
    models, same add-one smoothing, same bucket-ordered sequential
    folds."""
    from weather_monitoring_spark.functions.text import o_tokens

    grams = (
        "SELECT doc_id, unnest(list_concat(t, list_transform(range(1, len(t)),"
        " i -> t[i] || ' ' || t[i+1]))) AS g FROM tk"
    )
    return f"""
        WITH tk_a AS (
            SELECT doc_id, {o_tokens('text')} AS t FROM documents WHERE {pred_a}
        ), tk_b AS (
            SELECT doc_id, {o_tokens('text')} AS t FROM documents WHERE {pred_b}
        ), g_a AS (
            SELECT {o_h32_dsir('g')} % {DSIR_BUCKETS} AS bucket
            FROM ({grams.replace('FROM tk', 'FROM tk_a')})
        ), g_b AS (
            SELECT {o_h32_dsir('g')} % {DSIR_BUCKETS} AS bucket
            FROM ({grams.replace('FROM tk', 'FROM tk_b')})
        ), m_a AS (
            SELECT bucket, least(count(*), {DSIR_COUNT_CLIP}) AS ca
            FROM g_a GROUP BY bucket
        ), m_b AS (
            SELECT bucket, least(count(*), {DSIR_COUNT_CLIP}) AS cb
            FROM g_b GROUP BY bucket
        ), bk AS (
            SELECT CAST(unnest(range(0, {DSIR_BUCKETS})) AS BIGINT) AS bucket
        ), j AS (
            SELECT bucket,
                   CAST(coalesce(ca, 0) AS BIGINT) AS ca,
                   CAST(coalesce(cb, 0) AS BIGINT) AS cb
            FROM bk LEFT JOIN m_a USING (bucket) LEFT JOIN m_b USING (bucket)
        ), mass AS (
            SELECT CAST(sum(ca) + {DSIR_BUCKETS} AS BIGINT) AS mass_a,
                   CAST(sum(cb) + {DSIR_BUCKETS} AS BIGINT) AS mass_b
            FROM j
        ), terms AS (
            SELECT bucket, ca, cb, mass_a, mass_b,
                   abs(CAST(ca + 1 AS DOUBLE) / CAST(mass_a AS DOUBLE)
                     - CAST(cb + 1 AS DOUBLE) / CAST(mass_b AS DOUBLE)) AS t_tv,
                   (CAST(ca + 1 AS DOUBLE) / CAST(mass_a AS DOUBLE)
                  - CAST(cb + 1 AS DOUBLE) / CAST(mass_b AS DOUBLE))
                 * (CAST(ca + 1 AS DOUBLE) / CAST(mass_a AS DOUBLE)
                  - CAST(cb + 1 AS DOUBLE) / CAST(mass_b AS DOUBLE))
                 / (CAST(cb + 1 AS DOUBLE) / CAST(mass_b AS DOUBLE)) AS t_chi
            FROM j CROSS JOIN mass
        )
        SELECT CAST({DSIR_BUCKETS} AS BIGINT) AS n_buckets,
               min(mass_a) AS mass_a,
               min(mass_b) AS mass_b,
               CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_active_a,
               CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_active_b,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(t_tv ORDER BY bucket)), (a, b) -> a + b) * 0.5
                   AS tv_distance,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list(t_chi ORDER BY bucket)), (a, b) -> a + b)
                   AS chi2_divergence
        FROM terms
    """

"""Embedding-column utilities: storage-side transforms over
``array<float>`` vectors that precede similarity search.

Like the text operators these are pure per-row projections — every
function here is shuffle-free column algebra that composes with the scan,
so at 100 TB they run at parquet speed and never move a vector twice.

Determinism: all arithmetic is IEEE-754 double ops (divide, multiply,
abs, floor) — each correctly rounded, hence bit-identical across engines
— and the float32 inputs widen to double exactly. No round(), no libm
transcendentals (see functions/exact.py rules), which is what makes the
quantizer DuckDB-oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Symmetric quantization levels: values map into [-QUANT_LEVELS-1, QUANT_LEVELS]
#: (int8-style; floor() of a value at exactly -max can land on -128).
QUANT_LEVELS = 127


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8-style quantization of a float-vector column.
    Returns (vec_id, scale, qvec array<bigint>, max_abs_err).

    Per vector: ``scale = max(|x|) / 127``; ``q_i = floor(x_i / scale)``;
    ``max_abs_err = max_i |x_i - q_i * scale|`` — the reconstruction-error
    bound a retrieval layer needs to decide whether quantized scoring plus
    exact re-scoring (operators/similarity.py's prefilter pattern) is
    admissible. floor() (exact) rather than round() (forbidden: engines
    disagree on representational halves); the one-ULP asymmetry this
    introduces is inside the reported error bound. Zero vectors quantize
    to all-zero with scale 0 and error 0.

    Storage effect at scale: 64 float32 dims (256 B) become 64 int8 codes
    + one float scale (~72 B packed); here codes stay BIGINT for
    cross-engine comparison, with the width as a documented storage
    concern, not a semantic one."""
    x = F.expr(f"transform({vec_col}, v -> CAST(v AS DOUBLE))")
    staged = emb.select(F.col(id_col), x.alias("_x")).withColumn(
        "scale",
        F.expr(f"array_max(transform(_x, v -> abs(v))) / CAST({QUANT_LEVELS} AS DOUBLE)"),
    )
    quantized = staged.withColumn(
        "qvec",
        F.expr(
            "transform(_x, v -> CAST(CASE WHEN scale = 0.0 THEN 0.0"
            " ELSE floor(v / scale) END AS BIGINT))"
        ),
    )
    return quantized.select(
        F.col(id_col),
        "scale",
        "qvec",
        F.expr(
            "CASE WHEN scale = 0.0 THEN CAST(0.0 AS DOUBLE) ELSE"
            " array_max(zip_with(_x, qvec, (v, q) -> abs(v - CAST(q AS DOUBLE) * scale)))"
            " END"
        ).alias("max_abs_err"),
    )


#: Output dimensionality for reduce_embeddings. 16 keeps the JL scale
#: factor 1/sqrt(16) = 0.25 exactly representable, though any k is safe:
#: IEEE-754 sqrt is correctly rounded on every engine.
JL_DIM = 16


def jl_matrix(out_dim: int, in_dim: int):
    """Deterministic ±1 Johnson-Lindenstrauss projection matrix: entry
    (j, i) is the md5-derived sign of ``"jl:j:i"`` — the same
    engine-portable construction as the ANN hyperplanes
    (similarity.hyperplane_matrix), under a disjoint seed namespace."""
    import hashlib

    import numpy as np

    mat = np.empty((out_dim, in_dim), dtype=np.float64)
    for j in range(out_dim):
        for i in range(in_dim):
            h = int(hashlib.md5(f"jl:{j}:{i}".encode()).hexdigest()[:8], 16)
            mat[j, i] = 1.0 if h % 2 == 0 else -1.0
    return mat


def _jl_chain(signs, vec: str, scale_lit: str, one_based: bool) -> str:
    """One output coordinate as a left-associated multiply-add chain with
    the ±1 signs baked in as literals — the identical term order on both
    engines, so the double result is bit-identical."""
    if one_based:
        terms = " + ".join(
            f"({'1.0' if s > 0 else '-1.0'}) * {vec}[{i + 1}]::DOUBLE"
            for i, s in enumerate(signs)
        )
    else:
        terms = " + ".join(
            f"({'1.0' if s > 0 else '-1.0'}) * CAST({vec}[{i}] AS DOUBLE)"
            for i, s in enumerate(signs)
        )
    return f"({terms}) * {scale_lit}"


def reduce_embeddings(
    emb: DataFrame,
    out_dim: int = JL_DIM,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "gemm",
) -> DataFrame:
    """Random-projection (Johnson-Lindenstrauss) dimensionality reduction:
    project each vector onto ``out_dim`` deterministic ±1 hyperplanes and
    scale by 1/sqrt(out_dim), preserving pairwise distances in
    expectation. Returns (vec_id, reduced array<double>). The cheap first
    stage of an embedding pipeline at 100 TB — a 4x narrower vector
    feeds ANN bucketing / IVF training at a quarter of the shuffle bytes,
    with exact re-scoring on the full vectors afterwards (the engine's
    standard prefilter + re-score composition).

    ``method="gemm"`` (default): one Arrow-batched float64 matmul per
    partition — the scale path; numpy's pairwise summation makes it
    ulp-close (not bit-equal) to the expr path, so tests compare with a
    tolerance. ``method="expr"``: all-JVM left-associated multiply-add
    chains with the signs baked in as literals — bit-identical to the
    DuckDB oracle, zero Python boundary; the oracle-checked formulation.

    Both paths are shuffle-free per-row projections."""
    import math

    from weather_monitoring_spark.operators.similarity import (
        scoreable_vectors,
    )

    scale_lit = repr(1.0 / math.sqrt(out_dim))
    planes = jl_matrix(out_dim, dim)
    # the plane matrix fixes the operating dim: NULL/mismatched vectors
    # cannot be projected (GEMM path crashed on them) — gated plan-side
    emb = scoreable_vectors(emb, vec_col, dim=dim)
    if method == "expr":
        coords = ", ".join(
            _jl_chain(planes[j], vec_col, scale_lit, one_based=False)
            for j in range(out_dim)
        )
        return emb.select(F.col(id_col), F.expr(f"array({coords})").alias("reduced"))
    if method != "gemm":
        raise ValueError(f"unknown method {method!r}")

    import numpy as np

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    id_field = emb.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("reduced", ArrayType(DoubleType())),
        ]
    )
    scale = 1.0 / math.sqrt(out_dim)

    def project(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            red = (mat @ planes.T) * scale
            yield pd.DataFrame({id_col: pdf[id_col], "reduced": list(red)})

    return emb.select(id_col, vec_col).mapInPandas(project, out_schema)


def o_reduce_embeddings(out_dim: int = JL_DIM, dim: int = 64) -> str:
    """DuckDB oracle for the expr path: the same ±1 literals in the same
    left-associated order, scaled by the same literal."""
    import math

    scale_lit = repr(1.0 / math.sqrt(out_dim))
    planes = jl_matrix(out_dim, dim)
    coords = ", ".join(
        _jl_chain(planes[j], "embedding", scale_lit, one_based=True)
        for j in range(out_dim)
    )
    return f"SELECT vec_id, [{coords}] AS reduced FROM embeddings"


# ---------------- feature-hashing vectorizer -------------------------------

HASHTF_DIM = 64
HASHTF_SEED = "htf"


def hashed_tf_vectors(
    docs: DataFrame,
    dim: int = HASHTF_DIM,
    unit: bool = False,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "arrow",
) -> DataFrame:
    """Feature-hashing term-frequency vectors (Weinberger et al. 2009):
    every token lands in bucket ``h32(token) % dim``; ``vec[i]`` is the
    bucket's token count. Bridges a TEXT corpus into the vector family
    (kmeans/SemDeDup/ANN/JL) without a trained embedding model — the
    standard cheap vectorizer for topic blocking and clustering-based
    dedup.

    ``unit=True`` L2-normalizes. Cross-engine exactness holds on BOTH
    settings: counts are exact BIGINTs, the squared norm is an exact
    BIGINT sum, and IEEE sqrt/divide are correctly-rounded operations
    (unlike ln — the DSIR finding), so normalized components are
    bit-stable too. Returns (id, vec array<double>, n_tokens BIGINT).

    Scale shape: ZERO SHUFFLE on both paths. ``method="arrow"``
    (default): one Arrow-batched pass — md5 bucket per DISTINCT token
    (per-batch memo), np.bincount, numpy float64 normalize (IEEE ops
    identical to the JVM's) — the scale path, because the expr twin's
    dim x T interpreted lambda evaluations dominate (measured 270
    us/doc at dim=64). ``method="expr"``: pure row-local array algebra,
    Python-free, bit-equal (pinned by tests) and oracle-shaped."""
    if dim < 1:
        raise ValueError("hashed_tf_vectors: dim must be >= 1")
    if method not in ("arrow", "expr"):
        raise ValueError(f"unknown hashed-tf method: {method!r}")
    if method == "arrow":
        return _hashed_tf_arrow(docs, dim, unit, id_col, text_col)
    from weather_monitoring_spark.functions.text import h32_sql, tokens_expr

    bucket = h32_sql(HASHTF_SEED, "t") + f" % {dim}"
    s1 = docs.select(
        F.col(id_col),
        tokens_expr(f"coalesce({text_col}, '')").alias("_tk"),
    ).select(
        id_col,
        F.size("_tk").cast("bigint").alias("n_tokens"),
        F.expr(f"transform(_tk, t -> {bucket})").alias("_bk"),
    )
    counts = F.expr(
        f"transform(sequence(0, {dim - 1}), "
        f"i -> CAST(size(filter(_bk, b -> b = i)) AS BIGINT))"
    )
    s2 = s1.select(id_col, "n_tokens", counts.alias("_c"))
    if not unit:
        return s2.select(
            id_col,
            F.expr("transform(_c, v -> CAST(v AS DOUBLE))").alias("vec"),
            "n_tokens",
        )
    # the norm is a STAGED column: an aggregate inside the transform
    # lambda re-evaluates per element (dim x dim per row — measured
    # pathological at 1M docs; the c4_rules staging lesson)
    s3 = s2.select(
        id_col,
        "n_tokens",
        "_c",
        F.expr(
            "sqrt(CAST(aggregate(_c, CAST(0 AS BIGINT), (a, v) -> a + v * v)"
            " AS DOUBLE))"
        ).alias("_nrm"),
    )
    vec = F.expr(
        "CASE WHEN _nrm = 0.0 THEN transform(_c, v -> CAST(0.0 AS DOUBLE)) "
        "ELSE transform(_c, v -> CAST(v AS DOUBLE) / _nrm) END"
    )
    return s3.select(id_col, vec.alias("vec"), "n_tokens")


def _hashed_tf_arrow(
    docs: DataFrame, dim: int, unit: bool, id_col: str, text_col: str
) -> DataFrame:
    """Arrow path: see hashed_tf_vectors. Bit-equality argument: counts
    are exact ints either way; the squared norm is an exact int both
    ways (< 2^53); numpy's sqrt and divide are the same
    correctly-rounded IEEE operations the JVM executes."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from weather_monitoring_spark.functions.text import TOKEN_SPLIT_RE

    tok_re = re.compile(TOKEN_SPLIT_RE)

    def _sig(col):
        memo: dict[str, int] = {}

        def bucket(t: str) -> int:
            b = memo.get(t)
            if b is None:
                b = (
                    int(
                        hashlib.md5(
                            f"{HASHTF_SEED}:{t}".encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    % dim
                )
                memo[t] = b
            return b

        n_out, v_out = [], []
        for text in col:
            toks = [t for t in tok_re.split((text or "").lower()) if t]
            n_out.append(len(toks))
            c = np.bincount(
                [bucket(t) for t in toks], minlength=dim
            ).astype(np.int64)
            if unit:
                q = int((c * c).sum())
                v = (
                    c.astype(np.float64) / np.sqrt(np.float64(q))
                    if q
                    else np.zeros(dim, dtype=np.float64)
                )
            else:
                v = c.astype(np.float64)
            v_out.append(v.tolist())
        return pd.DataFrame({"n_tokens": n_out, "vec": v_out})

    _sig.__annotations__ = {"col": pd.Series, "return": pd.DataFrame}
    udf = pandas_udf(_sig, "n_tokens bigint, vec array<double>")
    return docs.select(
        F.col(id_col), udf(F.col(text_col)).alias("_s")
    ).select(id_col, F.col("_s.vec").alias("vec"), F.col("_s.n_tokens").alias("n_tokens"))


def o_hashed_tf_vectors(
    dim: int = HASHTF_DIM,
    unit: bool = False,
    source: str = "documents",
) -> str:
    """DuckDB mirror — same bucket hash, same exact-int counts, same
    correctly-rounded sqrt/divide when ``unit``."""
    from weather_monitoring_spark.functions.text import o_h32, o_tokens

    bucket = o_h32(HASHTF_SEED, "t") + f" % {dim}"
    if not unit:
        vec = "list_transform(c, v -> CAST(v AS DOUBLE))"
    else:
        nrm = "sqrt(CAST(list_sum(list_transform(c, v -> v * v)) AS DOUBLE))"
        vec = (
            f"CASE WHEN list_sum(list_transform(c, v -> v * v)) = 0 "
            f"THEN list_transform(c, v -> CAST(0.0 AS DOUBLE)) "
            f"ELSE list_transform(c, v -> CAST(v AS DOUBLE) / {nrm}) END"
        )
    return f"""
        WITH tok AS (
            SELECT doc_id, {o_tokens("coalesce(text, '')")} AS tk
            FROM {source}
        ), bk AS (
            SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
                   list_transform(tk, t -> {bucket}) AS b
            FROM tok
        ), cnt AS (
            SELECT doc_id, n_tokens,
                   list_transform(range(0, {dim}),
                       i -> CAST(len(list_filter(b, x -> x = i)) AS BIGINT)) AS c
            FROM bk
        )
        SELECT doc_id, {vec} AS vec, n_tokens
        FROM cnt
    """

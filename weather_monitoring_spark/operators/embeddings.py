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

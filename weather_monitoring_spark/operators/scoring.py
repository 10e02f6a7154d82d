"""Model-based quality scoring — the classifier gate of a modern
curation pipeline (the DCLM / FineWeb-edu stage: score every document
with a trained quality model, keep above a threshold).

At 100 TB the division of labor is fixed: TRAINING the scorer is an
offline, sampled task (fastText / logistic regression on a few hundred
thousand labeled examples — not this engine's job); SCORING the corpus
is the distributed part, and for a linear model it is pure column
algebra — one zero-shuffle projection computing the feature vector and
the weighted margin together.

`quality_scores` evaluates a linear model over the engine's existing
curation signals (char-class ratios, stopword ratio, repetition
statistics — the classic quality-classifier feature families) with
caller-supplied weights. The margin is kept LINEAR rather than pushed
through a sigmoid: `sigmoid` is monotone, so "p >= p0" is exactly
"margin >= logit(p0)", and transcendental functions are not bit-stable
across engines while multiply/add in a fixed order are — the margin is
computed as one left-associated chain, documented as part of the
cross-engine contract, so the DuckDB oracle reproduces it bit-for-bit.

Weights are an ordered tuple of (feature, weight): the ORDER is part of
the contract (IEEE addition is not associative; both engines fold the
chain in the declared order).

Reference parity: no scoring surface in the reference; extends the
engine per the builder brief's LLM-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weather_monitoring_spark.functions.text import tokens_expr
from weather_monitoring_spark.operators.quality import _repetition_cols
from weather_monitoring_spark.operators.textops import _lex_hits

#: Hand-set default weights over the signal families (stand-ins for a
#: trained model's coefficients — callers pass their own): reward
#: natural-language evidence (stopwords, letters), punish repetition.
DEFAULT_QUALITY_WEIGHTS: tuple[tuple[str, float], ...] = (
    ("stopword_ratio", 4.0),
    ("alpha_ratio", 1.0),
    ("dup_token_frac", -2.0),
    ("top_token_share", -1.5),
    ("top_bigram_share", -1.0),
)
DEFAULT_QUALITY_BIAS = -0.5
DEFAULT_QUALITY_THRESHOLD = 0.0

#: Feature names -> Spark Column factories over (text_col, token_col).
#: alpha_ratio guards empty text (0.0, matching the oracle's CASE).


def _feature_cols(text_col: str, tk: str) -> dict[str, F.Column]:
    n_chars = F.length(text_col).cast("bigint")
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", "")).cast(
        "bigint"
    )
    rep = _repetition_cols(tk)
    return {
        "alpha_ratio": F.when(n_chars == 0, F.lit(0.0)).otherwise(
            alpha.cast("double") / n_chars.cast("double")
        ),
        "stopword_ratio": F.when(F.size(tk) == 0, F.lit(0.0)).otherwise(
            # the shared English lexicon (textops.LANG_LEXICONS), so the
            # scorer's feature == the lang-id/text-stats feature and the
            # oracle mirrors one list.
            F.expr(_lex_hits(tk, "en")).cast("double") / F.size(tk).cast("double")
        ),
        "top_token_share": rep["top_token_share"],
        "top_bigram_share": rep["top_bigram_share"],
        "dup_token_frac": rep["dup_token_frac"],
    }


def quality_scores(
    docs: DataFrame,
    weights: tuple[tuple[str, float], ...] = DEFAULT_QUALITY_WEIGHTS,
    bias: float = DEFAULT_QUALITY_BIAS,
    threshold: float = DEFAULT_QUALITY_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, <features>, quality_score, keep) in one zero-shuffle
    projection chain. ``quality_score = bias + w1*x1 + w2*x2 + ...``
    folded left-to-right in the declared weight order; ``keep`` is
    ``quality_score >= threshold``. Unknown feature names raise."""
    known = _feature_cols(text_col, "_tk")
    for name, _ in weights:
        if name not in known:
            raise ValueError(
                f"unknown feature {name!r}; available: {sorted(known)}"
            )
    feats = docs.withColumn("_tk", tokens_expr(text_col)).select(
        F.col(id_col),
        *[known[name].alias(name) for name, _ in weights],
    )
    score = F.lit(float(bias))
    for name, w in weights:
        score = score + F.lit(float(w)) * F.col(name)
    return feats.withColumn("quality_score", score).withColumn(
        "keep", F.col("quality_score") >= F.lit(float(threshold))
    )


def fit_quality_classifier(
    labeled: DataFrame,
    features: tuple[str, ...] = tuple(n for n, _ in DEFAULT_QUALITY_WEIGHTS),
    iterations: int = 25,
    ridge: float = 1e-3,
    max_rows: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
) -> tuple[tuple[tuple[str, float], ...], float]:
    """Train the linear quality model by IRLS (iteratively reweighted
    least squares — the Newton iteration for ridge-regularized logistic
    regression) over the engine's OWN feature projection, and return
    ``(weights, bias)`` in exactly the form ``quality_scores`` consumes
    — the trained model scores through the same bit-stable,
    oracle-mirrored margin chain as the hand-set default.

    Deterministic by construction, no RNG anywhere: a FIXED iteration
    count (no data-dependent convergence test), zero initialization,
    ridge-regularized normal equations solved with LAPACK on a feature
    matrix assembled in ``id_col`` order (float64 accumulation order is
    therefore a pure function of the data). Two fits on the same rows
    return bit-identical weights — pinned in tests/test_scoring.py.

    Division of labor at 100 TB (module doc): training is the OFFLINE,
    SAMPLED task — a quality classifier fits on 1e4-1e6 labeled
    examples, so the labeled frame is collected to the driver (guarded
    by ``max_rows``; sample upstream with ``sample_exact_k``), the
    feature PROJECTION still runs distributed before collection, and
    only the n x d float matrix crosses the wire. Scoring the corpus
    with the returned weights is the distributed part and stays a
    zero-shuffle projection.
    """
    import numpy as np

    known = _feature_cols(text_col, "_tk")
    for name in features:
        if name not in known:
            raise ValueError(
                f"unknown feature {name!r}; available: {sorted(known)}"
            )
    rows = (
        labeled.withColumn("_tk", tokens_expr(text_col))
        .select(
            F.col(id_col),
            F.col(label_col).cast("double").alias("_y"),
            *[known[name].alias(name) for name in features],
        )
        .orderBy(id_col)
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"labeled set exceeds max_rows={max_rows}; sample upstream "
            "(training is the offline sampled task, not the corpus pass)"
        )
    if not rows:
        raise ValueError("labeled set is empty")
    y = np.array([r["_y"] for r in rows], dtype=np.float64)
    if not set(np.unique(y)) <= {0.0, 1.0}:
        raise ValueError("labels must be 0/1")
    X = np.array(
        [[1.0] + [float(r[name]) for name in features] for r in rows],
        dtype=np.float64,
    )
    d = X.shape[1]
    beta = np.zeros(d, dtype=np.float64)
    reg = ridge * np.eye(d)
    reg[0, 0] = 0.0  # never regularize the intercept
    for _ in range(iterations):
        z = X @ beta
        p = 1.0 / (1.0 + np.exp(-z))
        w = np.maximum(p * (1.0 - p), 1e-10)
        # Newton step via the weighted normal equations
        H = X.T @ (X * w[:, None]) + reg
        g = X.T @ (y - p) - reg @ beta
        beta = beta + np.linalg.solve(H, g)
    bias = float(beta[0])
    weights = tuple((name, float(b)) for name, b in zip(features, beta[1:]))
    return weights, bias


# ---------------- DuckDB oracle fragment (1:1 mirror) ---------------


def o_quality_score(
    weights: tuple[tuple[str, float], ...] = DEFAULT_QUALITY_WEIGHTS,
    bias: float = DEFAULT_QUALITY_BIAS,
) -> str:
    """The margin as explicitly left-associated SQL — same fold order as
    the Spark chain, so doubles match bit-for-bit. Weight literals go
    through a STRING cast: DuckDB types a bare ``9.95937...`` literal
    DECIMAL and the decimal->double conversion double-rounds (1-ulp off
    for trained full-precision weights; invisible on the exactly-
    representable defaults), while varchar->double is correctly-rounded
    strtod — bit-identical to the repr'd Python float Spark receives
    natively."""
    expr = f"CAST('{float(bias)!r}' AS DOUBLE)"
    for name, w in weights:
        expr = f"({expr} + CAST('{float(w)!r}' AS DOUBLE) * {name})"
    return expr

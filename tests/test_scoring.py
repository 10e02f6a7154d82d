"""Linear quality scorer (operators/scoring.py): gate semantics, weight
contract, and plan shape. Cross-engine bit-parity runs in
test_oracle_parity via x_quality_score."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_monitoring_spark.operators.scoring import (
    DEFAULT_QUALITY_WEIGHTS,
    quality_scores,
)


@pytest.fixture(scope="module")
def scored(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is a good day in the sun"),
            (2, "buy buy buy buy buy buy buy buy buy buy buy buy"),
            (3, "x9 #$ !! 77 ~~ %% 00 @@"),
        ],
        "doc_id long, text string",
    )
    return {r["doc_id"]: r for r in quality_scores(docs).collect()}


def test_prose_outscores_repetition_and_noise(scored):
    assert scored[1]["quality_score"] > scored[2]["quality_score"]
    assert scored[1]["quality_score"] > scored[3]["quality_score"]
    assert scored[1]["keep"] and not scored[2]["keep"] and not scored[3]["keep"]


def test_keep_is_threshold_on_score(spark):
    docs = spark.createDataFrame(
        [(1, "the a of to and in is it")], "doc_id long, text string"
    )
    hi = quality_scores(docs, threshold=1000.0).collect()[0]
    lo = quality_scores(docs, threshold=-1000.0).collect()[0]
    assert not hi["keep"] and lo["keep"]
    assert hi["quality_score"] == lo["quality_score"]


def test_unknown_feature_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown feature"):
        quality_scores(docs, weights=(("no_such_signal", 1.0),))


def test_custom_weights_change_the_margin(spark):
    docs = spark.createDataFrame(
        [(1, "the the the the")], "doc_id long, text string"
    )
    base = quality_scores(docs, weights=(("dup_token_frac", 0.0),), bias=0.0)
    anti = quality_scores(docs, weights=(("dup_token_frac", -4.0),), bias=0.0)
    assert base.collect()[0]["quality_score"] == 0.0
    assert anti.collect()[0]["quality_score"] < 0.0


def test_scoring_plan_has_no_exchange(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = quality_scores(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_default_weights_cover_declared_features(spark):
    # every default weight names a real feature (guards rename drift)
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    cols = set(quality_scores(docs).columns)
    for name, _ in DEFAULT_QUALITY_WEIGHTS:
        assert name in cols

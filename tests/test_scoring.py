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


# ---- trained classifier (fit_quality_classifier, deterministic IRLS) -----

#: Planted labeled corpus: label 1 = natural prose (stopwords, varied
#: vocabulary), label 0 = the junk classes the gate exists to drop
#: (repetition, symbol noise, keyword stuffing). Deterministic literals.
_GOOD = [
    "the cat sat on the mat and it was a warm day in the garden",
    "she walked to the store and bought bread milk and a newspaper",
    "the committee met on monday to review the results of the survey",
    "a library lends books to readers and keeps a record of each loan",
    "he fixed the fence painted the gate and watered the plants",
    "we measured the river depth twice and wrote the numbers down",
    "the train left the station at noon and arrived before dark",
    "they planted corn in spring and harvested it in early autumn",
]
_JUNK = [
    "buy buy buy buy buy buy buy buy buy buy buy buy",
    "cheap cheap cheap deal deal deal now now now now",
    "x9 #$ !! 77 ~~ %% 00 @@ ** ^^",
    "click here click here click here click here click here",
    "zzz zzz zzz zzz zzz zzz zzz zzz",
    "!!! $$$ ### @@@ %%% ^^^ &&& ***",
    "win win win win prize prize prize prize",
    "aaa aaa aaa aaa bbb bbb bbb bbb",
]


def _labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(_GOOD)] + [
        (100 + i, t, 0) for i, t in enumerate(_JUNK)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_fit_separates_planted_classes(spark):
    from weather_monitoring_spark.operators.scoring import (
        fit_quality_classifier,
    )

    weights, bias = fit_quality_classifier(_labeled(spark))
    scored = {
        r["doc_id"]: r["quality_score"]
        for r in quality_scores(
            _labeled(spark), weights=weights, bias=bias
        ).collect()
    }
    # perfect separation on the planted training set: every good doc's
    # margin above every junk doc's
    good = [scored[i] for i in range(len(_GOOD))]
    junk = [scored[100 + i] for i in range(len(_JUNK))]
    assert min(good) > max(junk)
    assert all(g > 0 for g in good) and all(j < 0 for j in junk)


def test_fit_is_bit_deterministic(spark):
    from weather_monitoring_spark.operators.scoring import (
        fit_quality_classifier,
    )

    w1, b1 = fit_quality_classifier(_labeled(spark))
    w2, b2 = fit_quality_classifier(_labeled(spark))
    assert w1 == w2  # bit-identical floats, not approx
    assert b1 == b2


def test_fit_guards(spark):
    from weather_monitoring_spark.operators.scoring import (
        fit_quality_classifier,
    )

    with pytest.raises(ValueError, match="unknown feature"):
        fit_quality_classifier(_labeled(spark), features=("nope",))
    with pytest.raises(ValueError, match="max_rows"):
        fit_quality_classifier(_labeled(spark), max_rows=3)
    bad = spark.createDataFrame(
        [(1, "a b c", 2)], "doc_id long, text string, label int"
    )
    with pytest.raises(ValueError, match="0/1"):
        fit_quality_classifier(bad)


def test_trained_margin_bit_matches_duckdb(spark, duck):
    """Trained weights flow through the same cross-engine-bit-stable
    margin chain as the defaults: score the fixture documents with the
    FITTED model on both engines and compare float64s by hex — no
    tolerance."""
    from weather_monitoring_spark.operators.scoring import (
        fit_quality_classifier,
        o_quality_score,
    )
    from weather_monitoring_spark.plans.extra_checks import _o_quality_features
    from weather_monitoring_spark.sources.tables import load_table

    weights, bias = fit_quality_classifier(_labeled(spark))
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        r["doc_id"]: r["quality_score"]
        for r in quality_scores(docs, weights=weights, bias=bias).collect()
    }
    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        "SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = dict(
        duck.execute(
            f"WITH f AS ({_o_quality_features()}) "
            f"SELECT doc_id, {o_quality_score(weights, bias)} FROM f"
        ).fetchall()
    )
    assert set(got) == set(want)
    for doc_id, v in want.items():
        assert got[doc_id].hex() == v.hex(), (doc_id, got[doc_id], v)

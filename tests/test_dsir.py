"""DSIR importance resampling (operators/dsir.py): planted
distribution-shift behavior, bit-determinism, the Python exact-decimal
replay, and selection semantics. Cross-engine hash parity runs in
test_oracle_parity via x_dsir_weights.
"""

from __future__ import annotations

from decimal import Decimal

import pytest

#: Planted raw corpus: target-like prose vs off-distribution junk.
_PROSE = [
    "the weather station reported rain and wind across the valley today",
    "humidity rose through the morning and the station raised an alert",
    "temperature and wind speed were steady at the coastal station",
    "the archive wrote a new batch of weather records to the store",
]
_CODE = [
    "def foo(x): return x + 1 # todo refactor lambda kwargs",
    "SELECT col FROM tbl WHERE id = 42 GROUP BY col ORDER BY 1",
    "import numpy as np; np.zeros((3, 3), dtype=np.float64)",
    "curl -s https://host/api | jq '.items[] | .name'",
]
_TARGET = [
    "weather stations report temperature humidity and wind speed",
    "when humidity rises the detector raises an alert for the station",
    "the monitor keeps the latest weather status for each station",
]


def _frames(spark):
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_PROSE)]
        + [(100 + i, t) for i, t in enumerate(_CODE)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(_TARGET)],
        "doc_id long, text string",
    )
    return raw, target


def test_planted_shift_separates_target_like_docs(spark):
    """Every target-like prose doc outscores every off-distribution
    code doc on avg_log_weight — the selection signal the operator
    exists to produce."""
    from weather_monitoring_spark.operators.dsir import dsir_weights

    raw, target = _frames(spark)
    w = {
        r["doc_id"]: r["avg_log_weight"]
        for r in dsir_weights(raw, target).collect()
    }
    prose = [w[i] for i in range(len(_PROSE))]
    code = [w[100 + i] for i in range(len(_CODE))]
    assert min(prose) > max(code)


def test_weights_bit_deterministic(spark):
    from weather_monitoring_spark.operators.dsir import dsir_weights

    raw, target = _frames(spark)
    a = sorted(dsir_weights(raw, target).collect())
    b = sorted(dsir_weights(raw, target).collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_python_exact_decimal_replay(spark):
    """Independent pure-Python replay of the whole definition — md5
    bucketing, clipped models, quantized-log table summed via
    decimal.Decimal — equals the Spark doubles bit-for-bit."""
    import hashlib

    from weather_monitoring_spark.operators.dsir import (
        DSIR_BUCKETS,
        DSIR_COUNT_CLIP,
        dsir_weights,
        log_table_strings,
    )

    def tokens(t):
        import re

        return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]

    def grams(t):
        tk = tokens(t)
        return tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]

    def bucket(g):
        return int(hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:8], 16) % DSIR_BUCKETS

    raw, target = _frames(spark)
    raw_rows = [(i, t) for i, t in enumerate(_PROSE)] + [
        (100 + i, t) for i, t in enumerate(_CODE)
    ]
    tgt_rows = _TARGET

    def model(texts):
        counts: dict[int, int] = {}
        for t in texts:
            for g in grams(t):
                b = bucket(g)
                counts[b] = counts.get(b, 0) + 1
        return {b: min(c, DSIR_COUNT_CLIP) for b, c in counts.items()}

    L = [Decimal(s) for s in log_table_strings()]
    mt, mr = model(tgt_rows), model([t for _, t in raw_rows])
    got = {r["doc_id"]: r for r in dsir_weights(raw, target).collect()}
    for doc_id, text in raw_rows:
        gs = grams(text)
        acc = Decimal(0)
        for g in gs:
            b = bucket(g)
            acc += L[mt.get(b, 0)] - L[mr.get(b, 0)]
        lw = float(str(acc)) if gs else 0.0
        assert got[doc_id]["n_grams"] == len(gs)
        assert got[doc_id]["log_weight"].hex() == float(lw).hex()
        if gs:
            assert (
                got[doc_id]["avg_log_weight"].hex() == (lw / len(gs)).hex()
            )


def test_every_raw_doc_gets_a_row(spark):
    from weather_monitoring_spark.operators.dsir import dsir_weights

    raw = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, None)], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, "hello world")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in dsir_weights(raw, target).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["n_grams"] == 0 and rows[2]["log_weight"] == 0.0
    assert rows[2]["avg_log_weight"] is None
    assert rows[3]["avg_log_weight"] is None


def test_topk_selects_target_like(spark):
    from weather_monitoring_spark.operators.dsir import dsir_topk

    raw, target = _frames(spark)
    picked = {r["doc_id"] for r in dsir_topk(raw, target, k=len(_PROSE)).collect()}
    assert picked == set(range(len(_PROSE)))


def test_topk_plans_as_take_ordered(spark):
    from weather_monitoring_spark.operators.dsir import dsir_topk

    raw, target = _frames(spark)
    plan = (
        dsir_topk(raw, target, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_log_table_is_quantized_and_monotone():
    from weather_monitoring_spark.operators.dsir import (
        DSIR_COUNT_CLIP,
        log_table_strings,
    )

    tbl = log_table_strings()
    assert len(tbl) == DSIR_COUNT_CLIP + 1
    assert tbl[0] == "0.000000000000000000"
    vals = [Decimal(s) for s in tbl]
    assert all(a < b for a, b in zip(vals, vals[1:]))
    assert all(len(s.split(".")[1]) == 18 for s in tbl)

# ---------------- corpus divergence --------------------------------------

from weather_monitoring_spark.operators.dsir import corpus_divergence


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_divergence_identical_corpora_is_exactly_zero(spark):
    a = _corpus(spark, [(1, "the cat sat"), (2, "dogs bark loudly")])
    b = _corpus(spark, [(7, "the cat sat"), (9, "dogs bark loudly")])
    r = corpus_divergence(a, b).collect()[0]
    assert r["tv_distance"] == 0.0 and r["chi2_divergence"] == 0.0
    assert r["mass_a"] == r["mass_b"]
    assert r["n_active_a"] == r["n_active_b"]


def test_divergence_orders_a_planted_shift(spark):
    base = [(i, "the cat sat on the mat") for i in range(20)]
    near = [(i, "the cat sat on the mat") for i in range(15)] + [
        (i, "a dog ran in the park") for i in range(15, 20)
    ]
    far = [(i, "quantum flux harmonics destabilize relativistic manifolds")
           for i in range(20)]
    a = _corpus(spark, base)
    d_near = corpus_divergence(a, _corpus(spark, near)).collect()[0]
    d_far = corpus_divergence(a, _corpus(spark, far)).collect()[0]
    assert 0.0 < d_near["tv_distance"] < d_far["tv_distance"] <= 1.0
    assert 0.0 < d_near["chi2_divergence"] < d_far["chi2_divergence"]


def test_divergence_is_partitioning_invariant(spark):
    a = _corpus(spark, [(i, f"alpha beta gamma {i}") for i in range(40)])
    b = _corpus(spark, [(i, f"delta epsilon zeta {i}") for i in range(40)])
    r1 = corpus_divergence(a, b).collect()[0]
    r2 = corpus_divergence(a.repartition(17), b.repartition(3)).collect()[0]
    assert r1["tv_distance"].hex() == r2["tv_distance"].hex()
    assert r1["chi2_divergence"].hex() == r2["chi2_divergence"].hex()

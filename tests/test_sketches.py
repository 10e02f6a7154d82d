"""Misra-Gries heavy hitters (operators/sketches.py): the mergeable-
summary guarantees — presence above n/(k+1), lower-bound counts within
n/(k+1), bounded output cardinality, and the exact two-pass threshold
variant. Deliberately pytest-guarantee (no DuckDB hash oracle): which
sub-threshold keys appear is partitioning-dependent, the same policy as
the HLL/GK sketch demo.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_monitoring_spark.operators.sketches import (
    heavy_hitters,
    heavy_hitters_threshold,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 3 planted heavy keys on a long uniform tail, spread over many
    # partitions so the merge path is actually exercised.
    heavy = spark.range(0, 3000).select(
        F.concat(F.lit("hot"), (F.col("id") % 3).cast("string")).alias("key")
    )
    tail = spark.range(0, 5000).select(
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("key")
    )
    return heavy.union(tail).repartition(16).cache()


def test_heavy_keys_are_always_present(skewed):
    n = skewed.count()  # 8000
    k = 50  # threshold n/(k+1) ~ 157 << 1000 per hot key
    got = {r["key"]: r["count_lb"] for r in heavy_hitters(skewed, "key", k=k).collect()}
    for hot in ("hot0", "hot1", "hot2"):
        assert hot in got
        assert got[hot] <= 1000  # lower bound never exceeds truth
        assert got[hot] >= 1000 - n // (k + 1)  # within the MG error


def test_output_cardinality_is_bounded(skewed):
    n_parts = skewed.rdd.getNumPartitions()
    k = 10
    out = heavy_hitters(skewed, "key", k=k)
    assert out.count() <= n_parts * k


def test_every_count_is_a_lower_bound(skewed):
    exact = {
        r["key"]: r["c"]
        for r in skewed.groupBy("key").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for r in heavy_hitters(skewed, "key", k=25).collect():
        assert 0 < r["count_lb"] <= exact[r["key"]]


def test_threshold_variant_is_exact(skewed):
    # min_frac 0.1 of 8000 = 800: exactly the three 1000-count keys.
    rows = heavy_hitters_threshold(skewed, "key", min_frac=0.1).collect()
    assert {r["key"]: r["count"] for r in rows} == {
        "hot0": 1000,
        "hot1": 1000,
        "hot2": 1000,
    }


def test_nulls_are_ignored(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [(None,)] * 50 + [("b",)], "key string"
    )
    got = {r["key"] for r in heavy_hitters(df, "key", k=3).collect()}
    assert None not in got and "a" in got


def test_k_validation(spark):
    df = spark.range(1).select(F.lit("x").alias("key"))
    with pytest.raises(ValueError):
        heavy_hitters(df, "key", k=0)
    with pytest.raises(ValueError):
        heavy_hitters_threshold(df, "key", min_frac=0.0)


def test_sketch_hot_lines_equal_exact_boilerplate_strip(spark):
    """Composition: heavy_hitters_threshold over the doc-distinct
    exploded lines is an EXACT stand-in for strip_boilerplate's default
    line-frequency detector (the sketch bounds the candidate shuffle;
    its second pass restores exact counts). Planted hot lines, full
    row-for-row output equality."""
    from weather_monitoring_spark.operators.lines import strip_boilerplate

    n = 400
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat(array('site header', concat('unique-', CAST(id AS STRING))), "
            "CASE WHEN id % 2 = 0 THEN array('cookie banner') ELSE array() END)"
        ).alias("lines"),
    )
    exact = strip_boilerplate(docs, min_docs=100)

    # sketch detector: doc-distinct line instances == doc frequency
    inst = docs.select(F.explode(F.array_distinct("lines")).alias("line"))
    # total instances = 400 + 400 + 200 = 1000; min_docs=100 -> 0.1
    hot = heavy_hitters_threshold(inst, "line", min_frac=0.1)
    assert sorted(r["line"] for r in hot.collect()) == [
        "cookie banner",
        "site header",
    ]
    sketched = strip_boilerplate(docs, min_docs=100, hot_lines=hot)
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, sketched.collect()))
    assert a == b

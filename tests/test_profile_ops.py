"""Profiling operators: stat correctness on a hand-built frame, the
single-scan plan shape, and histogram mass conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from weather_monitoring_spark.operators.profile import histogram, profile_table
from weather_monitoring_spark.sources.tables import load_table


def test_profile_table_stats_known_frame(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, -2.0), (3, "b", None), (4, "a", 0.25)],
        "id bigint, s string, x double",
    )
    rows = {r.column: r for r in profile_table(df).collect()}
    assert set(rows) == {"id", "s", "x"}
    assert all(r.n_rows == 4 for r in rows.values())
    rid, rs, rx = rows["id"], rows["s"], rows["x"]
    assert (rid.n_nulls, rid.n_distinct, rid.min_int, rid.max_int) == (0, 4, 1, 4)
    assert rid.min_num is None and rid.min_str is None
    assert (rs.n_nulls, rs.n_distinct, rs.min_str, rs.max_str) == (1, 2, "a", "b")
    assert (rx.n_nulls, rx.n_distinct, rx.min_num, rx.max_num) == (1, 3, -2.0, 1.5)


def test_profile_table_single_scan(spark):
    """The whole profile is ONE aggregate over ONE scan — the multi-
    distinct rewrite adds an Expand, never a second file scan."""
    ev = load_table(spark, SF_SMALL, "events")
    plan = profile_table(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1


def test_profile_table_approx_mode(spark):
    ev = load_table(spark, SF_SMALL, "events")
    exact = {r.column: r for r in profile_table(ev).collect()}
    approx = {r.column: r for r in profile_table(ev, exact_distinct=False).collect()}
    for c in exact:
        e, a = exact[c].n_distinct, approx[c].n_distinct
        assert abs(a - e) <= max(0.1 * e, 2), f"{c}: approx {a} vs exact {e}"
        # non-cardinality stats identical in both modes
        assert (exact[c].n_nulls, exact[c].min_int, exact[c].max_int) == (
            approx[c].n_nulls,
            approx[c].min_int,
            approx[c].max_int,
        )


def test_histogram_mass_and_edges(spark):
    ev = load_table(spark, SF_SMALL, "events")
    bins = histogram(ev, "value", 0.0, 500.0, 25).collect()
    assert len(bins) == 25
    assert sorted(r.bin for r in bins) == list(range(25))
    in_range = ev.filter(
        F.col("value").isNotNull() & (F.col("value") >= 0) & (F.col("value") <= 500)
    ).count()
    assert sum(r.cnt for r in bins) == in_range
    for r in bins:
        assert r.bin_hi - r.bin_lo == 20.0
        assert r.bin_lo == r.bin * 20.0

"""Mirror of the driver's t2 gate: every oracle-bearing registry query must
hash-match DuckDB on the same parquet tables (sf0.001 for speed; the driver
runs sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from tests.oracle_harness import compare_query
from weather_monitoring_spark.plans.extra_checks import EXTRA_SPECS
from weather_monitoring_spark.plans.registry import all_queries

#: The driver's correctness gate covers only the first 50 registered
#: queries — the registry must fit entirely inside that window.
DRIVER_QUERY_WINDOW = 50

SPECS = [s for s in all_queries().values() if s.oracle is not None] + EXTRA_SPECS
NO_ORACLE = [s for s in all_queries().values() if s.oracle is None]


def test_registry_fits_driver_window():
    assert len(all_queries()) <= DRIVER_QUERY_WINDOW, (
        f"registry has {len(all_queries())} queries; only the first "
        f"{DRIVER_QUERY_WINDOW} get driver verdicts — merge or move to "
        "extra_checks.py"
    )


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spark, spec):
    compare_query(spark, spec, SF_SMALL)


@pytest.mark.parametrize("spec", NO_ORACLE, ids=[s.name for s in NO_ORACLE])
def test_rows_only_queries_run(spark, spec):
    df = spec.spark(spark, SF_SMALL)
    assert df.count() >= 0
    assert len(df.columns) > 0

#!/usr/bin/env python
"""Dump .explain("formatted") for every registry query into plans/r16/,
INCLUDING the plan of every localCheckpoint-pinned subtree (VERDICT r15
#3/#5: the after-plans showed bare `Scan ExistingRDD` where a pin hid
its lineage, so the dumps alone no longer proved what feeds those
scans). DataFrame.localCheckpoint is instrumented during the dump: each
pin's own formatted plan is captured at pin time and appended to the
query's dump under a "PINNED SUBTREE" header, so every dump is
self-contained evidence.

Usage: python scripts/dump_r16_plans.py <suffix> [query ...]
Writes plans/r16/<query>_<suffix>.txt. With no query names, dumps all.
Prints a one-line plan-shape summary per query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Patch the RUNTIME class: in Spark 4 `pyspark.sql.DataFrame` is the
# abstract base — instances are classic.dataframe.DataFrame, which
# defines localCheckpoint itself, so patching the base is a no-op.
from pyspark.sql.classic.dataframe import DataFrame

from weather_monitoring_spark.plans.registry import all_queries
from weather_monitoring_spark.session import get_spark

_PINS: list[str] = []
_ORIG_LCP = DataFrame.localCheckpoint


def _fmt(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _traced_lcp(self, eager: bool = True):
    _PINS.append(_fmt(self))
    return _ORIG_LCP(self, eager=eager)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="wms-dump-plans-r16")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    if not names:
        names = sorted(specs)
    DataFrame.localCheckpoint = _traced_lcp
    try:
        for name in names:
            _PINS.clear()
            df = specs[name].spark(spark, sf_dir)
            plan = _fmt(df)
            pins = list(_PINS)
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
                for i, p in enumerate(pins):
                    fh.write(
                        f"\n\n===== PINNED SUBTREE {i} (localCheckpoint input, "
                        f"in pin order; a `Scan ExistingRDD` above reads one "
                        f"of these) =====\n"
                    )
                    fh.write(p)
            whole = plan + "".join(pins)
            n_ex = len(re.findall(r"\bExchange\b", whole))
            joins = sorted(set(re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)", whole)))
            pyn = sorted(set(re.findall(
                r"(BatchEvalPython|ArrowEvalPython|MapInArrow|"
                r"FlatMapGroupsInPandas|MapInPandas)", whole)))
            print(
                f"{name}: Exchange={n_ex} joins={joins} python={pyn} "
                f"pins={len(pins)}"
            )
    finally:
        DataFrame.localCheckpoint = _ORIG_LCP


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump .explain("formatted") for every registry query into plans/r15/.

Usage: python scripts/dump_r15_plans.py <suffix> [query ...]
Writes plans/r15/<query>_<suffix>.txt (suffix = before|after). With no
query names, dumps all. Also prints a one-line plan-shape summary
(#Exchange, join strategies, Python eval nodes) per query.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_monitoring_spark.plans.registry import all_queries
from weather_monitoring_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="wms-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    if not names:
        names = sorted(specs)
    for name in names:
        df = specs[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        n_ex = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", plan))
        )
        pyn = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas|MapInPandas)", plan)))
        print(f"{name}: Exchange={n_ex} joins={joins} python={pyn}")


if __name__ == "__main__":
    main()

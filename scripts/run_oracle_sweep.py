#!/usr/bin/env python
"""Full oracle sweep: every registered query (plans/registry) plus every
extra check (plans/extra_checks) through the DuckDB-parity harness at a
given scale factor — the driver's sf0.01 correctness gate, runnable
locally as one command. Prints one JSON line: pass/fail/rows-only
counts and the names of any failures.

Usage: python scripts/run_oracle_sweep.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from oracle_harness import compare_query

    from weather_monitoring_spark.plans.extra_checks import EXTRA_SPECS
    from weather_monitoring_spark.plans.registry import all_queries
    from weather_monitoring_spark.session import get_spark

    spark = get_spark(app_name="oracle-sweep")
    specs = list(all_queries().values()) + list(EXTRA_SPECS)
    passed, rows_only, failed = [], [], []
    t_all = time.perf_counter()
    for spec in specs:
        t0 = time.perf_counter()
        try:
            if spec.oracle is None:
                n = spec.spark(spark, sf_dir).count()
                assert n >= 0
                rows_only.append(spec.name)
            else:
                compare_query(spark, spec, sf_dir)
                passed.append(spec.name)
            status = "ok"
        except Exception:
            failed.append(spec.name)
            status = "FAIL"
            traceback.print_exc(file=sys.stderr)
        print(
            f"  {spec.name}: {status} ({time.perf_counter() - t0:.1f}s)",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "specs": len(specs),
                "oracle_pass": len(passed),
                "rows_only_pass": len(rows_only),
                "failed": failed,
                "total_sec": round(time.perf_counter() - t_all, 2),
            }
        )
    )
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
